package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the candidate lists of
  * independent rankers (lexical BM25, dense ANN, …) into one ranking —
  * the standard last stage of a RAG / retrieval pipeline, and absent
  * from the reference (whose only query is a time-range scan).
  *
  * Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
  * score(d) = Σ_lists 1/(k + rank_list(d)), summed over the lists that
  * contain d. Rank-based, so the rankers' score scales never need
  * calibrating against each other — exactly why RRF is the default
  * fusion in production search stacks.
  *
  * Scale shape: fusion consumes TOP-K LISTS, whose size is set by k and
  * the list count — independent of corpus size. The expensive work
  * (BM25's term shuffle, ANN's candidate generation) happens upstream
  * in the rankers; this operator joins a few hundred rows on the doc
  * id and sorts them once. At 100 TB the lists are still kilobytes —
  * the final window is a single tiny partition BY CONSTRUCTION, not a
  * scalability hazard.
  *
  * Determinism: each summand is one IEEE division of small exact
  * integers and the sum is folded in LIST-DECLARATION ORDER (a fixed
  * expression tree, not a commutative aggregate), so the fused score is
  * bit-reproducible in an external oracle. Final ties break by id.
  */
object Fusion {

  /** Fuses ranked lists `(tag, df)` — each df carrying `idCol` and
    * `rankCol` (1-based, unique within the list) — into the top `topK`
    * by RRF score. Output: idCol, one `rank_<tag>` column per list
    * (null where the list lacks the id), `rrf_score`, `fused_rank`. */
  def reciprocalRankFusion(
      lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      kConst: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.size >= 2, "fusion needs at least two ranked lists")
    require(lists.map(_._1).distinct.size == lists.size,
      "list tags must be unique")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tagged = lists.map { case (tag, df) =>
      df.select(col(idCol), col(rankCol).cast("int").as(s"rank_$tag"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (tag, _) =>
      when(col(s"rank_$tag").isNotNull,
        lit(1.0) / (lit(kConst).cast("double") +
          col(s"rank_$tag").cast("double")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    joined
      .withColumn("rrf_score", score)
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
  }
}
