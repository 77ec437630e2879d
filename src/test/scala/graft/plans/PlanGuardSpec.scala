package graft.plans

import graft.SparkSuite
import graft.SparkEntry

/** Plan regression guards: the load-bearing physical-plan properties
  * documented in PLANS.md, asserted so a formulation change that
  * silently loses pushdown, broadcast, partial aggregation, or a
  * group-limit shows up as a test failure instead of a bench surprise.
  * String-level checks on the default-config plan (same settings as
  * Verify/Bench: AQE on, shuffle partitions small).
  */
class PlanGuardSpec extends SparkSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def plan(name: String): String = {
    val q = SparkEntry.all.find(_.name == name)
      .getOrElse(fail(s"no declared query $name"))
    q.build(spark, sf()).queryExecution.executedPlan.toString
  }

  test("q01: ts range predicate is pushed to the parquet scan") {
    val p = plan("q01_time_range")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"raw-ns range not in PushedFilters:\n$p")
  }

  test("q03: scan schema is pruned to the projected columns") {
    val p = plan("q03_projection")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("props") && !read.contains("payload"),
      s"unprojected columns read:\n$read")
  }

  test("q11: both dimension joins broadcast") {
    val p = plan("q11_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p)
  }

  test("q19: aggregation is partial before the exchange") {
    val p = plan("q19_groupby_agg")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }

  test("q27: group-limit runs below the window exchange") {
    val p = plan("q27_window_rank")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
  }

  test("d3d: top-k aggregate is partial before the exchange") {
    val p = plan("d3d_similarity_agg")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
  }

  test("d2: minhash signature is evaluated exactly once in the plan") {
    val p = plan("d2_minhash_neardup")
    assert("minhash_sig".r.findAllIn(p).size === 1,
      s"signature lineage duplicated:\n$p")
  }

  test("d2: predecessor window frame is the bounded sliding cap frame") {
    // the skew guard's whole point: the collect_list frame must be the
    // sliding (-(maxBucket-1), -1) frame, never an unbounded collect
    // that rebuilds a giant-bucket buffer
    val p = plan("d2_minhash_neardup")
    assert(p.contains("specifiedwindowframe(RowFrame, -1023, -1)"),
      s"bounded predecessor frame missing (cap regressed?):\n$p")
  }

  test("d13: boilerplate membership is a semi-join; doc-frequency agg is partial") {
    val p = plan("d13_boilerplate_ngrams")
    assert(p.contains("LeftSemi"),
      s"boilerplate-gram membership must be a semi-join (no payload fanout):\n$p")
    assert(p.contains("partial_count"),
      s"doc-frequency count must partial-aggregate before its exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage allowed:\n$p")
  }

  test("d14: corpus size broadcasts as a single-row aggregate; top-k group-limits") {
    val p = plan("d14_tfidf_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"corpus-size single-row broadcast join missing (driver-side count?):\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit on per-doc top-k:\n$p")
  }

  test("d18: boundary array broadcasts; no global-window bucket assignment") {
    val p = plan("d18_equidepth_hist")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"single-row boundary broadcast missing:\n$p")
    // the scale trap this formulation avoids: a global ntile/row_number
    // would appear as a Window over an empty partition spec
    assert(!p.contains("Window"), s"global window crept into the histogram:\n$p")
  }

  test("d9b: Bloom probe is a literal filter in the explode stage — no new exchanges vs d9") {
    val pB = plan("d9b_contamination_bloom")
    val pE = plan("d9_contamination")
    assert(pB.contains("might_contain"), s"Bloom probe missing:\n$pB")
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    assert(exchanges(pB) <= exchanges(pE),
      s"Bloom path grew exchanges: ${exchanges(pB)} vs d9's ${exchanges(pE)}")
    assert(!pB.contains("CartesianProduct"), pB)
  }

  test("d3f: candidate set broadcasts into the float rescore; corpus never shuffles for it") {
    val p = plan("d3f_similarity_int8")
    // two broadcast joins on the rescore side (candidates + query floats)
    // plus the code-side query broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"candidate/query broadcasts missing:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"candidate ranking should partial+final group-limit:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d3g: centroid/probe/candidate sides all broadcast; float corpus never shuffles") {
    val p = plan("d3g_similarity_ivf_int8")
    // centroid set reaches assignment/probing as a single-row broadcast
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid-array broadcast join missing:\n$p")
    // probes join the coded corpus broadcast, and the rescore joins the
    // survivor set + query floats broadcast into the float scan — the
    // corpus (codes or floats) must never be the shuffled side
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"probe/candidate/query-float broadcasts missing:\n$p")
    // both ranking windows (in-cell candidate rank, final top-k) must
    // engage partial+final WindowGroupLimit
    assert("WindowGroupLimit".r.findAllIn(p).size >= 4,
      s"candidate/final rankings should partial+final group-limit:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d3h: codebook broadcasts to encode; ADC stream and rescore never shuffle the corpus") {
    val p = plan("d3h_similarity_pq")
    // codebook arrives at corpus encoding AND at the broadcast query
    // side as a single-row build (two broadcast nested-loop joins)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"codebook broadcast joins missing:\n$p")
    // rescore: survivor set + query floats broadcast into the float scan
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"candidate/query-float broadcasts missing:\n$p")
    // both ranking windows (ADC candidate rank, final top-k) group-limit
    assert("WindowGroupLimit".r.findAllIn(p).size >= 4,
      s"candidate/final rankings should partial+final group-limit:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q46: every funnel exchange is keyed on the user; aggs partial; no cartesian") {
    val p = plan("q46_funnel")
    assert(!p.contains("CartesianProduct"), p)
    // step transitions are equi-joins on the user key, never broadcastless loops
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"step aggregates should be partial before their exchanges:\n$p")
  }

  test("d22: chunking is scan -> project -> generate; no join, no window") {
    val p = plan("d22_doc_chunks")
    assert(p.contains("Generate"), s"posexplode missing:\n$p")
    assert(!p.contains("Join"), s"chunker must not join:\n$p")
    assert(!p.contains("Window"), s"chunker must not window:\n$p")
    // one exchange total: the canonical output sort
    assert("Exchange".r.findAllIn(p).size <= 1, s"chunker grew exchanges:\n$p")
  }

  test("d3c: corpus assignment is map-only; ranking group-limits before exchange") {
    val p = plan("d3c_similarity_ivf")
    // centroid array arrives via broadcast nested-loop (single-row build
    // side); corpus rows must not shuffle for assignment
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid-array broadcast join missing:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit on candidate ranking:\n$p")
  }

  test("q51: change dedup group-limits map-side; the MERGE join never loops") {
    val p = plan("q51_upsert_merge")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the row_number()=1 latest-change filter must keep top-1 per key
    // BEFORE its shuffle (partial) and after (final)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"latest-change dedup should partial+final group-limit:\n$p")
    // base-side dedup + change-side dedup + canonical output sort: the
    // full-outer join itself must reuse the windows' key partitioning
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"MERGE grew exchanges beyond the per-side windows + sort:\n$p")
  }

  test("d28: corpus scans never shuffle; fusion joins only rank lists") {
    val p = plan("d28_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // dense half: query vector reaches the corpus scan as a broadcast
    // (d3 shape) — at least the query-side and corpus-stats broadcasts
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"query/stats broadcasts missing:\n$p")
    // final fused top-20 group-limits
    assert(p.contains("WindowGroupLimit"),
      s"fused ranking should group-limit:\n$p")
  }

  test("q52: grid overlap join is a cell equi-join, never a cartesian") {
    val p = plan("q52_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval overlap must stay a bucketed equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on the grid cell:\n$p")
  }

  test("q51: MERGE dedups changes with a group-limit and applies via one full-outer join") {
    val p = plan("q51_upsert_merge")
    assert(p.contains("WindowGroupLimit"),
      s"per-key change dedup must group-limit below the window:\n$p")
    assert("FullOuter".r.findAllIn(p).size === 1,
      s"expected exactly one full-outer apply join:\n$p")
  }

  test("d28: RRF fusion windows rank only the per-list top-k candidates") {
    val p = plan("d28_hybrid_rrf")
    assert(!p.contains("CartesianProduct"),
      s"fusion must never cross the corpus with itself:\n$p")
    // both retrieval arms cap candidates before the rank windows: the
    // window inputs are k-bounded, so every Window node sits above a
    // limit/group-limit, never above a full-corpus exchange
    assert(p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"),
      s"expected k-bounded candidate lists feeding the fusion windows:\n$p")
  }

  test("d33: pairing is a cell equi-join; the only nested-loop nodes attach the single-row centroid array") {
    val p = plan("d33_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      s"semantic dedup must never cross the corpus with itself:\n$p")
    // the centroid set collapses to ONE broadcast row (d3c pattern);
    // any BNLJ in this plan must be that attachment, which always
    // builds on a BroadcastExchange of an ObjectHashAggregate
    // (collect_list into a single row) — the corpus-vs-corpus pairing
    // itself must be a hash/merge equi-join on the cell
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on the cluster cell:\n$p")
    assert("LeftAnti".r.findAllIn(p).size === 1,
      s"expected exactly one keeper anti-join:\n$p")
  }

  test("d34: the scorer is one map stage — no exchange except the output sort, pruned scan") {
    val p = plan("d34_quality_classifier")
    assert("Exchange".r.findAllIn(p).size === 1,
      s"quality scoring must not shuffle before the canonical sort:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang") && !read.contains("source"),
      s"scan must prune to (doc_id, text):\n$read")
  }

  test("d35: span removal is gram-keyed aggregation — no all-pairs, pruned scans, partial distinct-doc count") {
    val p = plan("d35_substring_dedup")
    assert(!p.contains("CartesianProduct"),
      s"substring dedup must never pair documents:\n$p")
    // the gram → distinct-doc-count aggregate must partial-aggregate
    // before its exchange (the shuffle the scaladoc's cost model rests on)
    assert(p.contains("partial_count(distinct"),
      s"gram doc-frequency must partial-aggregate map-side:\n$p")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r =>
      !r.contains("lang") && !r.contains("source")),
      s"document scans must prune to (doc_id, text):\n${reads.mkString("\n")}")
  }

  test("d37: self-dedup shuffle key carries the doc id (no global gram key)") {
    val p = plan("d37_selfdedup")
    assert(!p.contains("CartesianProduct"), p)
    // first-occurrence aggregate groups on (doc_id, gram): hot-key-free
    // by construction — the plan must show both keys in the same
    // hashpartitioning
    val hp = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hp.exists(l => l.contains("doc_id") && l.contains("gram")),
      s"expected (doc_id, gram) shuffle key:\n${hp.mkString("\n")}")
  }

  test("d38: bucketed fact-fact join runs without a pre-join exchange") {
    val q = SparkEntry.all.find(_.name == "d38_bucketed_join")
      .getOrElse(fail("no declared query d38_bucketed_join"))
    val df = q.build(spark, sf())
    df.collect() // force the final adaptive plan
    val p = df.queryExecution.executedPlan
    assert(p.toString.contains("SortMergeJoin"),
      s"bucketed join must be a sort-merge join:\n$p")
    val shuffles = collectWithSubqueries(p) {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    // the one legal exchange is the FINAL orderBy's range partitioning;
    // the join and the key-grouped aggregate ride the bucket layout
    assert(shuffles.size <= 1,
      s"expected <=1 exchange (final sort only), got ${shuffles.size}:\n$p")
  }

  test("d36: keeper selection is an aggregate, not a per-cluster window sort") {
    val p = plan("d36_quality_dedup")
    // two-stage type-generic keeper (max score per component, then min id
    // among the score-tied members) — a degenerate giant cluster costs a
    // partial-agg merge, never a single-task window sort
    assert(p.contains("max(__score"),
      s"winner must come from a max-score aggregate:\n$p")
    assert(p.contains("min(id"),
      s"score ties must break via a min-id aggregate:\n$p")
    assert(!p.contains("Window("),
      s"no window sort may appear in keeper selection:\n$p")
    assert("LeftAnti".r.findAllIn(p).size === 1,
      s"expected exactly one loser anti-join:\n$p")
    // both keeper aggregates group on component — the shared hash
    // partitioning the scaladoc's one-exchange cost model rests on
    val hp = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hp.exists(_.contains("component")),
      s"keeper aggregates must partition on component:\n${hp.mkString("\n")}")
  }
}
