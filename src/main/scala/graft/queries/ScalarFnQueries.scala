package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Scalar functions — string / date / math / array / json / case-null
  * (SURVEY.md §2c Q30–Q35). The reference's payload is opaque bytes
  * (row.go:9) so none of these exist there; they are table stakes for the
  * analytic layer.
  *
  * Determinism notes: math is restricted to IEEE-correctly-rounded ops
  * (+ - * / sqrt, abs, floor, ceil) so Spark (JVM) and DuckDB (libm)
  * agree bitwise; transcendentals (log/exp/pow) are only 1-ulp-accurate
  * and engine-dependent, so they are exercised in unit tests, not in the
  * hash-matched oracle set. Array folds use explicit left-to-right
  * `aggregate`, mirrored by DuckDB `list_reduce`, so double accumulation
  * order is identical.
  */
object ScalarFnQueries {
  import Tables.t

  /** Q30: string functions. */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 10, 9).as("id_digits"),
        concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
        length(col("c_name")).as("name_len"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        split(col("c_name"), "#").getItem(0).as("prefix"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy(col("c_custkey"))

  /** Q30b: second string batch — reverse/repeat/translate/position/
    * left/ascii/prefix tests. */
  def stringFns2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .select(
        col("s_suppkey"),
        reverse(col("s_name")).as("rev"),
        repeat(col("s_name"), 2).as("doubled"),
        translate(col("s_name"), "S#", "Z_").as("translated"),
        instr(col("s_name"), "plier").cast("int").as("pos"),
        substring(col("s_name"), 1, 3).as("left3"),
        ascii(col("s_name")).cast("int").as("first_code"),
        col("s_name").startsWith("Supplier").as("is_supp"),
        col("s_name").endsWith("0").as("ends_zero"),
        col("s_name").contains("#").as("has_hash"))
      .orderBy(col("s_suppkey"))

  /** Q31b: second date batch — quarter/last_day/day arithmetic. */
  def datetimeFns2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("int").as("qtr"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("int").as("days_to_2002"),
        (col("o_orderdate") - expr("INTERVAL 1 DAY")).as("prev_day"),
        greatest(col("o_orderdate"), lit("1998-01-01 00:00:00").cast("timestamp"))
          .as("clamped"))
      .orderBy(col("o_orderkey"))

  /** Q31: date/time functions. */
  def datetimeFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderdate"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        dayofmonth(col("o_orderdate")).cast("int").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** Q32: math functions (correctly-rounded subset — see class doc). */
  def mathFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        abs(col("value") - 50.0).as("dev"),
        sqrt(col("value")).as("root"),
        floor(col("value")).cast("long").as("flr"),
        ceil(col("value")).cast("long").as("cl"),
        round(col("value"), 2).as("rounded"),
        (col("value") * col("value")).as("squared"),
        (col("value") / 7.0).as("sevenths"),
        pmod(col("user_id"), lit(7)).as("bucket7"))
      .orderBy(col("event_id"))

  /** Q33: array functions on the embedding column — size, indexing,
    * slice, explicit-order fold (dot with itself = squared L2 norm). */
  def arrayFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_v"),
        element_at(col("embedding"), -1).cast("double").as("last_v"),
        sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("l2_norm"),
        aggregate(
          transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("head8_sum"))
      .orderBy(col("vec_id"))

  /** Q34: JSON extraction from events.props. */
  def jsonFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_str_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_struct"))
      .orderBy(col("event_id"))

  /** Q34 (map form): MapType construction and HOF map operations —
    * map from columns, map_keys/size/element_at, transform_values. The
    * oracle verifies the resulting values (the MapType plumbing is
    * Spark-side; DuckDB computes the same outputs from the source
    * columns directly). */
  def mapFns(spark: SparkSession, dir: String): DataFrame = {
    val m = map(
      lit("et"), col("event_type"),
      lit("k"), get_json_object(col("props"), "$.k"))
    t(spark, dir, "events")
      .select(
        col("event_id"),
        size(m).as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_csv"),
        element_at(m, "k").cast("int").as("k_val"),
        element_at(transform_values(m, (_, v) => upper(v)), "et").as("et_upper"))
      .orderBy(col("event_id"))
  }

  /** Q35: CASE / null handling. */
  def caseNull(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("price_band"),
        nullif(col("o_orderstatus"), lit("O")).as("nn_status"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        when(col("o_orderstatus") === "P", col("o_totalprice")).as("pending_price"))
      .orderBy(col("o_orderkey"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q35_string_fns", stringFns, Some(
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  substring(c_name, 10, 9) AS id_digits,
        |  c_mktsegment || '/' || c_name AS seg_name,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        |  string_split(c_name, '#')[1] AS prefix,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  trim('  x  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin)),
    QueryDef("q35b_string_fns2", stringFns2, Some(
      """SELECT s_suppkey,
        |  reverse(s_name) AS rev,
        |  repeat(s_name, 2) AS doubled,
        |  translate(s_name, 'S#', 'Z_') AS translated,
        |  CAST(strpos(s_name, 'plier') AS INTEGER) AS pos,
        |  substring(s_name, 1, 3) AS left3,
        |  CAST(ascii(s_name) AS INTEGER) AS first_code,
        |  starts_with(s_name, 'Supplier') AS is_supp,
        |  ends_with(s_name, '0') AS ends_zero,
        |  contains(s_name, '#') AS has_hash
        |FROM supplier ORDER BY s_suppkey""".stripMargin)),
    QueryDef("q36b_datetime_fns2", datetimeFns2, Some(
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |  o_orderdate - INTERVAL 1 DAY AS prev_day,
        |  greatest(o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS clamped
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q36_datetime_fns", datetimeFns, Some(
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 90 DAY AS due_date,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q37_math_fns", mathFns, Some(
      """SELECT event_id,
        |  abs(value - 50.0) AS dev,
        |  sqrt(value) AS root,
        |  CAST(floor(value) AS BIGINT) AS flr,
        |  CAST(ceil(value) AS BIGINT) AS cl,
        |  round(value, 2) AS rounded,
        |  value * value AS squared,
        |  value / 7.0 AS sevenths,
        |  CAST(user_id % 7 AS BIGINT) AS bucket7
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q38_array_fns", arrayFns, Some(
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_v,
        |  CAST(embedding[-1] AS DOUBLE) AS last_v,
        |  sqrt(list_reduce(list_transform(embedding,
        |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b)) AS l2_norm,
        |  list_reduce(list_transform(embedding[1:8],
        |       x -> CAST(x AS DOUBLE)), (a,b) -> a + b) AS head8_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin)),
    QueryDef("q39_json_fns", jsonFns, Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_str_path,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q39b_map_fns", mapFns, Some(
      """SELECT event_id,
        |  CAST(2 AS INTEGER) AS n_keys,
        |  'et,k' AS keys_csv,
        |  CAST(props->>'k' AS INTEGER) AS k_val,
        |  upper(event_type) AS et_upper
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q40_case_null", caseNull, Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  nullif(o_orderstatus, 'O') AS nn_status,
        |  COALESCE(nullif(o_orderstatus, 'O'), 'open') AS status2,
        |  CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS pending_price
        |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
