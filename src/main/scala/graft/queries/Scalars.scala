package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Core

/** Scalar / generator function coverage (SURVEY.md §2.8): string, hash, date,
  * JSON, math, CASE, and array higher-order functions, each oracle-matched.
  * Engine-divergence notes baked in: Spark length()/size()/year() return INT
  * (cast to BIGINT), DuckDB log() is log10 (use ln/log10 explicitly), DuckDB
  * has no sha1/substring_index (md5 + split_part used instead).
  */
object Scalars {
  import Core.table

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // concat_ws / substring_index / upper / length (sc:175, 201 analogues).
    "q_scalar_string" -> ((s, d) => {
      table(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("_", col("p_brand"), col("p_type")).as("brand_type"),
        substring_index(col("p_type"), " ", -1).as("type_last")
      )
    }),

    // md5 + portable 64-bit hash (deterministic synthetic ids, sc:218 analogue).
    "q_scalar_hash" -> ((s, d) => {
      table(s, d, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        Core.md5Hash64(col("c_name")).as("name_h64")
      )
    }),

    // Date/time: truncate to day, extract parts, aggregate per day.
    "q_scalar_datetime" -> ((s, d) => {
      table(s, d, "events")
        .select(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          year(col("ts")).cast("long").as("yr"),
          month(col("ts")).cast("long").as("mo"),
          col("value")
        )
        .groupBy(col("day"), col("yr"), col("mo"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
    }),

    // Batch/stream unification: the SAME graft.streaming.Streams function
    // that serves the watermarked streaming job runs here as a batch window
    // aggregation (withWatermark is a no-op on batch inputs).
    "q_stream_window_batch" -> ((s, d) => {
      graft.streaming.Streams.windowedCounts(
        table(s, d, "events").select(col("ts"), col("event_type"), col("value")),
        delay = "10 minutes", win = "5 minutes")
        .select(
          date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
    }),

    // Schema'd JSON column parse (from_json → typed struct, dot-path access)
    // — the scan-level explicit-schema discipline applied to a JSON column.
    "q_scalar_from_json" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      table(s, d, "events")
        .select(col("user_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("p"))
        .where(col("p.k") >= 50)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_high"), sum(col("p.k")).as("sum_k"))
    }),

    // JSON scalar extraction from the events.props payload.
    "q_scalar_json" -> ((s, d) => {
      table(s, d, "events")
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k")
        )
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k")
        )
    }),

    // Math + CASE: sqrt/ln/abs/floor/ceil, conditional banding.
    "q_scalar_math_case" -> ((s, d) => {
      table(s, d, "lineitem")
        .where(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          when(col("l_discount") > 0.05, lit("hi")).otherwise(lit("lo")).as("disc_band"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          abs(col("l_extendedprice") - col("l_tax") * lit(1000)).cast("double").as("abs_mix")
        )
    }),

    // Array HOFs (sc:83-87/302-337 analogues): collect → sort_array → filter
    // HOF → aggregate fold, per order.
    "q_scalar_array_hof" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity"))).as("qtys"))
        .select(
          col("l_orderkey"),
          // Serialized for the driver compare; the HOFs below consume the array.
          array_join(col("qtys"), ",").as("qtys"),
          size(filter(col("qtys"), x => x >= 25)).cast("long").as("n_big"),
          round(aggregate(col("qtys"), lit(0.0), (a, x) => a + x), 2).as("total_qty")
        )
    }),

    // Ordinality-preserving generator (posexplode): leading tokens of each
    // document with their positions. The position comes from the generator
    // itself — no window/row_number pass — and the pos<3 gate lands in the
    // generator's output filter, so each doc contributes ≤3 rows however
    // long its text is. Per-row narrow compute; no shuffle at all.
    "q_scalar_posexplode" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(graft.llm.TextOps.tokens(col("text"))).as(Seq("pos", "token")))
        .where(col("pos") < 3)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('_', p_brand, p_type) AS brand_type,
        |  split_part(p_type, ' ', -1) AS type_last
        |FROM part""".stripMargin,

    "q_scalar_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  CAST('0x' || substr(md5(c_name), 1, 15) AS BIGINT) AS name_h64
        |FROM customer""".stripMargin,

    "q_scalar_datetime" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  CAST(year(ts) AS BIGINT) AS yr,
        |  CAST(month(ts) AS BIGINT) AS mo,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_window_batch" ->
      """SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_scalar_from_json" ->
      """SELECT user_id, count(*) AS n_high,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |GROUP BY user_id""".stripMargin,

    "q_scalar_json" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q_scalar_math_case" ->
      """SELECT l_orderkey,
        |  CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  abs(l_extendedprice - l_tax * 1000) AS abs_mix
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,

    "q_scalar_array_hof" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_quantity)), ',') AS qtys,
        |  CAST(count(*) FILTER (l_quantity >= 25) AS BIGINT) AS n_big,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q_scalar_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |CROSS JOIN generate_series(1, 3) t(i)
        |WHERE i <= len(toks)""".stripMargin
  )
}
