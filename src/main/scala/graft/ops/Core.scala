package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational helpers shared by every query in the engine.
  *
  * Design: each operator the reference composes (SURVEY.md §2) is exposed here
  * as a named, unit-testable `DataFrame => DataFrame` (or Column-level) function,
  * expressed with the declarative DataFrame API so Catalyst gets full visibility
  * (pushdown, pruning, join planning, AQE).
  */
object Core {

  /** Explicit-schema parquet scan of a driver testdata table (TESTDATA.md).
    * Parquet footer supplies the schema — no inference pass (SURVEY §1.3).
    *
    * `events.ts` has shipped as two physical parquet types across fixture
    * generations: TIMESTAMP(NANOS) (read as BIGINT nanos under the session
    * conf `spark.sql.legacy.parquet.nanosAsLong=true`, which all graft mains
    * and TestSpark set) and TIMESTAMP(MICROS) (reads natively as a timestamp).
    * Branch on the SCANNED type so either fixture vintage loads: a BIGINT
    * `ts` converts with integer division (ns-since-epoch ≈ 1.7e18 exceeds
    * double's 2^53 mantissa, so a floating-point path would corrupt the
    * microseconds); a TIMESTAMP_NTZ `ts` casts to TIMESTAMP — every consumer
    * (unix_micros, window(), range frames) was written against TimestampType,
    * and with the session timezone pinned to UTC the cast preserves the
    * wall-clock value bit-for-bit, matching what the DuckDB oracle reads.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** 64-bit deterministic hash from md5 hex — portable across engines
    * (DuckDB: CAST('0x'||substr(md5(s),1,15) AS BIGINT)). 60 bits, always >= 0.
    * Used wherever the oracle must reproduce our hashing exactly; for
    * engine-internal hashing (shuffle, LSH banding) prefer xxhash64/hash which
    * are codegen'd and faster.
    */
  def md5Hash64(c: Column): Column =
    // ONE compiled digest (r16, guide §4): the old spelling
    // conv(substring(md5(c), 1, 15), 16, 10) hex-encoded the digest and
    // re-parsed 15 chars per call — pure overhead at the per-gram /
    // per-row hash sites. Values identical (Md5Hash64 scaladoc + spec).
    org.apache.spark.sql.graft.GraftSql.md5Hash64(c)

  /** Parallelism floor for compute-heavy map folds over UNSPLITTABLE
    * inputs (opt guide §2.5: a one-file/one-row-group table scans as ONE
    * task regardless of split config — exactly how the fixture tables
    * ship, so every pre-exchange fold otherwise runs single-threaded).
    * Round-robin repartition with an EXPLICIT partition count: AQE's
    * coalescer skips user-specified repartition-by-num, where a keyed
    * repartition(col) would be coalesced straight back to ~1 partition
    * at small byte sizes. defaultParallelism tracks the session's core
    * count (local[k] → k; cluster → executor cores), never a constant.
    * Cost: one narrow exchange of the input rows — apply ONLY where
    * per-row compute ≫ row width (n²-fold expressions, centroid-argmax
    * assigns, per-gram hashing, codec decodes); a cheap-per-row scan
    * would pay the exchange for nothing. On splittable multi-file
    * inputs at cluster scale the same call is a cores-sized rebalance
    * of an already-parallel scan — harmless, but measure before adding.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // No-op when the scan already splits to the session's cores — the
    // many-file cluster case pays nothing here. getNumPartitions is only
    // safe on SCAN-STAGE frames (no exchange upstream): under AQE, .rdd
    // on a post-shuffle frame would execute its query stages to finalize
    // the plan. Callers keep spread at the read, before the first
    // exchange.
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
