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
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
    * default: the SESSION must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (all graft mains and TestSpark do, in their builders — a query function
    * mutating session conf would be a hidden global and a race under
    * concurrent execution). The long nanos convert with integer division —
    * ns-since-epoch ≈ 1.7e18 exceeds double's 2^53 mantissa, so a
    * floating-point path would corrupt the microseconds.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** 64-bit deterministic hash from md5 hex — portable across engines
    * (DuckDB: CAST('0x'||substr(md5(s),1,15) AS BIGINT)). 60 bits, always >= 0.
    * Used wherever the oracle must reproduce our hashing exactly; for
    * engine-internal hashing (shuffle, LSH banding) prefer xxhash64/hash which
    * are codegen'd and faster.
    */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
