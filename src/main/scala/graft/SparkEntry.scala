package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by SURVEY §2 category in graft.queries.*; each entry
  * has a DuckDB oracle with identical column names/types (aliases match, all
  * engine-divergent numerics cast, double aggregates rounded on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core analytic: per-(supplier) harmonic-sum association
    * score over rank-ordered evidence scores (sc:293-338 analogue).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_harmonic_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.LlmOps.queries ++
      graft.queries.SimSearch.queries ++
      graft.queries.Media.queries ++
      graft.queries.Reference.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Scalars.oracle ++
      graft.queries.LlmOps.oracle ++
      graft.queries.SimSearch.oracle ++
      graft.queries.Media.oracle ++
      graft.queries.Reference.oracle

  /** Queries ALLOWED to return zero rows at the correctness sf (0.01).
    * Empty-vs-empty hash matches prove nothing (r11 verdict found two such
    * vacuous greens) — so the verify gate (tools/check_oracle.py) fails any
    * oracled query that returns 0 rows unless it is listed here with a
    * reason. Currently none: every registered query yields rows at sf0.01.
    */
  def emptyAllowed: Set[String] = Set.empty
}
