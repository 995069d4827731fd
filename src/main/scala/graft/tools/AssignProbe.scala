package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.SimSearch

/** Dev probe: isolates the IVF ASSIGN stage cost and the bucket-size
  * skew (Σ size² drives the knn pair join) for the flat vs two-level
  * assignment — `runMain graft.tools.AssignProbe <sfDir>`.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SimSearch.embeds(spark, sfDir)
    val n = e.count()
    val c = math.max(32L, n / 64).toInt
    val n1 = math.max(4, math.ceil(math.sqrt(c.toDouble)).toInt)
    println(s"n=$n C=$c n1=$n1")
    // count() would PRUNE the assign projection (bucket unused) — fold the
    // bucket column into an agg so the argmax actually executes
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(sum(col("bucket"))).collect(); ()
    }
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    def skew(a: org.apache.spark.sql.DataFrame): Unit =
      a.groupBy(col("bucket")).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
          sum(col("sz") * col("sz")).as("sum_sq"))
        .show(false)
    timed("warmup (flat, discard)")(force(SimSearch.bucketAssign(e, c)))
    timed("flat assign")(force(SimSearch.bucketAssign(e, c)))
    timed("2l assign")(force(SimSearch.bucketAssignTwoLevel(e, c, n1)))
    // crossover demo: at C' = n/8 the flat scan is n·C' dots while the
    // two-level pays ~2n·√C' — the regime the hierarchy exists for
    val c2 = math.max(32L, n / 8).toInt
    val n12 = math.max(4, math.ceil(math.sqrt(c2.toDouble)).toInt)
    println(s"larger-C crossover: C2=$c2 n1=$n12")
    timed(s"flat assign C=$c2")(force(SimSearch.bucketAssign(e, c2)))
    timed(s"2l assign C=$c2")(force(SimSearch.bucketAssignTwoLevel(e, c2, n12)))
    println("flat skew:"); skew(SimSearch.bucketAssign(e, c))
    println("2l skew:"); skew(SimSearch.bucketAssignTwoLevel(e, c, n1))
    spark.stop()
  }

}
