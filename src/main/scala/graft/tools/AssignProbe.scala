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
      // object-agg sort fallback stays at Spark's spill-safe default;
      // bounded-buffer udafs get hash mode per-operator via the
      // BoundedAggFallback query-stage prep rule (GraftExtensions)
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
      // pmod bounds the fold: ScaleUp bucket ids reach 10^14 and a raw
      // sum over 200k of them overflows long under ANSI mode
      df.agg(sum(pmod(col("bucket"), lit(1000000007L)))).collect(); ()
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
    // trained centroids (sampled approximate Lloyd, hash-selected
    // stand-ins): skew vs prefix stand-ins
    def h(salt: String) = graft.ops.Core.md5Hash64(
      concat(lit(salt), col("vec_id").cast("string")))
    val kf = math.max(1L, n / (16 * c))
    val kc = math.max(1L, c.toLong / n1)
    val sample = e.where(pmod(h("samp|"), lit(16)) === 0)
    val cents0 = sample.where(pmod(h("cent|"), lit(kf)) === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        (pmod(graft.ops.Core.md5Hash64(concat(lit("coarse|"),
          col("vec_id").cast("string"))), lit(kc)) === 0).as("is_coarse"))
    val trained = SimSearch.trainCentroids(sample, cents0)
      .withColumn("is_coarse",
        pmod(graft.ops.Core.md5Hash64(concat(lit("coarse|"),
          col("cid").cast("string"))), lit(kc)) === 0)
      .cache()
    println(s"trained cents: ${trained.count()}")
    def trainedAssign() = SimSearch.assignTwoLevelAgainst(e, trained)
    timed("trained 2l assign")(force(trainedAssign()))
    println("trained skew:")
    skew(trainedAssign().where(col("bucket").isNotNull))
    // does a SECOND Lloyd round on the sample buy more balance?
    val trained2 = SimSearch.trainCentroids(sample, trained)
      .withColumn("is_coarse",
        pmod(graft.ops.Core.md5Hash64(concat(lit("coarse|"),
          col("cid").cast("string"))), lit(kc)) === 0)
      .cache()
    println(s"round-2 trained cents: ${trained2.count()}")
    println("round-2 trained skew:")
    skew(SimSearch.assignTwoLevelAgainst(e, trained2)
      .where(col("bucket").isNotNull))
    spark.stop()
  }

}
