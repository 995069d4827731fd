package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for every suite (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // bounded-buffer object aggs (TopK/TopKPair/sketches) must stay
    // hash-based: Spark's default fallback flips to SORT-based agg at
    // 128 keys, sorting the whole input stream (disk-killed the knn
    // pair agg at 2M vectors, r10)
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
