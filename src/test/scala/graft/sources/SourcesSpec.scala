package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Source/sink contracts (SURVEY §2.1): explicit-schema JSON with corrupt-
  * record capture, optional-source mode switch, partitioned parquet with
  * partition pruning, nested JSON sink roundtrip.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("score", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("json reads with explicit schema and captures malformed rows") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "in.json")
    Files.writeString(f.toPath,
      """{"id":"a","score":0.5}
        |not json at all
        |{"id":"b","score":1.5}
        |""".stripMargin)
    // cache: Spark disallows querying ONLY the corrupt-record column of a
    // raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = Sources.json(spark, f.getPath, schema).cache()
    val good = df.where(col("_corrupt_record").isNull)
      .select(col("id"), col("score")).as[(String, Double)].collect().toSet
    assert(good == Set(("a", 0.5), ("b", 1.5)))
    assert(df.where(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("quarantine splits clean rows from raw malformed lines") {
    val dir = Files.createTempDirectory("graft-quar").toFile
    val f = new java.io.File(dir, "in.json")
    Files.writeString(f.toPath,
      """{"id":"a","score":0.5}
        |{broken
        |{"id":"b","score":1.5}
        |also broken
        |""".stripMargin)
    val (clean, bad, handle) =
      Sources.quarantine(Sources.json(spark, f.getPath, schema))
    assert(clean.columns.toSeq == Seq("id", "score"),
      "corrupt column must not leak into the clean side")
    assert(clean.as[(String, Double)].collect().toSet ==
      Set(("a", 0.5), ("b", 1.5)))
    val raw = bad.as[String].collect().toSet
    assert(raw == Set("{broken", "also broken"),
      s"quarantine must keep the RAW line for replay: $raw")
    handle.unpersist()
  }

  test("optionalJson switches pipeline mode on presence") {
    assert(Sources.optionalJson(spark, None, schema).isEmpty)
    assert(Sources.optionalJson(spark, Some(""), schema).isEmpty)
  }

  test("partitioned parquet sink enables partition pruning") {
    val dir = Files.createTempDirectory("graft-parquet").toFile.getPath + "/out"
    val df = Seq(("a", "2024", 1.0), ("b", "2025", 2.0), ("c", "2025", 3.0))
      .toDF("id", "year", "v")
    Sources.writeParquet(df, dir, partitionBy = Seq("year"))
    val back = Sources.parquet(spark, dir).where(col("year") === "2025")
    assert(back.select(col("id")).as[String].collect().toSet == Set("b", "c"))
    // pruning visible in the plan: the scan carries a partition filter
    assert(back.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("dynamic partition overwrite replaces only the partitions the " +
    "batch touches — the idempotent-backfill sink contract") {
    // STATIC overwrite mode (Spark's default) would wipe the whole table
    // when re-running one day's backfill — the classic incremental-ETL
    // data-loss foot-gun. Dynamic mode rewrites exactly the partitions
    // present in the incoming frame, so re-running a day is idempotent
    // and never touches its neighbours. At 100 TB this is how a daily
    // job repairs one date directory in place.
    val dir = Files.createTempDirectory("graft-dpo").toFile.getPath + "/out"
    Seq(("a", "d1", 1.0), ("b", "d2", 2.0), ("c", "d3", 3.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    // re-run day d2 with corrected rows, dynamic overwrite
    Seq(("b2", "d2", 20.0)).toDF("id", "day", "v")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(col("id"), col("day")).as[(String, String)].collect().toSet
    assert(back == Set(("a", "d1"), ("b2", "d2"), ("c", "d3")),
      s"dynamic overwrite must replace d2 only: $back")
  }

  test("csv and orc roundtrip with explicit schemas") {
    val csvSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Seq((1L, "a", 0.5), (2L, "b,with,commas", 1.5)).toDF("id", "name", "score")
    val csvDir = Files.createTempDirectory("graft-csv").toFile.getPath + "/out"
    Sources.writeCsv(df, csvDir)
    val backCsv = Sources.csv(spark, csvDir, csvSchema)
      .as[(Long, String, Double)].collect().toSet
    assert(backCsv == Set((1L, "a", 0.5), (2L, "b,with,commas", 1.5)))

    val orcDir = Files.createTempDirectory("graft-orc").toFile.getPath + "/out"
    Sources.writeOrc(df, orcDir)
    val backOrc = Sources.orc(spark, orcDir).as[(Long, String, Double)].collect().toSet
    assert(backOrc == backCsv)
  }

  test("parquetMerged unions evolved schemas with null fill") {
    val base = Files.createTempDirectory("graft-evolve").toFile.getPath
    Seq((1L, "a")).toDF("id", "tag").write.parquet(s"$base/v1")
    Seq((2L, "b", 9L)).toDF("id", "tag", "extra").write.parquet(s"$base/v2")
    val merged = Sources.parquetMerged(spark, s"$base/v1", s"$base/v2")
    assert(merged.columns.toSet == Set("id", "tag", "extra"))
    val rows = merged.select(col("id"), col("extra"))
      .as[(Long, Option[Long])].collect().toSet
    assert(rows == Set((1L, None), (2L, Some(9L))))
  }

  test("compact re-bins a many-file directory to the target count") {
    val base = Files.createTempDirectory("graft-compact").toFile.getPath
    // 16 tiny files
    (1 to 160).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(16).write.parquet(s"$base/in")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts(s"$base/in") == 16)
    // huge target -> everything fits one file
    val n = Sources.compact(spark, s"$base/in", s"$base/out")
    assert(n == 1 && parts(s"$base/out") == 1)
    val back = spark.read.parquet(s"$base/out").as[(Long, String)].collect().toSet
    assert(back == (1 to 160).map(i => (i.toLong, s"row$i")).toSet)
  }

  test("compact reports files actually written when the size-derived bin " +
    "count exceeds the input partition count") {
    val base = Files.createTempDirectory("graft-compact2").toFile.getPath
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(2).write.parquet(s"$base/in")
    // 1-byte target -> requested bins far exceed the 2 input partitions;
    // coalesce cannot increase partition count, so exactly 2 files land
    val n = Sources.compact(spark, s"$base/in", s"$base/out", targetFileBytes = 1L)
    val written = new java.io.File(s"$base/out").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(n == written && written == 2)
  }

  test("nested structs survive a JSON sink/scan roundtrip") {
    val dir = Files.createTempDirectory("graft-jsonsink").toFile.getPath + "/out"
    val df = Seq((1L, Seq(("e1", 2L), ("e2", 3L))))
      .toDF("id", "events")
      .withColumn("events", transform(col("events"),
        s => struct(s.getField("_1").as("name"), s.getField("_2").as("n"))))
    Sources.writeJson(df, dir)
    val backSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("events", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("n", LongType)))))))
    val back = Sources.json(spark, dir, backSchema)
    val row = back.select(col("id"), col("events.name").as("names")).head()
    assert(row.getLong(0) == 1L)
    assert(row.getSeq[String](1) == Seq("e1", "e2"))
  }
}
