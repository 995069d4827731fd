package graft.streaming

import graft.SparkSpec
import graft.llm.Dedup
import graft.ops.Core
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The beyond-broadcast streaming screen (BandStore): the disk-sharded
  * band-key store must agree EXACTLY with ground-truth band membership,
  * sit inside the bloom form's flag set (bloom ⊇ exact — it only ever
  * adds false positives), and keep its driver-side shard hash pinned to
  * the Spark column it mirrors. Fixture corpus so the keys are the real
  * workload's, not toys.
  */
class BandStoreSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")
  private val seeds = 0 until 8

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bandstore-$tag").toString

  private def rm(p: String): Unit =
    scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()

  private lazy val docs =
    Core.table(spark, dir, "documents").localCheckpoint(true)
  private lazy val corpus = docs.where(col("source") === "src0")
  private lazy val arrivals = docs.where(col("source") =!= "src0")

  private def corpusKeys: DataFrame = Dedup.bandKeys(
    Dedup.minhashSigs(corpus, "doc_id", "text", 3, seeds),
    "doc_id", bands = 4, rowsPerBand = 2)

  test("driver-side md5Hash64 twin evaluates identically to the Spark " +
    "column (shard predicates cannot drift from the written layout)") {
    val s = spark
    import s.implicits._
    val samples = Seq("0|12_34", "3|-9_70005", "", "band|key with spaces",
      "üñíçødé|→", "1|" + "x" * 500)
    val fromCol = samples.toDF("bk")
      .select(col("bk"), Core.md5Hash64(col("bk")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { v =>
      assert(BandStore.md5Hash64Driver(v) == fromCol(v), s"drift on '$v'")
    }
  }

  test("probe returns exactly the stored ∩ requested key set; absent " +
    "shards and empty requests are clean no-ops") {
    val root = tmp("probe")
    try {
      BandStore.build(spark, corpusKeys.select(col("bk")), root)
      assert(BandStore.readShards(spark, root) == BandStore.ShardsFloor)
      val stored = corpusKeys.select(col("bk")).distinct()
        .collect().map(_.getString(0)).toSet
      val present = stored.take(5).toSeq
      val absent = Seq("9|nope_nothere", "8|also_absent")
      assert(BandStore.probe(spark, root, present ++ absent) == present.toSet)
      assert(BandStore.probe(spark, root, absent).isEmpty)
      assert(BandStore.probe(spark, root, Nil).isEmpty)
    } finally rm(root)
  }

  test("lshTagBatch ≡ exact band membership on the fixture corpus, and " +
    "its flag set ⊆ the broadcast-bloom form's (bloom only adds FPs)") {
    val root = tmp("exact")
    try {
      BandStore.build(spark, corpusKeys.select(col("bk")), root)
      val tagged = BandStore.lshTagBatch(spark, root, arrivals, "doc_id",
          "text", 3, seeds, bands = 4, rowsPerBand = 2)
        .select(col("doc_id"), col("n_hit_bands"), col("flagged"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      // ground truth: per-arrival band keys joined against the corpus'
      // distinct key set, straight relational math with no store
      val truth = Dedup.bandKeys(
          Dedup.minhashSigs(arrivals, "doc_id", "text", 3, seeds),
          "doc_id", bands = 4, rowsPerBand = 2)
        .join(corpusKeys.select(col("bk")).distinct(), Seq("bk"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val allIds = arrivals.select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(tagged.keySet == allIds)    // every arrival row tagged once
      assert(tagged.nonEmpty && truth.nonEmpty)
      allIds.foreach { id =>
        val expect = truth.getOrElse(id, 0L)
        assert(tagged(id) == ((expect, expect > 0)), s"doc $id")
      }
      // bloom comparison on the same corpus: flagged ⊆ bloom-flagged
      val m = 16384
      val bits = Dedup.lshBandBloom(
        Dedup.minhashSigs(corpus, "doc_id", "text", 3, seeds),
        "doc_id", bands = 4, rowsPerBand = 2, mBits = m, k = 3)
      val bloom = Streams.lshNearDupTagStream(arrivals, bits, "text", 3,
          seeds, bands = 4, rowsPerBand = 2, mBits = m, k = 3)
        .select(col("doc_id"), col("flagged"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      allIds.foreach { id =>
        assert(!tagged(id)._2 || bloom(id), s"doc $id: exact-flagged but " +
          "bloom-unflagged — bloom claimed a false NEGATIVE")
      }
    } finally rm(root)
  }

  test("deconTagBatch ≡ exact n-gram membership against the stored " +
    "reference vocabulary (key-source-agnostic store)") {
    import graft.llm.TextOps
    val root = tmp("decon")
    try {
      BandStore.build(spark, corpus.select(explode(array_distinct(
        TextOps.shingles(col("text"), 5))).as("bk")), root)
      val tagged = BandStore.deconTagBatch(spark, root, arrivals,
          "doc_id", "text", 5)
        .select(col("doc_id"), col("n_ref_grams"), col("flagged"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      val truth = arrivals
        .select(col("doc_id"), explode(array_distinct(
          TextOps.shingles(col("text"), 5))).as("g"))
        .join(corpus.select(explode(array_distinct(
            TextOps.shingles(col("text"), 5))).as("g")).distinct(),
          Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val allIds = arrivals.select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(tagged.keySet == allIds)
      assert(truth.nonEmpty)
      allIds.foreach { id =>
        val expect = truth.getOrElse(id, 0L)
        assert(tagged(id) == ((expect, expect > 0)), s"doc $id")
      }
    } finally rm(root)
  }

  test("build is from-scratch: rebuilding a smaller vocabulary at the " +
    "same root leaves no ghost keys from the previous store") {
    val s = spark
    import s.implicits._
    val kAll = corpusKeys.select(col("bk")).distinct().localCheckpoint(true)
    val kSub = kAll.where(abs(hash(col("bk"))) % 3 === 0).localCheckpoint(true)
    assert(kSub.count() > 0 && kSub.count() < kAll.count())
    def keyRows(root: String): Set[(String, Long)] =
      spark.read.schema(BandStore.KeysSchema).parquet(s"$root/keys")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val reused = tmp("freshroot")
    val clean = tmp("freshroot-clean")
    try {
      BandStore.build(spark, kAll, reused)
      BandStore.build(spark, kSub, reused) // same root, smaller vocab
      BandStore.build(spark, kSub, clean)
      assert(keyRows(reused) == keyRows(clean))
    } finally { rm(reused); rm(clean) }
  }

  test("addKeys is exact and idempotent: build(K1) + addKeys(K2) ≡ " +
    "build(K1 ∪ K2), and a replayed fold changes nothing") {
    val s = spark
    import s.implicits._
    val k1 = corpusKeys.select(col("bk")).distinct()
      .where(abs(hash(col("bk"))) % 2 === 0).localCheckpoint(true)
    val k2 = corpusKeys.select(col("bk")).distinct()
      .where(abs(hash(col("bk"))) % 2 =!= 0).localCheckpoint(true)
    assert(k1.count() > 0 && k2.count() > 0)
    def keyRows(root: String): Set[(String, Long)] =
      spark.read.schema(BandStore.KeysSchema).parquet(s"$root/keys")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val inc = tmp("addkeys")
    val full = tmp("addkeys-full")
    try {
      BandStore.build(spark, k1, inc)
      BandStore.addKeys(spark, k2, inc)
      BandStore.build(spark, k1.union(k2), full)
      assert(keyRows(inc) == keyRows(full))
      BandStore.addKeys(spark, k2, inc) // replay: set semantics
      assert(keyRows(inc) == keyRows(full))
      val sample = k2.limit(3).collect().map(_.getString(0)).toSeq
      assert(BandStore.probe(spark, inc, sample) == sample.toSet)
    } finally { rm(inc); rm(full) }
  }

  test("lshScreenUpsertSink closes the ingest loop: an accepted novel " +
    "doc's keys enter the store, so its later near-dup is flagged") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val root = tmp("loop")
    val out = tmp("loop-out")
    val ckpt = tmp("loop-ckpt")
    try {
      val mini = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today")
      ).toDF("doc_id", "text")
      BandStore.build(spark, Dedup.bandKeys(
        Dedup.minhashSigs(mini, "doc_id", "text", 3, seeds),
        "doc_id", bands = 4, rowsPerBand = 2).select(col("bk")), root)
      val input = MemoryStream[(Long, String)]
      val q = BandStore.lshScreenUpsertSink(
        input.toDF().toDF("doc_id", "text"), root, "doc_id", "text", 3,
        seeds, bands = 4, rowsPerBand = 2, out, ckpt)
      try {
        // batch 1: novel doc — accepted, its keys fold into the store
        input.addData(
          (20L, "zebras graze quietly beside the wide muddy river bank"))
        q.processAllAvailable()
        // batch 2: exact text twin of the batch-1 arrival (id differs) +
        // a build-corpus dup + a fresh novel doc
        input.addData(
          (21L, "zebras graze quietly beside the wide muddy river bank"),
          (22L, "the quick brown fox jumps over the lazy dog today"),
          (23L, "glaciers carve steep valleys under pale morning light"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.parquet(out)
        .select(col("doc_id"), col("flagged"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(!rows(20L), rows)  // novel at arrival time
      assert(rows(21L), rows)   // caught by the UPDATED store
      assert(rows(22L), rows)   // caught by the build-time corpus
      assert(!rows(23L), rows)  // still novel
    } finally { rm(root); rm(out); rm(ckpt) }
  }

  test("lshScreenSink tags micro-batches against the store end to end " +
    "(exact dup flags all bands, novel and shingle-less docs pass)") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val root = tmp("sink")
    val out = tmp("sink-out")
    val ckpt = tmp("sink-ckpt")
    try {
      val mini = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different words appear in this one right here")
      ).toDF("doc_id", "text")
      BandStore.build(spark, Dedup.bandKeys(
        Dedup.minhashSigs(mini, "doc_id", "text", 3, seeds),
        "doc_id", bands = 4, rowsPerBand = 2).select(col("bk")), root)
      val input = MemoryStream[(Long, String)]
      val q = BandStore.lshScreenSink(input.toDF().toDF("doc_id", "text"),
        root, "doc_id", "text", 3, seeds, bands = 4, rowsPerBand = 2,
        out, ckpt)
      try {
        input.addData(
          (10L, "the quick brown fox jumps over the lazy dog today"),
          (11L, "zebras graze quietly beside the wide muddy river bank"))
        q.processAllAvailable()
        input.addData((12L, "too short"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.parquet(out)
        .select(col("doc_id"), col("n_hit_bands"), col("flagged"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      assert(rows(10L) == ((4L, true)), rows)  // exact dup: every band hits
      assert(rows(11L) == ((0L, false)), rows) // novel
      assert(rows(12L) == ((0L, false)), rows) // shingle-less
    } finally { rm(root); rm(out); rm(ckpt) }
  }
}
