package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.ops.Core

/** The streaming screens' beyond-broadcast story (the r14 frontier item):
  * a disk-partitioned BAND-KEY store with point-read probes per
  * micro-batch, replacing the broadcast 1-row bloom bitset once the
  * corpus' band-key vocabulary outgrows what a broadcast can carry.
  *
  * The broadcast forms (Streams.bloomTagStream / lshNearDupTagStream)
  * cap at the bitset a driver can build and every executor can hold:
  * sizing at ~10 bits/key (1% FP), 10⁹ corpus band keys is already a
  * ~1.2 GB bitset — past that the screen family has no broadcast to
  * probe. This store is the KnnStore discipline applied to the key
  * vocabulary: keys live on DISK, hash-sharded into `shard =
  * md5Hash64(bk) % S` partition directories with S scaled to the
  * vocabulary at build (KeysPerShard target, floored), sorted by key
  * within each shard so parquet row-group stats prune literal probes
  * below partition granularity. A micro-batch's band keys are
  * driver-bounded (≤ bands × batch rows — the serving-tier contract:
  * batches scale with INGEST load, never the corpus), so each batch
  * probes by point-reading exactly its keys' shard directories
  * (KnnStore.readPart — the listing itself is ∝ touched shards, never
  * C) and intersecting. Probe I/O is therefore ∝ the batch at ANY
  * corpus size (Probe `bandstore` measures it at 500k and 5M docs),
  * and the screen is EXACT — band-level membership with no bloom false
  * positives, so `flagged = false` keeps the provably-new contract and
  * `flagged = true` no longer wastes exact-verify work on bitset
  * collisions.
  *
  * Trade vs the broadcast form, stated honestly: the bloom probe is
  * stateless and shuffle-free per row; the stored probe pays one
  * driver-bounded key collect and one batch-sized groupBy per
  * micro-batch, plus ~touched-shard read tasks. Below broadcast scale
  * the bitset wins on latency; the store is the form that still EXISTS
  * past it — same shape as KnnStore's beam serving vs the inline graph.
  */
object BandStore {

  /** Shard-count floor and per-shard target. As with KnnStore's id
    * directory, the ACTUAL shard count is a layout property fixed at
    * build (≈ nKeys / KeysPerShard, floored) and persisted in
    * `_meta.json`, so probes agree without knowing vocabulary size;
    * n-scaled shards keep rows-per-shard constant as the corpus grows —
    * a fixed shard count would make every batch read the whole table
    * once its keys span all shards (measured for the id directory, r14).
    */
  val ShardsFloor = 64L
  val KeysPerShard = 4096L

  private[graft] val KeysSchema = "bk STRING, shard LONG"

  private def metaPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/_meta.json")

  private def writeMeta(s: SparkSession, root: String, shards: Long): Unit = {
    val p = metaPath(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write(s"""{"bandShards":$shards}""".getBytes("UTF-8"))
    out.close()
  }

  private[graft] def readShards(s: SparkSession, root: String): Long = {
    val p = metaPath(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(p)
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val m = """"bandShards"\s*:\s*(\d+)""".r
    m.findFirstMatchIn(txt) match {
      case Some(g) => g.group(1).toLong
      case None => throw new IllegalStateException(
        s"no bandShards in ${p}: $txt")
    }
  }

  /** Driver-side twin of Core.md5Hash64 over a UTF-8 string — same first
    * 15 hex chars of MD5 parsed base 16 (non-negative, < 2^60), so a
    * collected batch key turns into a LITERAL shard predicate with no
    * assist job. BandStoreSpec pins the twins equal so they cannot
    * drift.
    */
  private[graft] def md5Hash64Driver(v: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private[graft] def shardOfKey(bk: String, shards: Long): Long =
    java.lang.Math.floorMod(md5Hash64Driver(bk), shards)

  /** Build the store from a one-column (`bk` STRING) key frame — e.g.
    * `Dedup.bandKeys(sigs, id, bands, rows).select("bk")` for the LSH
    * screen, or the reference n-gram set for the decontamination screen
    * (the store is key-source-agnostic: any screen whose index is "a set
    * of strings" shards the same way). One shuffle (distinct) + one
    * clustered write; rebuildable from the corpus like any index.
    */
  def build(s: SparkSession, keys: DataFrame, root: String): Unit = {
    // from-scratch means FROM SCRATCH (the KnnStore fresh-root rule):
    // dynamic partition overwrite keeps any shard dirs a crashed prior
    // build at this root wrote — ghost keys that break the build ≡
    // vocabulary identity. Dynamic mode is for addKeys only.
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(s.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val distinctKeys = keys.select(col("bk")).distinct()
      .localCheckpoint(true)
    val nKeys = distinctKeys.count()
    val shards = math.max(ShardsFloor, nKeys / KeysPerShard)
    writeMeta(s, root, shards)
    val sharded = distinctKeys.withColumn("shard",
      pmod(Core.md5Hash64(col("bk")), lit(shards)))
    // one file per shard dir + bk-sorted row groups with small (1 MiB)
    // granules: a literal key probe prunes to its shard statically and
    // skips within it on row-group min/max — KnnStore.writePartitioned
    // is exactly this discipline
    graft.queries.KnnStore.writePartitioned(sharded, "shard",
      s"$root/keys", sortCol = Some("bk"))
  }

  /** Fold new keys into an existing store — the store's INCREMENTAL
    * maintenance, closing the continuous-ingest loop: a batch's accepted
    * (novel) rows extend the reference vocabulary, so later batches
    * screen against earlier arrivals without a rebuild. One point read +
    * dynamic overwrite of exactly the new keys' shards (∝ the batch,
    * never the vocabulary). Keys are a SET, so this is IDEMPOTENT —
    * replayed batches merge to the same rows (no KnnStore-style replay
    * guard needed) — and BandStoreSpec pins build(K1) + addKeys(K2) ≡
    * build(K1 ∪ K2) table-identical plus the idempotency. The shard
    * count S is a build-time layout property (meta unchanged): sustained
    * growth fattens shards ~linearly until the granule dominates probe
    * reads — the REBUILD trigger, same discipline as KnnStore's
    * occupancy drift.
    */
  def addKeys(s: SparkSession, keys: DataFrame, root: String): Unit = {
    val shards = readShards(s, root)
    val newKeys = keys.select(col("bk")).distinct()
      .withColumn("shard", pmod(Core.md5Hash64(col("bk")), lit(shards)))
      .localCheckpoint(true)
    val touched = newKeys.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.nonEmpty) {
      val merged = graft.queries.KnnStore.readPart(s, s"$root/keys",
          KeysSchema, "shard", touched)
        .union(newKeys).distinct()
        .localCheckpoint(true)
      graft.queries.KnnStore.writePartitioned(merged, "shard",
        s"$root/keys", sortCol = Some("bk"))
    }
  }

  /** Exact membership screen of a driver-bounded key set: point-read the
    * keys' shard directories, intersect, return the present subset. The
    * read is ∝ |keys| (touched shards × rows-per-shard, rows-per-shard
    * constant by the build-time S scaling), never ∝ the vocabulary.
    */
  def probe(s: SparkSession, root: String, keys: Seq[String]): Set[String] = {
    val distinctKeys = keys.distinct
    if (distinctKeys.isEmpty) Set.empty
    else {
      val shards = readShards(s, root)
      val touched = distinctKeys.map(shardOfKey(_, shards))
      graft.queries.KnnStore.readPart(s, s"$root/keys", KeysSchema,
          "shard", touched)
        .where(col("bk").isin(distinctKeys: _*))
        .select(col("bk")).collect().map(_.getString(0)).toSet
    }
  }

  /** The stored twin of Streams.lshNearDupTagStream: tag one micro-batch
    * against the band-key store. Identical key family (per-row
    * signatures, positional band keys — same seeds contract) and the
    * same output columns (input's + n_hit_bands + flagged, short docs
    * (0, false)); membership is EXACT instead of bloom-approximate, so
    * stored-flagged ⊆ bloom-flagged row-wise and unflagged keeps the
    * provably-new contract (BandStoreSpec pins both). Rows must carry a
    * unique `idCol` (the upstream dedupStream contract) — the hit
    * counts re-join on it. Meant for foreachBatch (screenSink below):
    * the probe's key collect is a driver action, which a stream-side
    * transform cannot host.
    */
  def lshTagBatch(s: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String, n: Int, seeds: Seq[Int],
      bands: Int, rowsPerBand: Int): DataFrame =
    tagBatchKeys(s, root, batch, idCol,
      lshKeyed(batch, idCol, textCol, n, seeds, bands, rowsPerBand),
      "n_hit_bands")

  /** Per-row LSH band keys of a batch as (`__bsid`, `bks` array<string>)
    * — the key frame both the tagger and the store-maintenance sink
    * derive from (same positional family as lshNearDupTagStream).
    */
  private[graft] def lshKeyed(batch: DataFrame, idCol: String,
      textCol: String, n: Int, seeds: Seq[Int], bands: Int,
      rowsPerBand: Int): DataFrame = {
    require(seeds == (0 until bands * rowsPerBand),
      s"lshTagBatch requires seeds == 0 until bands*rowsPerBand " +
        s"(= 0 until ${bands * rowsPerBand}); got $seeds")
    val sigs = Dedup.rowMinhashSigs(batch, textCol, seeds, n)
    val bkCols: Seq[Column] = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}"))
      concat(lit(s"$b|"), concat_ws("_", rows: _*))
    }
    sigs.select(col(idCol).as("__bsid"),
      when(col(s"mh${seeds.head}").isNotNull, array(bkCols: _*))
        .otherwise(array().cast("array<string>")).as("bks"))
  }

  /** Generic stored-screen tagger: `keyed` carries (`__bsid`, `bks`
    * array<string>) — each row's screen keys, any key family (LSH band
    * keys above, n-gram sets for the decontamination screen, …). The
    * union of the batch's keys is collected (driver-bounded by the
    * serving contract), point-read-probed, and per-row hit counts
    * re-joined onto `batch` as (`outCol`, flagged). Keyless rows
    * (empty array) tag (0, false).
    */
  private[graft] def tagBatchKeys(s: SparkSession, root: String,
      batch: DataFrame, idCol: String, keyed: DataFrame,
      outCol: String): DataFrame = {
    val withKeys = keyed.localCheckpoint(true)
    // driver-bounded by the serving contract: ≤ keys/row × |batch|
    val batchKeys = withKeys
      .select(explode(col("bks")).as("bk")).distinct()
      .collect().map(_.getString(0)).toSeq
    val hits = probe(s, root, batchKeys)
    import s.implicits._
    val hitsDf = hits.toSeq.toDF("bk")
    val nh = withKeys
      .select(col("__bsid"), explode(col("bks")).as("bk"))
      .join(broadcast(hitsDf), Seq("bk"), "left_semi")
      .groupBy(col("__bsid"))
      .agg(count(lit(1)).as("nh"))
    batch.join(nh, batch(idCol) === nh("__bsid"), "left")
      .withColumn(outCol, coalesce(col("nh"), lit(0L)))
      .withColumn("flagged", col(outCol) > 0)
      .drop("__bsid", "nh")
  }

  /** The stored twin of the DECONTAMINATION screen
    * (Streams.bloomTagStream over reference n-grams): tag each batch
    * row with how many of its distinct `n`-gram shingles exist in the
    * stored reference vocabulary — exact membership, so `n_ref_grams`
    * needs no bloom-then-verify split. Build the store from the
    * reference corpus' distinct shingles.
    */
  def deconTagBatch(s: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    tagBatchKeys(s, root, batch, idCol,
      batch.select(col(idCol).as("__bsid"),
        array_distinct(graft.llm.TextOps.shingles(col(textCol), n))
          .as("bks")),
      "n_ref_grams")

  /** Continuous form: screen an arrival stream against the store,
    * appending tagged rows to `outDir` — the beyond-broadcast twin of
    * wiring lshNearDupTagStream into a sink. foreachBatch because each
    * batch's probe point-reads the store (driver actions per batch, the
    * KnnStore serving pattern), which a stateless stream transform
    * cannot express.
    */
  def lshScreenSink(stream: DataFrame, root: String, idCol: String,
      textCol: String, n: Int, seeds: Seq[Int], bands: Int,
      rowsPerBand: Int, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          lshTagBatch(b.sparkSession, root, b, idCol, textCol, n, seeds,
              bands, rowsPerBand)
            .write.mode("append").parquet(outDir)
      }
      .start()

  /** The CLOSED continuous-ingest loop: tag each micro-batch against the
    * store, append the tagged rows to `outDir`, then fold the ACCEPTED
    * (unflagged) rows' band keys back into the store — so batch N+1
    * near-dup-screens against batches 1..N as well as the build-time
    * corpus, with every step ∝ the batch. This is the self-maintaining
    * form of the near-dup screen a crawl ingest actually runs (the bloom
    * form cannot do this at all: a broadcast bitset rebuilt per batch
    * re-reads the whole corpus — its index is batch-side and static by
    * construction). addKeys' idempotency makes foreachBatch replays
    * safe: a re-delivered batch re-merges the same keys.
    */
  def lshScreenUpsertSink(stream: DataFrame, root: String, idCol: String,
      textCol: String, n: Int, seeds: Seq[Int], bands: Int,
      rowsPerBand: Int, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val s = b.sparkSession
          val tagged = lshTagBatch(s, root, b, idCol, textCol, n, seeds,
              bands, rowsPerBand)
            .localCheckpoint(true)
          tagged.write.mode("append").parquet(outDir)
          val novelKeys = lshKeyed(
              tagged.where(!col("flagged")), idCol, textCol, n, seeds,
              bands, rowsPerBand)
            .select(explode(col("bks")).as("bk"))
          addKeys(s, novelKeys, root)
        }
      }
      .start()
}
