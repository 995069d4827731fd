package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming capability layer (an extension over the reference,
  * which is batch-only — SURVEY §2.10): the batch operators' streaming twins.
  *
  * Scale notes: windowed aggs shuffle on (window, key) exactly like a batch
  * groupBy; the watermark bounds state size — without it the window state
  * grows forever at 100 TB/day. Stateful sessionization keys state by user —
  * state store partitions follow the shuffle partitioning.
  */
object Streams {

  /** Watermarked tumbling-window aggregation over an event stream
    * (ts timestamp, event_type string, value double). Append-mode safe:
    * windows finalize once the watermark passes.
    */
  def windowedCounts(events: DataFrame,
                     delay: String = "10 minutes",
                     win: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), win).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: first occurrence per `keys` wins; the watermark
    * lets the state store EVICT keys older than `delay` (without it, dedup
    * state grows unboundedly — the 100 TB/day killer). `ts` must be one of
    * the event-time columns. Batch twin: dropDuplicates(keys).
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment join: every micro-batch's events pick up
    * their dimension row from a STATIC (batch) table. The static side is
    * re-evaluated per micro-batch — a slowly-changing dimension backed by
    * a parquet path refreshes without restarting the query — and the
    * broadcast hint keeps the stream side shuffle-free: at continuous-
    * ingest scale the stream never pays an exchange for a lookup-sized
    * dim. Left join so events with unknown keys survive (dead-letter
    * them downstream rather than silently dropping).
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming Bloom probe — the continuous-ingest half of
    * q_dedup_decon_bloom: a batch-built bitset (one row of m/8 bytes,
    * re-read per micro-batch like any slowly-changing dim) filters a
    * document stream at ingest, tagging rows whose `key` might be in the
    * reference set. The probe predicate is the same codegen'd built-in
    * chain as the batch side (ops.Bloom.mightContain), so the stream
    * never shuffles and never joins anything bigger than one row — the
    * sketch is the only state, and it lives in the BATCH world.
    * Emits all rows with a `flagged` column; dropping instead of tagging
    * is a `.where` away, but tagging keeps the false-positive audit path.
    *
    * SCALE CEILING (stated, not hidden): the whole design rides a
    * broadcast bitset, so it caps at what the driver can build and every
    * executor can hold — at ~10 bits/key (1% FP), 10⁹ reference keys is
    * already a ~1.2 GB one-row broadcast. Past that, use the
    * disk-partitioned key store (BandStore — hash-sharded key
    * directories, point-read probes per micro-batch ∝ the batch, exact
    * membership); this form stays the right one BELOW the ceiling
    * because its per-row probe is stateless and shuffle-free.
    */
  def bloomTagStream(stream: DataFrame, bits: DataFrame, key: String,
                     mBits: Int, k: Int): DataFrame =
    stream.crossJoin(broadcast(bits))
      .withColumn("flagged",
        graft.ops.Bloom.mightContain(col("bloom_bits"), col(key), mBits, k))
      .drop("bloom_bits")

  /** Streaming MinHash-LSH near-dup screen — the continuous-ingest half of
    * the near-dup family (the bloomTagStream pattern generalized from
    * exact n-gram membership to LSH banding): a batch-built bloom over
    * the corpus' band-bucket keys (Dedup.lshBandBloom — one row, re-read
    * per micro-batch like any slowly-changing dim) tags incoming docs
    * whose ANY band bucket might already exist in the corpus. Signatures
    * are computed PER ROW (Dedup.rowMinhashSigs — array_min folds, no
    * groupBy), so the stream is stateless and shuffle-free end to end:
    * its only join is the broadcast 1-row bitset. Band-bucket screening
    * has no false negatives, and the bloom adds none either, so a
    * `flagged = false` row is PROVABLY new at the LSH level; flagged rows
    * go to the batch exact-verify (tag, don't drop — same audit contract
    * as bloomTagStream). Emits every input row plus
    * (n_hit_bands, flagged); docs too short to shingle tag (0, false).
    *
    * SCALE CEILING: same broadcast cap as bloomTagStream — the bitset is
    * sized to the corpus' BAND-KEY vocabulary, and past ~10⁹ keys there
    * is no broadcast to probe. BandStore.lshTagBatch is the
    * beyond-broadcast twin (same key family, exact membership, probe
    * I/O ∝ the micro-batch); BandStoreSpec pins stored-flagged ⊆
    * bloom-flagged and exactness on the same corpus.
    */
  def lshNearDupTagStream(stream: DataFrame, bits: DataFrame,
                          textCol: String, n: Int, seeds: Seq[Int],
                          bands: Int, rowsPerBand: Int,
                          mBits: Int, k: Int): DataFrame = {
    import graft.llm.Dedup
    import graft.ops.Core
    // Band keys below index signature columns POSITIONALLY (mh${b*r+j})
    // while rowMinhashSigs names them by seed VALUE (mh$seed): the two
    // coincide only for the contiguous 0..bands*rowsPerBand seed family.
    // Fail fast here instead of an AnalysisException (or a silent
    // wrong-family probe) at plan time.
    require(seeds == (0 until bands * rowsPerBand),
      s"lshNearDupTagStream requires seeds == 0 until bands*rowsPerBand " +
        s"(= 0 until ${bands * rowsPerBand}); got $seeds")
    val sigs = Dedup.rowMinhashSigs(stream, textCol, seeds, n)
    val hits = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      val key = concat(lit(s"$b|"), concat_ws("_", rows: _*))
      when(graft.ops.Bloom.mightContainHashes(col("bloom_bits"),
        Core.md5Hash64(key), Core.md5Hash64(concat(lit("bl|"), key)),
        mBits, k), 1L).otherwise(0L)
    }.reduce(_ + _)
    sigs.crossJoin(broadcast(bits))
      .withColumn("n_hit_bands",
        when(col(s"mh${seeds.head}").isNotNull, hits).otherwise(lit(0L)))
      .withColumn("flagged", col("n_hit_bands") > 0)
      .drop("bloom_bits" +: seeds.map(i => s"mh$i"): _*)
  }

  /** Watermarked stream-stream correlation join: each event of `a` pairs
    * with same-user events of `b` whose timestamp falls in
    * [a.ts − lookback, a.ts]. Both watermarks PLUS the bounded time-range
    * predicate are what let the join state store evict old rows — an
    * unconstrained stream-stream join buffers both streams forever, the
    * other unbounded-state killer at continuous-ingest scale.
    *
    * Column contract: both inputs are (user_id, ts, value); `b`'s columns
    * come back prefixed `b_`.
    */
  def correlateStreams(a: DataFrame, b: DataFrame,
                       delay: String = "10 minutes",
                       lookback: String = "5 minutes"): DataFrame = {
    val bw = b.toDF("b_user_id", "b_ts", "b_value")
    a.withWatermark("ts", delay)
      .join(bw.withWatermark("b_ts", delay),
        col("user_id") === col("b_user_id") &&
          col("b_ts") >= col("ts") - expr(s"INTERVAL $lookback") &&
          col("b_ts") <= col("ts"))
  }

  /** Native streaming session windows — the built-in operator twin of the
    * custom flatMapGroupsWithState fold below (and of the batch
    * q_window_session_native): `session_window(ts, gap)` merges events
    * into gap-bounded sessions inside the state store, the watermark
    * closes sessions whose end + gap has passed, and Append mode emits
    * each session exactly once on close. State per (user, open session)
    * is one interval — the same bound the hand-rolled fold keeps, with
    * the merge logic owned by the engine.
    */
  def sessionWindowCounts(events: DataFrame,
                          gap: String = "30 minutes",
                          delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("session_start"), col("user_id"),
        col("n_events"))

  /** LEFT OUTER variant of correlateStreams: events of `a` with no
    * same-user `b` event in [a.ts − lookback, a.ts] still emit, null-
    * extended — but only once the watermark passes their join window, when
    * the state store can PROVE no late match can arrive. This is the
    * streaming form of "left join for dead-letter auditing": the inner
    * variant silently drops unmatched events; production attribution
    * pipelines need the unmatched side to measure coverage. Same state
    * eviction bounds as the inner join (both watermarks + the closed time
    * range); the only extra cost is holding unmatched left rows until
    * their window expires — already bounded by the same watermark.
    */
  def correlateStreamsOuter(a: DataFrame, b: DataFrame,
                            delay: String = "10 minutes",
                            lookback: String = "5 minutes"): DataFrame = {
    val bw = b.toDF("b_user_id", "b_ts", "b_value")
    a.withWatermark("ts", delay)
      .join(bw.withWatermark("b_ts", delay),
        col("user_id") === col("b_user_id") &&
          col("b_ts") >= col("ts") - expr(s"INTERVAL $lookback") &&
          col("b_ts") <= col("ts"),
        "leftOuter")
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(startMs: Long, endMs: Long, n: Long)
  case class Session(user_id: Long, n_events: Long, duration_ms: Long)

  /** One micro-batch's worth of gap-session folding, pure so the ordering
    * semantics are unit-testable: merge the carried span and the batch's
    * events in start order under the gap rule. Returns (closed sessions in
    * time order, the still-open span). An event more than gapMs before the
    * carried start — possible only when the watermark lags the span by
    * more than the gap, e.g. a union with multipleWatermarkPolicy=min
    * upstream — closes as its own earlier session, matching what the
    * batch twin's global sort would produce, instead of being glued to a
    * session it precedes by more than the gap.
    */
  private[streaming] def foldGapSessions(
      uid: Long, carried: Option[SessionState], times: Seq[Long],
      gapMs: Long): (Seq[Session], Option[SessionState]) = {
    val atoms = (carried.toSeq ++ times.map(t => SessionState(t, t, 1)))
      .sortBy(_.startMs)
    val closed = scala.collection.mutable.Buffer[Session]()
    var cur: Option[SessionState] = None
    atoms.foreach { a =>
      cur = cur match {
        case Some(s) if a.startMs - s.endMs <= gapMs =>
          Some(SessionState(math.min(s.startMs, a.startMs),
            math.max(s.endMs, a.endMs), s.n + a.n))
        case Some(s) =>
          closed += Session(uid, s.n, s.endMs - s.startMs)
          Some(a)
        case None => Some(a)
      }
    }
    (closed.toSeq, cur)
  }

  /** Streaming gap sessionization — the streaming twin of
    * q_window_sessionize: per-user sessions close after `gapMinutes` of
    * event-time inactivity and are emitted ONCE, via
    * flatMapGroupsWithState + EventTimeTimeout. The watermark both bounds
    * the state store and drives the timeouts: a session's state is evicted
    * the moment its timeout fires, so state size tracks ACTIVE users only.
    * (Millisecond timestamp resolution — java.sql.Timestamp.getTime — is
    * the granularity of the state; the batch twin compares microseconds.)
    */
  def sessionize(events: Dataset[SessionEvent],
                 gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.n, s.endMs - s.startMs))
          } else {
            val (closed, cur) = foldGapSessions(uid, state.getOption,
              batch.map(_.ts.getTime).toSeq, gapMs)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, tsMs: Long)
  case class FunnelState(s1: Option[Long], s2: Option[Long], s3: Option[Long])
  case class FunnelSnapshot(user_id: Long, stage: Int)

  /** Streaming twin of q_events_funnel's min-chain: per-user ordered-stage
    * progression (stage N only counts strictly after stage N-1's entry),
    * held as three Option[Long] timestamps of bounded per-user state and
    * emitted as the user's current stage depth each micro-batch (Update
    * mode — the sink's last snapshot per user is the funnel position).
    *
    * Equivalence contract: under per-user ts-ordered arrival (the keyed
    * Kafka-partition reality) the final snapshots match the batch
    * min-chain exactly — in ts order the first qualifying event IS the
    * min, so the fold and the min-agg agree; each micro-batch is sorted
    * before folding, so disorder WITHIN a batch is also tolerated. Only
    * late events that cross micro-batch boundaries can diverge — a
    * watermarked buffer would close that gap at the cost of emit latency.
    *
    * 100 TB shape: state is 3 longs per ACTIVE user regardless of event
    * volume; no shuffle beyond the groupByKey hash exchange. Dormant-user
    * GC would add ProcessingTimeTimeout eviction, dropping users whose
    * funnel can no longer change.
    */
  def funnelStages(events: Dataset[FunnelEvent],
                   stages: Seq[String] = Seq("view", "click", "purchase"))
  : Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    require(stages.size == 3, s"exactly 3 stages: $stages")
    val Seq(t1, t2, t3) = stages
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          batch.toSeq.sortBy(e => (e.tsMs, e.event_type)).foreach { e =>
            if (e.event_type == t1 && s.s1.isEmpty)
              s = s.copy(s1 = Some(e.tsMs))
            else if (e.event_type == t2 && s.s2.isEmpty &&
              s.s1.exists(e.tsMs > _))
              s = s.copy(s2 = Some(e.tsMs))
            else if (e.event_type == t3 && s.s3.isEmpty &&
              s.s2.exists(e.tsMs > _))
              s = s.copy(s3 = Some(e.tsMs))
          }
          state.update(s)
          Iterator(FunnelSnapshot(uid,
            Seq(s.s1, s.s2, s.s3).takeWhile(_.isDefined).size))
      }
  }

  case class Event(user_id: Long, value: Double)
  case class RunningState(n: Long, total: Double)
  case class RunningSnapshot(user_id: Long, n_events: Long, total_value: Double)

  /** Checkpointed incremental file ingest via `Trigger.AvailableNow`: each
    * invocation processes exactly the files that appeared in `srcDir` since
    * the last run, then stops — the batch-cadence form of a continuous
    * corpus pipeline. The checkpoint's file-source offset log is the ONLY
    * bookkeeping: no metastore diff, no manual high-water mark, and a
    * re-run after a crash resumes from the last committed batch instead of
    * re-ingesting (exactly-once into the parquet sink via its transaction
    * log). `input_file` carries provenance for downstream lineage audits.
    *
    * 100 TB shape: a day's new shards land in object storage; this runs on
    * a schedule, reads only the delta, and the transform between read and
    * write can be ANY stateless narrow pipeline (quality filters, scrub,
    * language ID — per-row ops compose here without changing the
    * incremental contract). `maxFilesPerTrigger` bounds a single
    * micro-batch so one run never bites off more than executor memory
    * chews; AvailableNow drains the backlog across as many batches as that
    * cap implies, unlike Trigger.Once which forced one giant batch.
    * Returns the number of input rows THIS run read (summed over its
    * micro-batches; 0 when no new files) — the direct evidence that a
    * second run touched only the delta, pinned by StreamsSpec.
    */
  def ingestAvailableNow(spark: org.apache.spark.sql.SparkSession,
                         srcDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         outDir: String,
                         checkpointDir: String,
                         maxFilesPerTrigger: Int = 1000): Long = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .withColumn("input_file", input_file_name())
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }

  /** One micro-batch's upsert into a bucketed parquet snapshot — the
    * merge step of upsertSink, pure batch code so it is directly
    * spec-testable. Latest-writer-wins per key (max struct(ts, rest) — the
    * deterministic pick, same contract as q_stream_dedup_batch's min).
    *
    * Partition-scoped rewrite: the snapshot is partitioned by
    * bucket = pmod(xxhash64(key), buckets); a batch only reads and
    * dynamically overwrites the buckets ITS keys hash into, so merge cost
    * tracks the batch's key spread, never the snapshot size — the
    * pure-parquet form of row-level MERGE (a table format would narrow
    * the rewrite unit from partition to file; the pruning/overwrite
    * machinery here is the same the repo pins in DynamicPruningSpec and
    * the dynamic-overwrite pin). localCheckpoint breaks the plan's
    * lineage to the snapshot path before the overwrite — Spark refuses to
    * overwrite a path its plan still reads.
    */
  def upsertBatch(batch: DataFrame, key: String, tsCol: String,
                  snapshotDir: String, buckets: Int): Unit = {
    // NULL keys hash to a NULL bucket (__HIVE_DEFAULT_PARTITION__), which
    // the touched-bucket isin() read-back can never select — their
    // versions would accumulate without last-writer-wins collapsing.
    // A keyed CDC feed has no meaning for a null key, so reject loudly
    // rather than merge wrongly.
    require(batch.where(col(key).isNull).isEmpty,
      s"upsertBatch: null values in key column '$key' — keyed upserts " +
        "require non-null keys")
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val rest = batch.columns.filter(c => c != key && c != tsCol)
    val occ = struct((tsCol +: rest).map(col): _*)
    def latestPerKey(df: DataFrame): DataFrame =
      df.groupBy(col(key), col("bucket"))
        .agg(max(occ).as("occ"))
        .select(col(key) +: col("bucket") +:
          (tsCol +: rest).map(c => col(s"occ.$c").as(c)): _*)
    val bNew = latestPerKey(
      batch.withColumn("bucket", pmod(xxhash64(col(key)), lit(buckets))))
    val touched = bNew.select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    // "snapshot present" = it has bucket partitions, not just an (empty)
    // directory — a fresh temp dir or a dir holding only _SUCCESS markers
    // has nothing to merge and would fail schema inference. Resolved
    // through Hadoop's FileSystem so object-store / HDFS snapshot paths
    // are seen (a java.io.File check reads any non-local snapshot as
    // absent and would silently skip the merge-read).
    val hPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasSnapshot = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.startsWith("bucket="))
    val existing =
      if (hasSnapshot)
        Some(spark.read.parquet(snapshotDir)
          .where(col("bucket").isin(touched: _*))
          // partition-dir values are re-inferred as INT on read; the merge
          // union needs the original LONG
          .withColumn("bucket", col("bucket").cast("long"))
          .select(bNew.columns.map(col): _*))
      else None
    val merged = latestPerKey(
      existing.fold(bNew)(e => bNew.unionByName(e)))
      .localCheckpoint(true)
    // per-writer option, not a session-conf set/restore: mutating the
    // shared session's partitionOverwriteMode is a race against any
    // concurrent writer on the same session
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(snapshotDir)
  }

  /** Streaming keyed UPSERT sink via foreachBatch — the streaming
    * materialized-view / CDC-apply pattern: each micro-batch merges into
    * the keyed snapshot with upsertBatch. The checkpoint makes re-delivery
    * of a batch idempotent (last-writer-wins merge is idempotent by
    * construction), and downstream batch readers always see a complete
    * snapshot directory. State lives in the SNAPSHOT, not the state store
    * — restarts carry no rebuild cost.
    */
  def upsertSink(stream: DataFrame, key: String, tsCol: String,
                 snapshotDir: String, checkpointDir: String,
                 buckets: Int): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: DataFrame, _: Long) =>
        upsertBatch(b, key, tsCol, snapshotDir, buckets)
      }
      .start()

  /** Custom per-key state via flatMapGroupsWithState: running event count +
    * value total per user, emitted once per micro-batch per updated key.
    * State survives across micro-batches (and restarts, via checkpoint).
    */
  def runningTotals(events: Dataset[Event]): Dataset[RunningSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[RunningState]) =>
          val s0 = state.getOption.getOrElse(RunningState(0L, 0.0))
          var n = s0.n
          var total = s0.total
          batch.foreach { e => n += 1; total += e.value }
          state.update(RunningState(n, total))
          Iterator(RunningSnapshot(userId, n, total))
      }
  }

  /** Streaming IVF routing — the dense-vector member of the
    * continuous-ingest screen family (exact-membership bloom /
    * MinHash-LSH band screen / THIS): each arriving embedding
    * (vec_id, v) assigns to the primary and secondary probed cells of a
    * batch-trained IVF index via SimSearch's two-level two-probe assign
    * (same ArgmaxCos kernels, same tie-breaks — the batch twin
    * q_stream_ivf_route puts the identical math under the oracle gate).
    *
    * Scale contract: the centroid frame (cid, cv, is_coarse) is C rows
    * total and rides a driver-decoded broadcast index (r12 — see
    * assignTwoLevelAgainstStatic), so the routing is a stateless per-row
    * projection with no stream-static join at all — the IVF property
    * that the index a query must touch is nprobe/C of the corpus,
    * applied at INGEST: downstream exact verify scans only the routed
    * cells (the batch half of the production streaming-ANN pattern;
    * ingestScreenPipeline is that composition end to end). Vectors whose
    * probed cells are both empty surface with a null bucket — the
    * caller's novel path, exactly like the LSH screen's flagged=false.
    *
    * Output: (vec_id, bucket, bucket2) — bucket2 null when either probed
    * cell is empty.
    */
  /** The continuous-ingest screen family composed END TO END as one
    * streaming pipeline — the shape a production crawl-ingest runs:
    *
    *   dedup → exact-membership screen → IVF route → exact verify → upsert
    *
    * 1. `dedupStream` on doc_id: at-least-once transport replays die at
    *    the watermarked state store (never reaching the verify joins).
    * 2. `bloomTagStream` on text: a batch-built bitset flags arrivals
    *    whose exact text MIGHT already be in the corpus (no false
    *    negatives — unflagged rows skip the exact-text confirm join).
    * 3. IVF routing via the static two-level assign (built ONCE at stream
    *    setup — staticAssignColumn; applied per micro-batch as a
    *    stateless projection, so the route keeps every arrival column and
    *    needs no join-back).
    * 4. Exact verify, both families: flagged rows confirm against the
    *    corpus by text equality (bloom false positives survive); dense
    *    near-dups compare exact cosine ONLY against corpus members of the
    *    arrival's two probed cells (the IVF contract: nprobe/C of the
    *    index per arrival, never a full scan — a near-dup sitting across
    *    the Voronoi boundary is caught via bucket2).
    * 5. Novel rows (neither exact nor dense dup) merge into the keyed
    *    parquet snapshot via upsertBatch — last-writer-wins, idempotent
    *    under micro-batch re-delivery.
    *
    * Arrivals: (doc_id, ts, text, v). Corpus: (doc_id, text, v) — its
    * bloom, cell assignment, and normalized vectors are computed once at
    * setup and reused every micro-batch (localCheckpoint pins the
    * corpus-side frames so no batch re-runs their lineage).
    */
  def ingestScreenPipeline(arrivals: DataFrame, corpus: DataFrame,
      cents: DataFrame, mBits: Int, k: Int, cosThreshold: Double,
      snapshotDir: String, checkpointDir: String, buckets: Int,
      delay: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.queries.SimSearch
    import graft.llm.Vectors
    // batch-side index, built once: exact-text bloom, static assign
    // column, corpus members keyed by their primary cell
    val bits = graft.ops.Bloom.build(corpus, col("text"), mBits, k)
      .localCheckpoint(true)
    val assign = SimSearch.staticAssignColumn(cents)
    val corpusCells = corpus
      .select(col("doc_id").as("c_id"), col("text").as("c_text"),
        Vectors.normalize(col("v")).as("cvn"),
        assign(col("v")).getField("bucket").as("cell"))
      .where(col("cell").isNotNull)
      .localCheckpoint(true)
    val deduped = dedupStream(arrivals, Seq("doc_id"), delay)
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val tagged = bloomTagStream(b, bits, "text", mBits, k)
            .withColumn("a", assign(col("v")))
            .withColumn("vn", Vectors.normalize(col("v")))
          // exact-text confirm: only bloom-flagged rows pay the join
          val exactDup = tagged.where(col("flagged"))
            .join(corpusCells.select(col("c_text").as("text")),
              Seq("text"), "left_semi")
            .select(col("doc_id"))
          // dense verify: arrivals explode to their ≤2 probed cells and
          // meet only those cells' corpus members
          val denseDup = tagged
            .select(col("doc_id"), col("vn"),
              explode(array(col("a.bucket"), col("a.bucket2"))).as("cell"))
            .where(col("cell").isNotNull)
            .join(corpusCells.select(col("cell"), col("cvn")), Seq("cell"))
            .where(round(graft.llm.Vectors.dotFast(col("vn"), col("cvn")), 6)
              >= cosThreshold)
            .select(col("doc_id"))
          val novel = b.join(exactDup.union(denseDup).distinct(),
            Seq("doc_id"), "left_anti")
          upsertBatch(novel.select(col("doc_id"), col("ts"), col("text")),
            "doc_id", "ts", snapshotDir, buckets)
        }
      }
      .start()
  }

  def ivfRouteStream(stream: DataFrame, cents: DataFrame): DataFrame =
    // static assign (r12): the batch-trained index is collected/decoded
    // once at STREAM SETUP and rides a broadcast object — the routing
    // projection is now a stateless per-row expression with no
    // stream-static join at all (strictly fewer moving parts per
    // micro-batch; identical math, StreamsSpec's stream ≡ batch pin holds)
    graft.queries.SimSearch.assignTwoLevelAgainstStatic(stream, cents)
}
