package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** Streaming semantics through MemoryStream micro-batches: watermarked
  * window finalization and cross-batch state retention.
  */
class StreamsSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates tumbling windows per event_type") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"), delay = "10 minutes", win = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(7), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(5), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream keeps first occurrence per key across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val deduped = Streams.dedupStream(
      input.toDF().toDF("ts", "event_id", "value"), Seq("event_id"),
      delay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), "e1", 1.0), (ts(1), "e1", 9.0), (ts(2), "e2", 2.0))
      q.processAllAvailable()
      input.addData((ts(3), "e1", 7.0), (ts(4), "e3", 3.0)) // e1 again: state dedups
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .as[(Timestamp, String, Double)].collect()
      assert(rows.map(_._2).sorted.toSeq == Seq("e1", "e2", "e3"))
      assert(rows.find(_._2 == "e1").get._3 == 1.0) // the FIRST e1 won
    } finally q.stop()
  }

  test("sessionWindowCounts merges gap-bounded bursts and closes " +
    "sessions past the watermark") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Streams.sessionWindowCounts(
      input.toDF().toDF("user_id", "ts"), gap = "5 minutes", delay = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_native")
      .outputMode(OutputMode.Append).start()
    try {
      // burst 1: 10:01, 10:03 (one session); burst 2 at 10:20 (new — gap 17m)
      input.addData((7L, ts(1)), (7L, ts(3)), (7L, ts(20)))
      q.processAllAvailable()
      // advance the watermark far past both sessions' close so Append emits
      input.addData((9L, ts(59)))
      q.processAllAvailable()
      input.addData((9L, ts(59)))
      q.processAllAvailable()
      val rows = spark.table("sess_native")
        .as[(Timestamp, Long, Long)].collect().filter(_._2 == 7L)
        .map(r => (r._1, r._3)).sortBy(_._1.getTime)
      assert(rows.toSeq == Seq((ts(1), 2L), (ts(20), 1L)),
        s"expected two sessions (2 events, then 1), got ${rows.toSeq}")
    } finally q.stop()
  }

  test("correlateStreamsOuter emits unmatched left rows null-extended " +
    "once the watermark closes their window") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val inA = MemoryStream[(Long, Timestamp, Double)]
    val inB = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.correlateStreamsOuter(
      inA.toDF().toDF("user_id", "ts", "value"),
      inB.toDF().toDF("user_id", "ts", "value"),
      delay = "10 minutes", lookback = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("corr_outer")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 gets a match; user 2 never does
      inA.addData((1L, ts(10), 1.0), (2L, ts(10), 2.0))
      inB.addData((1L, ts(8), 9.0))
      q.processAllAvailable()
      // advance BOTH watermarks far past ts(10)+lookback so the state
      // store can prove user 2's window is closed; outer results emit in
      // the batch AFTER the watermark advances, hence the second nudge
      inA.addData((9L, ts(59), 0.0))
      inB.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      inA.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val rows = spark.table("corr_outer")
        .as[(Long, Timestamp, Double, Option[Long], Option[Timestamp], Option[Double])]
        .collect().filter(r => r._1 == 1L || r._1 == 2L)
      assert(rows.find(_._1 == 1L).get._6 == Some(9.0)) // matched pair
      assert(rows.find(_._1 == 2L).get._4.isEmpty) // unmatched, null-extended
    } finally q.stop()
  }

  test("enrichStream joins each micro-batch against the static dim; " +
    "unknown keys survive the left join") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val dim = Seq(("click", "interaction"), ("view", "impression"))
      .toDF("event_type", "category")
    val input = MemoryStream[(Timestamp, String)]
    val enriched = Streams.enrichStream(
      input.toDF().toDF("ts", "event_type"), dim, "event_type")
    val q = enriched.writeStream.format("memory").queryName("enrich_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), "click"), (ts(2), "purchase"))
      q.processAllAvailable()
      input.addData((ts(3), "view"))
      q.processAllAvailable()
      val rows = spark.table("enrich_stream")
        .as[(String, Timestamp, Option[String])].collect()
        .map(r => r._1 -> r._3).toMap
      assert(rows == Map(
        "click" -> Some("interaction"),
        "view" -> Some("impression"),
        "purchase" -> None)) // unknown key kept, not dropped
    } finally q.stop()
  }

  test("bloomTagStream flags reference members across micro-batches with " +
    "no false negatives; sketch rides the broadcast, no stream shuffle") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val mBits = 64 * 32
    val k = 3
    val refKeys = (0L until 50L).map(_ * 7)
    val bits = graft.ops.Bloom.build(
      refKeys.toDF("key"), org.apache.spark.sql.functions.col("key"), mBits, k)
    val input = MemoryStream[(Timestamp, Long)]
    val tagged = Streams.bloomTagStream(
      input.toDF().toDF("ts", "key"), bits, "key", mBits, k)
    val q = tagged.writeStream.format("memory").queryName("bloom_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 0L), (ts(2), 7L), (ts(3), 1000003L))
      q.processAllAvailable()
      input.addData((ts(4), 343L), (ts(5), 2000003L)) // member + non-member
      q.processAllAvailable()
      val rows = spark.table("bloom_stream")
        .as[(Timestamp, Long, Boolean)].collect()
        .map(r => r._2 -> r._3).toMap
      // members MUST flag (bloom contract: no false negatives)
      assert(rows(0L) && rows(7L) && rows(343L), rows)
      // the two non-members: at 2048 bits / 150 set positions the fpp is
      // ~0.03% — a deterministic fixture, so this is a fixed outcome, not
      // a flaky sample
      assert(!rows(1000003L) && !rows(2000003L), rows)
    } finally q.stop()
  }

  test("lshNearDupTagStream flags near-dups of the indexed corpus, passes novel docs, " +
    "and tags shingle-less docs (0, false)") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val seeds = 0 until 8
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words appear in this one right here")
    ).toDF("doc_id", "text")
    val sigs = graft.llm.Dedup.minhashSigs(corpus, "doc_id", "text", 3, seeds)
    val bits = graft.llm.Dedup.lshBandBloom(sigs, "doc_id",
      bands = 4, rowsPerBand = 2, mBits = 2048, k = 3)
    val input = MemoryStream[(Long, String)]
    val tagged = Streams.lshNearDupTagStream(
      input.toDF().toDF("doc_id", "text"), bits,
      "text", 3, seeds, bands = 4, rowsPerBand = 2, mBits = 2048, k = 3)
    val q = tagged.writeStream.format("memory").queryName("lsh_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog today"),   // exact dup
        (11L, "zebras graze quietly beside the wide muddy river bank")) // novel
      q.processAllAvailable()
      input.addData((12L, "too short")) // < 3 tokens: no shingles
      q.processAllAvailable()
      val rows = spark.table("lsh_stream")
        .select("doc_id", "n_hit_bands", "flagged")
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows(10L)._2 && rows(10L)._1 == 4L, rows) // dup: every band hits
      assert(!rows(11L)._2, rows)                      // novel doc passes
      assert(rows(12L) == ((0L, false)), rows)         // shingle-less: explicit 0
    } finally q.stop()
  }

  test("correlateStreams pairs same-user events within the lookback window only") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp, Double)]
    val b = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.correlateStreams(
      a.toDF().toDF("user_id", "ts", "value"),
      b.toDF().toDF("user_id", "ts", "value"),
      delay = "10 minutes", lookback = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("corr_stream")
      .outputMode(OutputMode.Append).start()
    try {
      b.addData((1L, ts(1), 10.0), (1L, ts(20), 20.0), (2L, ts(2), 30.0))
      a.addData((1L, ts(4), 1.0), (1L, ts(22), 2.0), (3L, ts(4), 3.0))
      q.processAllAvailable()
      val rows = spark.table("corr_stream")
        .select("value", "b_value").as[(Double, Double)].collect().toSet
      // a@4 pairs b@1 (3 min back); a@22 pairs b@20 (2 min back) but NOT
      // b@1 (21 min back, outside lookback); user 3 has no b events
      assert(rows == Set((1.0, 10.0), (2.0, 20.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on event-time gap and emits each exactly once") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Streams.SessionEvent]
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // session A: two events 3 min apart for user 1
      input.addData(Streams.SessionEvent(1L, ts(1)), Streams.SessionEvent(1L, ts(4)))
      q.processAllAvailable()
      // 2h later: new events advance the watermark past A's gap -> A times
      // out and emits; this also OPENS session B for user 1
      input.addData(Streams.SessionEvent(1L, Timestamp.valueOf("2026-01-01 12:00:00")),
        Streams.SessionEvent(2L, Timestamp.valueOf("2026-01-01 12:05:00")))
      q.processAllAvailable()
      // advance the watermark far past user 1's 12:30 timeout so the
      // hasTimedOut branch (emit + state eviction) actually fires for
      // session B — without this the supersession branch is the only one
      // ever exercised
      input.addData(Streams.SessionEvent(2L, Timestamp.valueOf("2026-01-01 15:00:00")))
      q.processAllAvailable()
      input.addData(Streams.SessionEvent(2L, Timestamp.valueOf("2026-01-01 18:00:00")))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .as[Streams.Session].collect().map(r => (r.user_id, r.n_events, r.duration_ms))
      // session A (2 events, 3 min): closed by SUPERSESSION, exactly once
      assert(out.count(_ == ((1L, 2L, 180000L))) == 1, out.toSeq)
      // session B (single 12:00 event): closed by TIMEOUT, exactly once
      assert(out.count(_ == ((1L, 1L, 0L))) == 1, out.toSeq)
    } finally q.stop()
  }

  test("sessionize extends the session START for accepted out-of-order events") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Streams.SessionEvent]
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      // user 2's 10:25 event holds the watermark at 09:55, so user 1's
      // LATER-arriving 09:56 event is still accepted next batch
      input.addData(Streams.SessionEvent(1L, ts(0)), // 10:00
        Streams.SessionEvent(2L, ts(25)))            // 10:25
      q.processAllAvailable()
      input.addData(Streams.SessionEvent(1L, Timestamp.valueOf("2026-01-01 09:56:00")))
      q.processAllAvailable()
      // supersede user 1's session far in the future, then push the
      // watermark so it emits
      input.addData(Streams.SessionEvent(1L, Timestamp.valueOf("2026-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData(Streams.SessionEvent(2L, Timestamp.valueOf("2026-01-01 16:00:00")))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo")
        .as[Streams.Session].collect().map(r => (r.user_id, r.n_events, r.duration_ms))
      // 09:56 must extend the session BACKWARD: duration 09:56->10:00 = 4 min
      assert(out.count(_ == ((1L, 2L, 240000L))) == 1, out.toSeq)
    } finally q.stop()
  }

  test("session fold closes an event preceding the carried span by more than the gap") {
    val gap = 30 * 60000L
    val carried = Some(Streams.SessionState(10L * gap, 10L * gap + 60000L, 2))
    // one event 3 gaps before the carried start (watermark held by a min
    // multi-watermark policy), one in-gap extension after the span
    val (closed, cur) = Streams.foldGapSessions(
      7L, carried, Seq(7L * gap, 10L * gap + 2 * 60000L), gap)
    // the early event is its OWN zero-length session, emitted first —
    // never glued to a span it precedes by more than the gap
    assert(closed == Seq(Streams.Session(7L, 1, 0L)))
    // the carried span keeps its start and extends its end by the in-gap event
    assert(cur.contains(Streams.SessionState(10L * gap, 10L * gap + 2 * 60000L, 3)))
  }

  test("session fold merges an in-gap pre-start event backward into the span") {
    val gap = 30 * 60000L
    val carried = Some(Streams.SessionState(1000L * 60000L, 1001L * 60000L, 2))
    val (closed, cur) = Streams.foldGapSessions(
      1L, carried, Seq(999L * 60000L), gap)
    assert(closed.isEmpty)
    assert(cur.contains(Streams.SessionState(999L * 60000L, 1001L * 60000L, 3)))
  }

  test("upsertSink merges each micro-batch into the keyed snapshot: " +
    "last writer wins, untouched buckets keep their files") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val snapDir = Files.createTempDirectory("graft-upsert-snap").toString
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.upsertSink(
      input.toDF().toDF("k", "ts", "v"), "k", "ts", snapDir, ckpt, buckets = 8)
    try {
      input.addData((1L, ts(1), "a"), (2L, ts(1), "b"), (3L, ts(1), "c"))
      q.processAllAvailable()
      def snap(): Map[Long, String] = spark.read.parquet(snapDir)
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(snap() == Map(1L -> "a", 2L -> "b", 3L -> "c"))
      // which bucket dirs hold which keys, and their current files
      def filesByBucket(): Map[String, Set[String]] =
        new java.io.File(snapDir).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
          .toMap
      val before = filesByBucket()
      // batch 2: update key 1 (newer ts), leave 2 and 3 untouched; the
      // stale (ts 1) re-delivery of key 2 must LOSE to the snapshot row
      input.addData((1L, ts(5), "a2"))
      q.processAllAvailable()
      assert(snap() == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
      val after = filesByBucket()
      import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
      val k1Bucket = spark.range(1).select(
        pmod(xxhash64(lit(1L)), lit(8)).cast("string")).as[String].head()
      // the partition-scoped rewrite: only key 1's bucket got new files
      after.foreach { case (b, files) =>
        if (b == s"bucket=$k1Bucket") assert(files != before(b), s"$b not rewritten")
        else assert(files == before(b), s"$b was rewritten needlessly")
      }
      // out-of-order late row for key 1 loses to the ts-5 snapshot row
      input.addData((1L, ts(3), "stale"))
      q.processAllAvailable()
      assert(snap()(1L) == "a2")
      // checkpoint-replay idempotence: re-applying an already-merged batch
      // directly leaves the snapshot byte-identical (last-writer-wins is
      // idempotent by construction — what makes foreachBatch's at-least-
      // once delivery exactly-once in effect)
      val beforeReplay = spark.read.parquet(snapDir)
        .select("k", "ts", "v").as[(Long, Timestamp, String)].collect().toSet
      Streams.upsertBatch(
        Seq((1L, ts(5), "a2")).toDF("k", "ts", "v"), "k", "ts", snapDir, 8)
      val afterReplay = spark.read.parquet(snapDir)
        .select("k", "ts", "v").as[(Long, Timestamp, String)].collect().toSet
      assert(afterReplay == beforeReplay)
    } finally q.stop()
  }

  test("CDC pipeline end to end: dedupStream feeds upsertSink — replayed " +
    "events die at the dedup, updates land in the snapshot") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val snapDir = Files.createTempDirectory("graft-cdc-snap").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    // stage 1: watermarked exact dedup on (k, change_id) — at-least-once
    // transport re-delivers; the dedup makes the CDC log effectively-once
    val deduped = Streams.dedupStream(
      input.toDF().toDF("k", "ts", "change_id", "v"),
      Seq("k", "change_id"), delay = "10 minutes")
    // stage 2: last-writer-wins merge into the keyed snapshot
    val q = Streams.upsertSink(deduped, "k", "ts", snapDir, ckpt, buckets = 4)
    try {
      input.addData((1L, ts(1), 100L, "a"), (2L, ts(1), 101L, "b"))
      q.processAllAvailable()
      // transport replays change 100 VERBATIM and sends a real update 102
      input.addData((1L, ts(1), 100L, "a"), (1L, ts(4), 102L, "a2"))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapDir)
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(snap == Map(1L -> "a2", 2L -> "b"))
      // the replayed row was dropped at stage 1, not merged again: the
      // change_id dedup state says one row per (k, change_id)
      val nVersions = spark.read.parquet(snapDir).count()
      assert(nVersions == 2)
    } finally q.stop()
  }

  test("file-source stream resumes flatMapGroupsWithState state from the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    val inputDir = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Streams.RunningSnapshot]

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, value DOUBLE")
        .json(inputDir)
        .as[Streams.Event]
      val q = Streams.runningTotals(stream).writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streams.RunningSnapshot], _: Long) =>
          snapshots.synchronized { snapshots ++= ds.collect() }; ()
        }
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Files.writeString(java.nio.file.Path.of(inputDir, "b1.json"),
      """{"user_id":1,"value":2.0}
        |{"user_id":1,"value":3.0}""".stripMargin)
    runOnce() // first process: user 1 -> (2 events, 5.0)
    Files.writeString(java.nio.file.Path.of(inputDir, "b2.json"),
      """{"user_id":1,"value":5.0}""")
    runOnce() // restart: state must come back from the checkpoint

    val last = snapshots.synchronized { snapshots.filter(_.user_id == 1L).maxBy(_.n_events) }
    assert(last == Streams.RunningSnapshot(1L, 3L, 10.0))
  }

  test("runningTotals keeps per-user state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Streams.Event(1L, 2.0), Streams.Event(1L, 3.0), Streams.Event(2L, 10.0))
      q.processAllAvailable()
      input.addData(Streams.Event(1L, 5.0)) // second micro-batch: state must carry
      q.processAllAvailable()
      val latest = spark.table("running_totals")
        .as[Streams.RunningSnapshot].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
      assert(latest(1L) == Streams.RunningSnapshot(1L, 3L, 10.0))
      assert(latest(2L) == Streams.RunningSnapshot(2L, 1L, 10.0))
    } finally q.stop()
  }

  test("funnelStages advances per-user stages across micro-batches, " +
    "strictly-after only") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Streams.FunnelEvent]
    val q = Streams.funnelStages(input.toDS())
      .writeStream.format("memory").queryName("funnel_stages")
      .outputMode(OutputMode.Update).start()
    try {
      // user 1: view then a SAME-ts click (must NOT count: strictly after)
      // user 2: click with no preceding view (must NOT count)
      input.addData(
        Streams.FunnelEvent(1L, "view", 100L),
        Streams.FunnelEvent(1L, "click", 100L),
        Streams.FunnelEvent(2L, "click", 50L))
      q.processAllAvailable()
      // batch 2: user 1 completes; user 2's view opens stage 1 only
      // (its earlier click is gone — cross-batch order is the contract)
      input.addData(
        Streams.FunnelEvent(1L, "click", 200L),
        Streams.FunnelEvent(1L, "purchase", 300L),
        Streams.FunnelEvent(2L, "view", 60L))
      q.processAllAvailable()
      val latest = spark.table("funnel_stages")
        .as[Streams.FunnelSnapshot].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.map(_.stage).max }
      assert(latest(1L) == 3, latest)
      assert(latest(2L) == 1, latest)
    } finally q.stop()
  }

  test("funnelStages sorts within a micro-batch: disorder inside one " +
    "batch matches the batch min-chain") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Streams.FunnelEvent]
    val q = Streams.funnelStages(input.toDS())
      .writeStream.format("memory").queryName("funnel_disorder")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Streams.FunnelEvent(7L, "purchase", 30L),
        Streams.FunnelEvent(7L, "click", 20L),
        Streams.FunnelEvent(7L, "view", 10L))
      q.processAllAvailable()
      val stage = spark.table("funnel_disorder")
        .as[Streams.FunnelSnapshot].collect().map(_.stage).max
      assert(stage == 3)
    } finally q.stop()
  }

  test("ingestAvailableNow processes only the file delta on re-run and " +
    "survives a no-op run") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val schema = Seq((1L, "a")).toDF("id", "txt").schema

    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "txt")
      .coalesce(1).write.mode("append").parquet(src)
    val run1 = Streams.ingestAvailableNow(spark, src, schema, out, ckpt)
    assert(run1 == 2L, s"run 1 should read both seed rows, got $run1")
    assert(spark.read.parquet(out).count() == 2L)

    // new file lands; the checkpointed offsets mean run 2 reads ONLY it
    Seq((3L, "gamma")).toDF("id", "txt")
      .coalesce(1).write.mode("append").parquet(src)
    val run2 = Streams.ingestAvailableNow(spark, src, schema, out, ckpt)
    assert(run2 == 1L, s"run 2 should read only the delta, got $run2")
    val all = spark.read.parquet(out)
    assert(all.count() == 3L, "sink holds the union with no re-ingest dups")
    assert(all.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // provenance column names the source shard for every row
    assert(all.where($"input_file".contains("/src/")).count() == 3L)

    // nothing new: a third run commits no input rows and adds nothing
    val run3 = Streams.ingestAvailableNow(spark, src, schema, out, ckpt)
    assert(run3 == 0L, s"no-op run should read 0 rows, got $run3")
    assert(spark.read.parquet(out).count() == 3L)
  }

  test("upsertBatch rejects null keys loudly") {
    // a null key hashes to the __HIVE_DEFAULT_PARTITION__ bucket, which
    // the touched-bucket read-back can never select — versions would
    // accumulate without collapsing; the contract is fail-fast
    val s = spark
    import s.implicits._
    val snapDir =
      java.nio.file.Files.createTempDirectory("graft-nullkey").toString
    val bad = Seq((Some(1L), ts(1), "a"), (None, ts(2), "b"))
      .toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      Streams.upsertBatch(bad, "k", "ts", snapDir, 4)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("lshNearDupTagStream rejects a seed family that mismatches the " +
    "band layout") {
    // band keys index signature columns positionally; a non-contiguous
    // seed family would probe the wrong columns — the require catches it
    // before any plan is built
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val sigs = graft.llm.Dedup.minhashSigs(docs, "doc_id", "text", 3, 0 until 8)
    val bits = graft.llm.Dedup.lshBandBloom(sigs, "doc_id",
      bands = 4, rowsPerBand = 2, mBits = 1024, k = 3)
    val e = intercept[IllegalArgumentException] {
      Streams.lshNearDupTagStream(docs, bits, "text", 3,
        seeds = Seq(1, 3, 5, 7, 9, 11, 13, 15), bands = 4, rowsPerBand = 2,
        mBits = 1024, k = 3)
    }
    assert(e.getMessage.contains("seeds"), e.getMessage)
  }

  test("ingest screens compose end to end: dedup → bloom screen → IVF " +
    "route → exact verify (incl. a boundary vector's SECONDARY cell) → " +
    "upsert of novel docs only") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val snapDir = Files.createTempDirectory("graft-ingest-snap").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    // same IVF geometry as the route test: +x / +y coarse cells, one
    // extra fine centroid each; fine cells: {10,11} under 10, {20,21}
    // under 20
    val cents = Seq(
      (10L, Array(1.0, 0.0), true),
      (20L, Array(0.0, 1.0), true),
      (11L, Array(0.9, 0.3), false),
      (21L, Array(0.3, 0.9), false)
    ).toDF("cid", "cv", "is_coarse")
    // corpus member 3 lands in cell 11 (cos .9487 vs fine 11); docs 1/2
    // sit deep in cells 10 / 20
    val corpus = Seq(
      (1L, "alpha beta gamma", Array(1.0, 0.05)),
      (2L, "hello world foo", Array(0.05, 1.0)),
      (3L, "boundary family seed", Array(0.8, 0.6))
    ).toDF("doc_id", "text", "v")
    val input = MemoryStream[(Long, Timestamp, String, Array[Double])]
    val q = Streams.ingestScreenPipeline(
      input.toDF().toDF("doc_id", "ts", "text", "v"),
      corpus, cents, mBits = 1024, k = 3, cosThreshold = 0.9,
      snapDir, ckpt, buckets = 2)
    try {
      // batch 1: a genuinely novel doc + an exact-text dup of corpus doc 1
      input.addData(
        (100L, ts(1), "totally new thing", Array(-1.0, 0.05)),
        (101L, ts(1), "alpha beta gamma", Array(0.5, -0.5)))
      q.processAllAvailable()
      // batch 2: transport REPLAYS doc 100 with a mutated payload (must
      // die at the dedup — the snapshot keeps the original text); a
      // boundary arrival whose near-dup (corpus doc 3, cosine 0.96) sits
      // in its SECONDARY cell (primary 21 holds no corpus member); and a
      // second novel doc
      input.addData(
        (100L, ts(5), "mutated replay", Array(-1.0, 0.05)),
        (102L, ts(5), "unrelated text entirely", Array(0.6, 0.8)),
        (103L, ts(5), "another new doc", Array(0.0, -1.0)))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapDir)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(snap == Map(
        100L -> "totally new thing",
        103L -> "another new doc"),
        s"snapshot was $snap")
    } finally q.stop()
  }

  test("continuous ingest composes with the persisted kNN store: the " +
    "pipeline's novel docs fold into the graph incrementally ≡ rebuild") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val snapDir = Files.createTempDirectory("graft-ingest2-snap").toString
    val ckpt = Files.createTempDirectory("graft-ingest2-ckpt").toString
    val cents = Seq(
      (10L, Array(1.0, 0.0), true),
      (20L, Array(0.0, 1.0), true),
      (11L, Array(0.9, 0.3), false),
      (21L, Array(0.3, 0.9), false)
    ).toDF("cid", "cv", "is_coarse")
    val corpus = Seq(
      (1L, "alpha beta gamma", Array(1.0, 0.05)),
      (2L, "hello world foo", Array(0.05, 1.0)),
      (3L, "boundary family seed", Array(0.8, 0.6))
    ).toDF("doc_id", "text", "v")
    val arrivalRows = Seq(
      (100L, ts(1), "totally new thing", Array(-1.0, 0.05)),
      (101L, ts(1), "alpha beta gamma", Array(0.5, -0.5)), // exact dup, dies
      (102L, ts(1), "unrelated text entirely", Array(0.6, 0.8)), // dense dup
      (103L, ts(1), "another new doc", Array(0.0, -1.0)))
    val input = MemoryStream[(Long, Timestamp, String, Array[Double])]
    val q = Streams.ingestScreenPipeline(
      input.toDF().toDF("doc_id", "ts", "text", "v"),
      corpus, cents, mBits = 1024, k = 3, cosThreshold = 0.9,
      snapDir, ckpt, buckets = 2)
    try {
      input.addData(arrivalRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the stream's verdict: novel ids land in the snapshot; their vectors
    // come from the arrival batch (the snapshot stores the doc payload)
    val novelIds = spark.read.parquet(snapDir).select(col("doc_id"))
    val novelVecs = arrivalRows.toDF("vec_id", "ts", "text", "v")
      .join(novelIds.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"))
      .select(col("vec_id"), col("v"))
    assert(novelVecs.count() == 2) // 100 and 103 survive the screens
    // fold them into a store built on the corpus; must equal the rebuild
    val incRoot = Files.createTempDirectory("graft-ingest2-inc").toString
    val fullRoot = Files.createTempDirectory("graft-ingest2-full").toString
    val corpusVecs = corpus.select(col("doc_id").as("vec_id"), col("v"))
    graft.queries.KnnStore.build(spark, corpusVecs, cents, incRoot, 2)
    graft.queries.KnnStore.addArrivals(spark, novelVecs, cents, incRoot, 2)
    graft.queries.KnnStore.build(spark,
      corpusVecs.union(novelVecs), cents, fullRoot, 2)
    def edges(root: String) =
      graft.queries.KnnStore.readGraph(spark, root)
        .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(edges(incRoot) == edges(fullRoot))
    assert(edges(incRoot).nonEmpty)
  }

  test("ivfRouteStream routes arriving vectors to the same probed cells " +
    "as the batch assign, stateless across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    // 2 coarse cells along +x / +y; one extra fine centroid per cell
    val cents = Seq(
      (10L, Array(1.0, 0.0), true),
      (20L, Array(0.0, 1.0), true),
      (11L, Array(0.9, 0.3), false),
      (21L, Array(0.3, 0.9), false)
    ).toDF("cid", "cv", "is_coarse")
    val vecs = Seq(
      (1L, Array(0.95, 0.1)),  // deep in the x cell
      (2L, Array(0.1, 0.95)),  // deep in the y cell
      (3L, Array(0.7, 0.7))    // boundary — probe-2 matters
    )
    val input = MemoryStream[(Long, Array[Double])]
    val routed = Streams.ivfRouteStream(
      input.toDF().toDF("vec_id", "v"), cents)
    val q = routed.writeStream.format("memory").queryName("ivf_route")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(vecs.take(2): _*)
      q.processAllAvailable()
      input.addData(vecs.drop(2): _*) // second micro-batch: no state carried
      q.processAllAvailable()
      val got = spark.table("ivf_route")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      val want = graft.queries.SimSearch
        .assignTwoLevelAgainst(vecs.toDF("vec_id", "v"), cents)
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got == want, s"stream $got != batch $want")
      assert(got.size == 3 && got.forall(_._2.nonEmpty))
      // the boundary vector carries a secondary cell for probe-2 verify
      assert(got.find(_._1 == 3L).get._3.nonEmpty)
    } finally q.stop()
  }
}
