package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Core
import graft.llm.Multimodal

/** Multimodal-column queries: binary payloads + typed metadata through the
  * Dataset stages in graft.llm.Multimodal. Payloads are UTF-8 document text
  * standing in for real media bytes (see Multimodal scaladoc — the decode is
  * a deterministic stub, the plumbing is real), which is what lets DuckDB
  * oracle-check the whole path.
  */
object Media {
  import Core.table

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Typed mapPartitions decode: media_id/kind/bytes -> full metadata row.
    "q_media_decode" -> ((s, d) =>
      Multimodal.decode(Multimodal.mediaFromDocuments(s, table(s, d, "documents")))
        .toDF()),

    // Generator fan-out: one row per 256-byte frame.
    "q_media_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, table(s, d, "documents")))
        .toDF()),

    // Resize stage: target dims + area-ratio size estimate (stub codec,
    // real mapPartitions plumbing), checksum carried through.
    "q_media_resize" -> ((s, d) =>
      Multimodal.resize(
        Multimodal.mediaFromDocuments(s, table(s, d, "documents")), 128, 128)
        .toDF()),

    // Cross-media frame-level dedup — the reused-clip/still detector:
    // hash every 256-byte frame (stub granularity, same frame walk as
    // q_media_frames), then the canonical hash-groupBy. Only
    // (frame_md5, media_id) pairs shuffle — payload bytes never leave
    // the scan. With a real codec the md5 runs on decoded frame pixels
    // inside the same mapPartitions boundary; the dedup plan is
    // unchanged.
    "q_media_frame_dedup" -> ((s, d) => {
      val nFrames =
        expr("(octet_length(encode(text, 'UTF-8')) + 255) div 256").cast("int")
      table(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          explode(transform(sequence(lit(0), nFrames - 1),
            i => md5(col("text").substr(i * 256 + 1, lit(256))))).as("frame_md5"))
        .groupBy(col("frame_md5"))
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"), min(col("media_id")).as("first_media"))
        .where(col("n_media") >= 2)
    }),

    // REAL codec on the record (javax.imageio): per-doc deterministic
    // solid-RGB image → PNG encode → PNG decode, all inside the partition
    // loop. Output dims + the decoded (0,0) pixel are pure functions of
    // the doc row, so DuckDB hash-checks a genuine encoder/decoder pass —
    // the one media stage the text-payload fixtures can't exercise.
    "q_media_codec_roundtrip" -> ((s, d) => {
      import s.implicits._
      val specs = Core.spread(table(s, d, "documents")).select(
        col("doc_id").as("media_id"),
        (lit(16) + col("doc_id") % 16).cast("int").as("width"),
        (lit(16) + col("n_chars") % 16).cast("int").as("height"),
        // doc_id reduced mod 2^24 BEFORE the Knuth multiply: (a·b) mod m
        // ≡ ((a mod m)·b) mod m, so the value is identical everywhere the
        // unreduced form didn't overflow — and the unreduced form DID
        // overflow under ANSI at 1000× (ScaleUp doc_ids reach 10^14;
        // 10^14 · 2654435761 ≫ 2^63 — caught by the r12 sf100 run)
        (((col("doc_id") % lit(16777216L)) * lit(2654435761L)) % lit(16777216L))
          .cast("int").as("rgb")
      ).as[Multimodal.ImageSpec]
      Multimodal.pngRoundTrip(specs).toDF()
        .select(col("media_id"), col("width"), col("height"), col("rgb0"))
    }),

    // REAL audio codec on the record (javax.sound.sampled): per-doc
    // deterministic PCM16 buffer → WAV encode → WAV decode, all inside
    // the partition loop — the audio twin of q_media_codec_roundtrip.
    // Decoded sample count, header sample rate, and the first/last
    // samples are pure functions of the doc row (PCM16-in-WAV is
    // lossless), so DuckDB hash-checks a genuine audio encoder/decoder.
    // NOT spread (r15 opt A/B, Probe mediaspread): WAV synth is ~µs/row —
    // header + PCM16 buffer, no pixel loops — so the §2.5 "per-row
    // compute ≫ row width" test FAILS here; the spread arm measured
    // 2.5× SLOWER (raw 0.56-0.65 s vs spread 1.4-1.8 s, same JVM,
    // alternating ×3) where the png/gif/resize codecs' spread won.
    "q_media_wav_roundtrip" -> ((s, d) => {
      import s.implicits._
      val specs = table(s, d, "documents").select(
        col("doc_id").as("media_id"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("sample_rate"),
        (lit(64) + col("n_chars") % 192).cast("int").as("n_samples")
      ).as[Multimodal.AudioSpec]
      Multimodal.wavRoundTrip(specs).toDF()
    }),

    // Real DSP features from DECODED audio (Multimodal.wavFeatures): the
    // same PCM16→WAV→decode pass as the roundtrip, then zero crossings /
    // Σ|s| / max|s| computed from the decoded samples — all-integer, so
    // the oracle's arithmetic replication pins codec losslessness AND the
    // feature extraction together (the audio analogue of the decoded-
    // pixel phash).
    // NOT spread — same measured verdict as q_media_wav_roundtrip (raw
    // 0.47-0.56 s vs spread 1.25-1.38 s; the DSP fold is integer sums
    // over ≤255 samples, still ~µs/row).
    "q_media_wav_features" -> ((s, d) => {
      import s.implicits._
      val specs = table(s, d, "documents").select(
        col("doc_id").as("media_id"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("sample_rate"),
        (lit(64) + col("n_chars") % 192).cast("int").as("n_samples")
      ).as[Multimodal.AudioSpec]
      Multimodal.wavFeatures(specs).toDF()
    }),

    // REAL multi-frame container on the record (animated GIF through
    // javax.imageio): per-doc deterministic frame sequence → one GIF byte
    // stream → frame-by-frame decode, all inside the partition loop — the
    // "video" codec twin of q_media_codec_roundtrip/q_media_wav_roundtrip.
    // Every decoded frame's dims and (0,0) pixel are pure functions of
    // (doc row, frame_no), so DuckDB hash-checks genuine container
    // encode + frame extraction.
    "q_media_gif_frames" -> ((s, d) => {
      import s.implicits._
      val specs = Core.spread(table(s, d, "documents")).select(
        col("doc_id").as("media_id"),
        (lit(2) + col("doc_id") % 6).cast("int").as("width"),
        (lit(2) + col("n_chars") % 4).cast("int").as("height"),
        (lit(2) + col("doc_id") % 3).cast("int").as("n_frames")
      ).as[Multimodal.VideoSpec]
      Multimodal.gifFramesRoundTrip(specs).toDF()
    }),

    // Image near-dup detection END TO END through a real codec: per-doc
    // 8×8 black/white pattern (md5-derived per 8-doc family, one pixel
    // flipped per member) → REAL PNG encode + decode
    // (Multimodal.phashRoundTrip) → 60-bit fingerprint recomputed from
    // the DECODED pixels → the SAME pigeonhole Hamming join the text
    // family uses (Dedup.simhashHammingPairs, 4×15-bit blocks, dist ≤ 3).
    // Family members differ in ≤ 2 pixels (their two flips) and pair up;
    // cross-family patterns differ by ~30 bits and never do. The oracle
    // recomputes the fingerprint arithmetically — equality pins both the
    // codec's losslessness pixel-for-pixel AND the join.
    "q_media_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val specs = Core.spread(table(s, d, "documents")).select(
        col("doc_id").as("media_id"),
        graft.ops.Core.md5Hash64(
          expr("(doc_id div 8)").cast("string")).as("pat"),
        ((col("doc_id") % 8) * 7 % 60).cast("int").as("flip_pos")
      ).as[Multimodal.PhashSpec]
      val ph = Multimodal.phashRoundTrip(specs).toDF()
        .select(col("media_id").as("doc_id"), col("phash").as("sim"))
      graft.llm.Dedup.simhashHammingPairs(ph, "doc_id",
        blocks = 4, blockBits = 15, maxDist = 3)
    }),

    // REAL pixel-space resize through the codec — the stub-resize upgrade:
    // per-doc 60-bit pattern → 8×8 PNG encode+decode → NN upscale ×3 from
    // the decoded pixels → re-encode+decode → white-pixel count of the
    // decoded 24×24 image + box-filter downscale back to the fingerprint.
    // PNG losslessness + exact NN block replication make both outputs
    // pure arithmetic of the spec (n_white_up = popcount·9, recovered_fp
    // = pattern), so the oracle pins two codec passes AND the resampling
    // kernel in one hash row.
    "q_media_resize_codec" -> ((s, d) => {
      import s.implicits._
      val specs = Core.spread(table(s, d, "documents")).select(
        col("doc_id").as("media_id"),
        graft.ops.Core.md5Hash64(col("doc_id").cast("string")).as("pat"),
        ((col("doc_id") * 7) % 60).cast("int").as("flip_pos")
      ).as[Multimodal.PhashSpec]
      Multimodal.resizeRoundTrip(specs, k = 3).toDF()
    }),

    // Hash-derived feature vector (stub embedding), exploded to columns.
    "q_media_features" -> ((s, d) => {
      val f = Multimodal.features(encode(col("text"), "UTF-8"), 4)
      table(s, d, "documents").select(
        col("doc_id").as("media_id") +:
          (0 until 4).map(i => round(f.getItem(i), 6).as(s"f$i")): _*)
    })
  )

  private def h(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q_media_decode" ->
      s"""SELECT doc_id AS media_id, 'image' AS kind,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(64 + ascii(substr(text, 1, 1)) % 64 AS INTEGER) AS width,
         |  CAST(64 + ascii(substr(text, 2, 1)) % 64 AS INTEGER) AS height,
         |  ${h("text")} AS checksum
         |FROM documents""".stripMargin,

    "q_media_frames" ->
      """SELECT media_id, frame_no, CAST(frame_no * 256 AS BIGINT) AS byte_offset
        |FROM (
        |  SELECT doc_id AS media_id,
        |    CAST(unnest(generate_series(0, CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) - 1)) AS INTEGER) AS frame_no
        |  FROM documents)""".stripMargin,

    "q_media_resize" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(128 AS INTEGER) AS width, CAST(128 AS INTEGER) AS height,
         |  CAST(octet_length(encode(text)) * 16384
         |    // ((64 + ascii(substr(text, 1, 1)) % 64)
         |       * (64 + ascii(substr(text, 2, 1)) % 64)) AS BIGINT) AS est_bytes,
         |  ${h("text")} AS checksum
         |FROM documents""".stripMargin,

    "q_media_frame_dedup" ->
      """SELECT frame_md5, count(DISTINCT media_id) AS n_media,
        |  count(*) AS n_frames, min(media_id) AS first_media
        |FROM (
        |  SELECT doc_id AS media_id, unnest(list_transform(
        |    generate_series(0, CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) - 1),
        |    i -> md5(text[(i*256 + 1):(i*256 + 256)]))) AS frame_md5
        |  FROM documents)
        |GROUP BY 1 HAVING count(DISTINCT media_id) >= 2""".stripMargin,

    "q_media_codec_roundtrip" ->
      """SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(16 + n_chars % 16 AS INTEGER) AS height,
        |  CAST(((doc_id % 16777216) * 2654435761) % 16777216 AS BIGINT) AS rgb0
        |FROM documents""".stripMargin,

    "q_media_wav_roundtrip" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |  CAST(64 + n_chars % 192 AS INTEGER) AS n_samples,
        |  CAST((doc_id * 31) % 65536 - 32768 AS BIGINT) AS s0,
        |  CAST((doc_id * 31 + (64 + n_chars % 192 - 1) * 17) % 65536 - 32768
        |    AS BIGINT) AS s_last
        |FROM documents""".stripMargin,

    // Feature twin: regenerate the deterministic samples, lag for the
    // negativity-flip crossings, integer folds.
    "q_media_wav_features" ->
      """WITH sp AS (
        |  SELECT doc_id, 64 + n_chars % 192 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i
        |      FROM sp),
        |v AS (SELECT doc_id, n, i,
        |        (doc_id * 31 + i * 17) % 65536 - 32768 AS x
        |      FROM s),
        |c AS (SELECT doc_id, n, i, x,
        |        lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
        |      FROM v)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(count(*) FILTER (px IS NOT NULL AND ((px < 0) != (x < 0)))
        |    AS BIGINT) AS n_zero_cross,
        |  CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(x)) AS BIGINT) AS max_abs
        |FROM c GROUP BY doc_id, n""".stripMargin,

    "q_media_gif_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_no,
        |  CAST(2 + doc_id % 6 AS INTEGER) AS width,
        |  CAST(2 + n_chars % 4 AS INTEGER) AS height,
        |  CAST(((doc_id % 16777216) * 2654435761 + f * 40503) % 16777216
        |    AS BIGINT) AS rgb0
        |FROM (
        |  SELECT doc_id, n_chars,
        |    unnest(generate_series(0, CAST(2 + doc_id % 3 AS INTEGER) - 1)) AS f
        |  FROM documents)""".stripMargin,

    // Fingerprint = family pattern XOR the member's flipped bit (PNG is
    // lossless, so the decoded-pixel hash equals this arithmetic), then
    // the q_dedup_simhash_hamming pigeonhole verbatim.
    "q_media_phash_dedup" -> {
      val blockBits = 15
      val maxDist = 3
      s"""WITH ph AS (
         |  SELECT doc_id,
         |    xor(${h("CAST((doc_id // 8) AS VARCHAR)")},
         |        1::BIGINT << CAST((doc_id % 8) * 7 % 60 AS INT)) AS sim
         |  FROM documents),
         |bands AS (
         |  SELECT doc_id, sim, blk,
         |    (sim >> (blk * $blockBits)) & ${(1L << blockBits) - 1} AS blkval
         |  FROM ph CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(blk)),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2,
         |    x.sim AS sim1, y.sim AS sim2
         |  FROM bands x JOIN bands y
         |    ON x.blk = y.blk AND x.blkval = y.blkval AND x.doc_id < y.doc_id)
         |SELECT doc1, doc2, CAST(bit_count(xor(sim1, sim2)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(sim1, sim2)) <= $maxDist""".stripMargin
    },

    // Resize invariants are pure arithmetic of the per-doc pattern: the
    // codec passes are lossless and NN-upscale replicates each pixel 9×.
    "q_media_resize_codec" ->
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    xor(${h("CAST(doc_id AS VARCHAR)")},
         |        1::BIGINT << CAST((doc_id * 7) % 60 AS INT)) AS bits
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(24 AS INTEGER) AS up_w, CAST(24 AS INTEGER) AS up_h,
         |  CAST(bit_count(bits) AS BIGINT) * 9 AS n_white_up,
         |  bits AS recovered_fp
         |FROM fp""".stripMargin,

    "q_media_features" -> {
      val cols = (0 until 4)
        .map(i => s"round((${h(s"'f$i|' || text")} % 1000000) / 1000000.0, 6) AS f$i")
        .mkString(",\n  ")
      s"""SELECT doc_id AS media_id,
         |  $cols
         |FROM documents""".stripMargin
    }
  )
}
