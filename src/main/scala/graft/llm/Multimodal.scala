package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns: opaque `binary` payloads with
  * typed metadata, processed through typed `Dataset[T]` stages.
  *
  * The decode step is a STUB — this container ships no codec libraries, so
  * `decodeStub` fabricates deterministic metadata from the payload bytes.
  * Everything around it is the real 100 TB plumbing: case-class encoders,
  * per-partition batch iteration (`mapPartitions` — one codec context per
  * partition, not per row), generator fan-out for frame sampling, and
  * hash-derived feature vectors. A production build swaps `decodeStub` for a
  * JNI/codec call without touching any plan shape.
  */
object Multimodal {

  /** `checksum` is computed as a codegen'd Column in the adapter (NOT inside
    * the decode loop) — mapPartitions stays a codec-only boundary.
    */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      checksum: Long)
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                          width: Int, height: Int, checksum: Long)
  case class Frame(media_id: Long, frame_no: Int, byte_offset: Long)

  /** STUB decode (the ??? of this container): deterministic pseudo-metadata
    * from the first payload bytes. Replace with a real codec at deploy time.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64 + b0 % 64, 64 + b1 % 64)
  }

  /** Decode a media Dataset: per-partition batch loop so a real codec pays
    * its init cost once per partition. Output stays a typed Dataset —
    * downstream relational ops get a full schema.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close after the iterator drains;
      // ONLY codec-derived fields are computed in this loop
      rows.map { m =>
        val (w, h) = decodeStub(m.bytes)
        DecodedMedia(m.media_id, m.kind, m.bytes.length.toLong, w, h, m.checksum)
      }
    }
  }

  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          est_bytes: Long, checksum: Long)

  /** Resize stage (codec stubbed, plumbing real): output dimensions are the
    * target; the stub estimates the resized payload size by area ratio in
    * integer arithmetic (reproducible in any engine). A real implementation
    * decodes, scales, and re-encodes inside this same partition loop —
    * which is why it is mapPartitions (one scaler context per partition)
    * and not a per-row UDF.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h) = decodeStub(m.bytes)
        val est = m.bytes.length.toLong * (targetW.toLong * targetH) / (w.toLong * h)
        ResizedMedia(m.media_id, targetW, targetH, est, m.checksum)
      }
    }
  }

  /** Frame sampling: one row per 256-byte "frame" (stub granularity) —
    * generator semantics (flatMap ≡ explode) with bounded fan-out.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = (m.bytes.length + frameBytes - 1) / frameBytes
      (0 until n).map(i => Frame(m.media_id, i, i.toLong * frameBytes))
    }
  }

  /** Hash-derived feature vector (stub for a learned embedding): `dim`
    * md5-hash floats in [0,1) from the payload. Pure Column expressions —
    * codegen-friendly, no UDF.
    */
  def features(bytesCol: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column =
    array((0 until dim).map { i =>
      (graft.ops.Core.md5Hash64(concat(lit(s"f$i|"), bytesCol.cast("string"))) % 1000000L)
        .cast("double") / 1000000.0
    }: _*)

  case class ImageSpec(media_id: Long, width: Int, height: Int, rgb: Int)
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          png_bytes: Long, rgb0: Long)

  /** PNG encode/decode through EXPLICIT MemoryCache image streams.
    * The convenience overloads `ImageIO.write(img, fmt, OutputStream)` /
    * `ImageIO.read(InputStream)` consult `ImageIO.getUseCache()` (JDK
    * default TRUE) and back EVERY call with a FileCache stream — a temp
    * FILE created, written, read and deleted per encode and per decode.
    * At 32 concurrent codec tasks that is thousands of tmpfs syscalls
    * plus contention per pass (r15 opt round: the phash fold's task-time
    * read ~44 ms/row; the codec arithmetic is ~100 µs). MemoryCache
    * streams produce BYTE-IDENTICAL codec output (same writer plugin,
    * same bytes — only the spool target changes), so every oracle hash
    * is untouched.
    */
  private def pngEncode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close()
    bos.toByteArray
  }

  private def pngDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    // no explicit close: ImageIO.read(ImageInputStream) closes the
    // stream itself on completion (javadoc'd; a second close throws)
    javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
  }

  /** REAL codec round-trip — javax.imageio, pure JVM, zero new
    * dependencies: render each row's deterministic solid-RGB image, encode
    * it to PNG, and DECODE the bytes back inside the same partition loop.
    * The fixtures ship no binary media (documents.text stands in for
    * payloads — documented stub), so this stage is how a real encoder +
    * decoder get on the correctness record: the reported width/height/rgb0
    * survive an actual PNG encode/decode, and because they are pure
    * functions of the input spec the DuckDB oracle hash-checks them.
    * Same mapPartitions boundary as decode()/resize() — one codec context
    * per partition — so swapping in a JNI codec changes no plan shape.
    */
  def pngRoundTrip(specs: Dataset[ImageSpec]): Dataset[DecodedImage] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.map { sp =>
        val img = new java.awt.image.BufferedImage(
          sp.width, sp.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(sp.rgb))
        g.fillRect(0, 0, sp.width, sp.height)
        g.dispose()
        val bytes = pngEncode(img)
        val back = pngDecode(bytes)
        DecodedImage(sp.media_id, back.getWidth, back.getHeight,
          bytes.length.toLong, (back.getRGB(0, 0) & 0xffffff).toLong)
      }
    }
  }

  case class AudioSpec(media_id: Long, sample_rate: Int, n_samples: Int)
  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Int,
                          s0: Long, s_last: Long)

  /** REAL audio codec round-trip — javax.sound.sampled, pure JVM: render
    * each row's deterministic PCM16 buffer, encode it to a WAV container,
    * and DECODE the bytes back inside the same partition loop (the audio
    * twin of pngRoundTrip, and the same fixture rationale: no binary media
    * ships, so the spec IS the payload). PCM16 in a WAV container is
    * lossless, so the decoded first/last samples and the header's sample
    * rate are pure functions of the spec — DuckDB hash-checks a genuine
    * encoder/decoder pass. Same mapPartitions codec boundary; a JNI
    * codec swap changes no plan shape.
    */
  def wavRoundTrip(specs: Dataset[AudioSpec]): Dataset[DecodedAudio] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.map { sp =>
        val pcm = new Array[Byte](sp.n_samples * 2)
        var i = 0
        while (i < sp.n_samples) {
          val s = (((sp.media_id * 31 + i.toLong * 17) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sp.sample_rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, sp.n_samples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        val decoded = back.readAllBytes()
        val n = decoded.length / 2
        def sample(j: Int): Long =
          ((decoded(2 * j) & 0xff) | (decoded(2 * j + 1).toInt << 8)).toLong
        DecodedAudio(sp.media_id, back.getFormat.getSampleRate.toInt, n,
          sample(0), sample(n - 1))
      }
    }
  }

  case class AudioFeatures(media_id: Long, n_samples: Long,
                           n_zero_cross: Long, sum_abs: Long, max_abs: Long)

  /** Real DSP over the real codec: encode the deterministic PCM16 buffer
    * to WAV, decode it back, and compute integer signal features FROM THE
    * DECODED SAMPLES — zero crossings (negativity flips between
    * consecutive samples), Σ|s|, max|s|. All-integer outputs of a
    * lossless codec pass, so the oracle replicates the arithmetic and the
    * green row pins decode + feature extraction end to end (the audio
    * analogue of phashRoundTrip's decoded-pixel hashing). Same
    * mapPartitions codec boundary.
    */
  def wavFeatures(specs: Dataset[AudioSpec]): Dataset[AudioFeatures] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.map { sp =>
        val pcm = new Array[Byte](sp.n_samples * 2)
        var i = 0
        while (i < sp.n_samples) {
          val s = (((sp.media_id * 31 + i.toLong * 17) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sp.sample_rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, sp.n_samples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        val decoded = back.readAllBytes()
        val n = decoded.length / 2
        def sample(j: Int): Int =
          (decoded(2 * j) & 0xff) | (decoded(2 * j + 1).toInt << 8)
        var zc = 0L; var sumAbs = 0L; var maxAbs = 0L
        var j = 0
        while (j < n) {
          val x = sample(j)
          if (j > 0 && ((sample(j - 1) < 0) != (x < 0))) zc += 1
          val a = math.abs(x.toLong)
          sumAbs += a
          if (a > maxAbs) maxAbs = a
          j += 1
        }
        AudioFeatures(sp.media_id, n.toLong, zc, sumAbs, maxAbs)
      }
    }
  }

  case class VideoSpec(media_id: Long, width: Int, height: Int, n_frames: Int)
  case class DecodedFrame(media_id: Long, frame_no: Int, width: Int,
                          height: Int, rgb0: Long)

  /** REAL multi-frame container round-trip — animated GIF via
    * javax.imageio, pure JVM: render n_frames deterministic solid-color
    * frames, write them as ONE animated-GIF byte stream (writeToSequence),
    * then DECODE the container frame by frame inside the same partition
    * loop — the "video" member of the codec trio (PNG still, WAV audio,
    * GIF motion). Frames are TYPE_BYTE_INDEXED with an explicit one-color
    * palette, so GIF's 256-entry palette limit costs nothing and every
    * frame's (0,0) pixel round-trips bit-exactly — a pure function of
    * (media_id, frame_no) that DuckDB hash-checks. Same mapPartitions
    * codec boundary as the rest of the family: frame EXTRACTION from a
    * real container is what q_media_frames stubs with byte windows.
    */
  def gifFramesRoundTrip(specs: Dataset[VideoSpec]): Dataset[DecodedFrame] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.flatMap { sp =>
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        // MemoryCache, not createImageOutputStream: the factory consults
        // ImageIO.useCache and spools through a temp FILE per call (see
        // pngEncode) — identical bytes, no filesystem traffic
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until sp.n_frames).foreach { f =>
          val c = frameColor(sp.media_id, f)
          val cm = new java.awt.image.IndexColorModel(8, 2,
            Array(((c >> 16) & 0xff).toByte, 0.toByte),
            Array(((c >> 8) & 0xff).toByte, 0.toByte),
            Array((c & 0xff).toByte, 0.toByte))
          val img = new java.awt.image.BufferedImage(sp.width, sp.height,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        val bytes = bos.toByteArray
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n).map { f =>
          val img = reader.read(f)
          DecodedFrame(sp.media_id, f, img.getWidth, img.getHeight,
            (img.getRGB(0, 0) & 0xffffff).toLong)
        }
        reader.dispose()
        iis.close()
        out
      }
    }
  }

  /** Deterministic frame color — the exact arithmetic the oracle repeats. */
  def frameColor(mediaId: Long, frame: Int): Int =
    // mediaId pre-reduced mod 2^24: same value by modular identity, but
    // the unreduced multiply silently WRAPS in JVM arithmetic at ScaleUp's
    // 10^14 ids (the Spark/ANSI twin throws instead — r12 sf100 run)
    (((mediaId % 16777216L) * 2654435761L + frame.toLong * 40503L)
      % 16777216L).toInt

  case class PhashSpec(media_id: Long, pat: Long, flip_pos: Int)
  case class PhashImage(media_id: Long, phash: Long)

  /** Perceptual fingerprint through a REAL codec: render each row's
    * 60-bit black/white pattern (`pat` XOR one flipped pixel) as an 8×8
    * PNG, encode, DECODE, and recompute the 60-bit fingerprint FROM THE
    * DECODED PIXELS — the average-hash (aHash) pipeline with the
    * grayscale-threshold step degenerate because the pixels are already
    * binary. PNG is lossless, so the decoded fingerprint equals the spec
    * pattern — which is what lets the DuckDB oracle pin that a genuine
    * encoder+decoder preserved every pixel. 60 bits (not all 64 pixels)
    * keeps the fingerprint in the engine-wide cross-engine-safe bit
    * budget (Core.md5Hash64's range; bit 63 would go negative, and DuckDB
    * raises on 1::BIGINT << 63). Pixels 60..63 render black and carry no
    * information. Same mapPartitions codec boundary as the rest of the
    * family.
    */
  def phashRoundTrip(specs: Dataset[PhashSpec]): Dataset[PhashImage] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.map { sp =>
        val bits = sp.pat ^ (1L << sp.flip_pos)
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < 64) {
          val white = p < 60 && ((bits >> p) & 1L) == 1L
          img.setRGB(p % 8, p / 8, if (white) 0xffffff else 0x000000)
          p += 1
        }
        val back = pngDecode(pngEncode(img))
        var hash = 0L
        var q = 0
        while (q < 60) {
          if ((back.getRGB(q % 8, q / 8) & 0xffffff) == 0xffffff)
            hash |= 1L << q
          q += 1
        }
        PhashImage(sp.media_id, hash)
      }
    }
  }

  case class ResizedCodec(media_id: Long, up_w: Int, up_h: Int,
                          n_white_up: Long, recovered_fp: Long)

  /** REAL pixel-space resize through the PNG codec — the upgrade of the
    * `resize` stub above for payloads we can synthesize: render the row's
    * 60-bit pattern as an 8×8 PNG, encode, DECODE, nearest-neighbor
    * upscale ×k FROM THE DECODED PIXELS, re-encode, decode AGAIN, then
    * (a) count white pixels in the decoded upscaled image and (b) box-
    * filter back down to 8×8 (majority threshold per k×k cell) and
    * rebuild the 60-bit fingerprint from the downscaled cells.
    *
    * Both outputs are exact cross-engine invariants: PNG is lossless and
    * NN-upscale maps each source pixel to a k×k block, so
    * `n_white_up = popcount(bits) · k²` and `recovered_fp = bits` — pure
    * arithmetic the DuckDB oracle replicates, yet computed here only via
    * two real encode+decode passes and a genuine resampling kernel. A
    * lossy codec or a broken scaler breaks the hash gate immediately.
    * Same mapPartitions codec boundary as the rest of the family.
    */
  def resizeRoundTrip(specs: Dataset[PhashSpec], k: Int): Dataset[ResizedCodec] = {
    import specs.sparkSession.implicits._
    require(k >= 1, s"scale factor must be >= 1: $k")
    specs.mapPartitions { rows =>
      rows.map { sp =>
        val bits = sp.pat ^ (1L << sp.flip_pos)
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < 64) {
          val white = p < 60 && ((bits >> p) & 1L) == 1L
          img.setRGB(p % 8, p / 8, if (white) 0xffffff else 0x000000)
          p += 1
        }
        val dec1 = pngDecode(pngEncode(img))
        // NN upscale from DECODED pixels (not the spec bits)
        val up = new java.awt.image.BufferedImage(
          8 * k, 8 * k, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8 * k) {
          var x = 0
          while (x < 8 * k) {
            up.setRGB(x, y, dec1.getRGB(x / k, y / k) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val dec2 = pngDecode(pngEncode(up))
        var nWhite = 0L
        var fp = 0L
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            var whiteSub = 0
            var dy = 0
            while (dy < k) {
              var dx = 0
              while (dx < k) {
                if ((dec2.getRGB(cx * k + dx, cy * k + dy) & 0xffffff) == 0xffffff) {
                  whiteSub += 1; nWhite += 1
                }
                dx += 1
              }
              dy += 1
            }
            val cell = cy * 8 + cx
            if (cell < 60 && whiteSub * 2 > k * k) fp |= 1L << cell
            cx += 1
          }
          cy += 1
        }
        ResizedCodec(sp.media_id, 8 * k, 8 * k, nWhite, fp)
      }
    }
  }

  /** Documents → media table adapter: UTF-8 payloads standing in for real
    * image/audio bytes (the fixtures ship no binary media), typed via the
    * MediaRow encoder.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      // payload checksum rides whole-stage codegen here, not the codec loop
      graft.ops.Core.md5Hash64(col("text")).as("checksum")
    ).as[MediaRow]
  }
}
