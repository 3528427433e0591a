package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for the training-data
  * pipeline layer: media as opaque `binary` columns plus typed metadata
  * structs, with decode / feature-extraction as partition-batched
  * transforms.
  *
  * Image DIMENSIONS are decoded for real: [[HeaderCodec]] parses PNG IHDR
  * and JPEG SOF headers in pure JVM code (public byte layouts, no native
  * libs). Full pixel/audio/video codecs are NOT available in this
  * container, so other payloads fall back to [[FakeCodec]], a
  * clearly-marked deterministic stand-in; everything Spark-side — schema,
  * batching, partition sizing, the mapPartitions contract — is real and
  * is what a production deployment keeps, swapping only the codec body.
  *
  * Scale notes: media rows are large (MBs); `targetPartitionBytes`
  * repartitioning keeps a partition's decoded working set within executor
  * memory, which is the binding constraint at 100 TB — not row count.
  */
object BinaryPipeline {

  /** Typed metadata emitted by decode. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("content_hash", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  /** STUB: deterministic fake decode — replace with a real codec (e.g.
    * javax.imageio / ffmpeg bindings) in production. Output depends only
    * on the bytes, so tests are reproducible. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val n = if (bytes == null) 0 else bytes.length
      // ??? real decode unavailable in this container; derive deterministic
      // pseudo-dimensions from content length/first bytes instead.
      val w = 64 + (n % 577)
      val h = 64 + ((n / 7) % 421)
      val frames = 1 + (n % 13)
      (w, h, frames, if (n % 2 == 0) "fake/png" else "fake/jpeg")
    }
  }

  /** Real pure-JVM header decode for the two public image container
    * formats whose dimensions live in a fixed-layout header — PNG's IHDR
    * chunk and JPEG's SOF frame segment (ISO/IEC 15948 and ITU-T T.81
    * layouts; no native libs, no pixel decode). Bytes that are neither
    * fall back to [[FakeCodec]], so the pipeline decodes REAL images
    * where they appear and stays deterministic on everything else. */
  object HeaderCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    private val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

    /** PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" type,
      * width and height as 4-byte big-endian at offsets 16 and 20). */
    def decodePng(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 24 &&
        pngMagic.indices.forall(i => u8(b, i) == pngMagic(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some((w.toInt, h.toInt))
        else None
      } else None

    /** A JPEG start-of-frame marker (C0-CF minus DHT/JPG/DAC). */
    private def isSof(m: Int): Boolean =
      m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

    /** JPEG: walk the marker segments from SOI until a SOF segment;
      * its payload is [precision, height:2, width:2] big-endian. Any
      * structural violation bails to None (→ fake fallback). */
    def decodeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xFF) return None
        val marker = u8(b, i + 1)
        if (marker == 0xFF) { i += 1 } // fill byte padding
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
          i += 2 // standalone marker, no length field
        } else {
          val len = be16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          if (isSof(marker)) {
            if (len < 7) return None
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            return if (w > 0 && h > 0) Some((w, h)) else None
          }
          i += 2 + len
        }
      }
      None
    }

    /** The codec seam's default: real PNG/JPEG header decode, fake
      * fallback for everything else. Single images report 1 frame. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, String) = {
      if (bytes != null) {
        decodePng(bytes) match {
          case Some((w, h)) => return (w, h, 1, "image/png")
          case None =>
        }
        decodeJpeg(bytes) match {
          case Some((w, h)) => return (w, h, 1, "image/jpeg")
          case None =>
        }
      }
      FakeCodec.decode(bytes)
    }
  }

  /** Real pure-JVM WAV (RIFF/WAVE) header decode — the audio modality's
    * analogue of [[HeaderCodec]]: the PCM format chunk ("fmt ") and the
    * declared data-chunk size give sample rate, channels, bit depth and
    * sample count without touching a single sample (public RIFF layout,
    * little-endian fields; no native libs). Bytes that aren't RIFF/WAVE,
    * or whose chunk walk is structurally broken, yield None. */
  object WavCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

    /** (sample_rate, channels, bits_per_sample, n_samples). The data
      * chunk's DECLARED size counts even when the samples aren't
      * attached — this is header decode, the same contract as image
      * dimensions from IHDR/SOF. */
    def decode(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        return None
      // Long index + unsigned chunk size: a declared size >= 2^31 must
      // not wrap negative (Int math would loop forever on 0xFFFFFFF7 or
      // index out of bounds) — the walk either strictly advances or the
      // bytes are structurally broken and yield None.
      var i = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // (ch, rate, bits, blockAlign)
      var dataSize: Option[Long] = None
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val at = i.toInt
        val id = tag(b, at)
        val size = le32(b, at + 4) // unsigned 32-bit, 0..2^32-1
        if (id == "fmt ") {
          if (size < 16 || i + 8 + 16 > b.length) return None
          fmt = Some((le16(b, at + 10), le32(b, at + 12).toInt,
            le16(b, at + 22), le16(b, at + 20)))
        } else if (id == "data") dataSize = Some(size)
        // chunks are word-aligned; a declared-but-absent data body just
        // ends the walk via the loop bound
        val next = i + 8L + size + (size & 1L)
        if (next <= i) return None
        i = next
      }
      for {
        (ch, rate, bits, blockAlign) <- fmt
        ds <- dataSize
        if ch > 0 && rate > 0 && blockAlign > 0
      } yield (rate, ch, bits, ds / blockAlign)
    }
  }

  /** Typed metadata emitted by audio decode. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("content_hash", StringType),
    StructField("n_bytes", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("format", StringType)))

  /** Audio decode over partition-sized batches — same iterator contract
    * as [[decodeMedia]], same codec seam. Non-WAV bytes get NULL audio
    * fields and format 'application/octet-stream': unlike image
    * dimensions there is no meaningful fake for a sample rate, and
    * downstream (duration math, resampling plans) must skip on NULL
    * rather than compute on an invented value. */
  def decodeAudio(df: DataFrame, payloadCol: String = "payload",
      codec: Array[Byte] => Option[(Int, Int, Int, Long)] = WavCodec.decode): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("audio_meta", audioMetaSchema))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        md5.reset()
        val hash = if (bytes == null) null
        else md5.digest(bytes).map("%02x".format(_)).mkString
        val nBytes = if (bytes == null) 0L else bytes.length.toLong
        val meta = codec(bytes) match {
          case Some((rate, ch, bits, nSamples)) =>
            Row(hash, nBytes, rate, ch, bits, nSamples, "audio/x-wav")
          case None =>
            Row(hash, nBytes, null, null, null, null, "application/octet-stream")
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(encoder)
  }

  /** Attach a binary payload column (here derived from text for the
    * harness `documents` table; in production this IS the stored bytes). */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", col(sourceCol).cast("binary"))

  /** Decode + feature-extract over partition-sized batches. The iterator
    * contract mirrors a vectorized (Arrow-batched) UDF: one pass, no
    * per-row task overhead, codec state reused across a partition. The
    * codec body is the swap seam: [[HeaderCodec.decode]] by default
    * (real PNG/JPEG header parse, deterministic fake for other bytes). */
  def decodeMedia(df: DataFrame, payloadCol: String = "payload",
      codec: Array[Byte] => (Int, Int, Int, String) = HeaderCodec.decode): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("media_meta", mediaMetaSchema))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, frames, fmt) = codec(bytes)
        md5.reset()
        val hash = if (bytes == null) null
        else md5.digest(bytes).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ Row(hash,
          if (bytes == null) 0L else bytes.length.toLong, w, h, frames, fmt))
      }
    }(encoder)
  }

  /** Uniform frame sampling — one row per (media row, sampled frame):
    * `k` indices spread evenly over `[0, n_frames)` (the standard
    * `i·n/k` grid; fewer when the clip has fewer frames than `k`). The
    * row explosion, its partition cost and the downstream schema are the
    * real plumbing; extracting the frame bytes is the codec kernel a
    * production deployment swaps in ([[FakeCodec]] caveat above). Pure
    * codegen'd array expressions — no shuffle; output size is bounded by
    * `k · rows`, never by frame counts. */
  def sampleFrames(df: DataFrame, k: Int,
      metaCol: String = "media_meta"): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val nf = col(s"$metaCol.n_frames").cast("long")
    // A frameless clip (real codecs CAN return 0 — corrupt video, still
    // image; null meta likewise) must contribute zero rows, not an index
    // into a frame that doesn't exist: explode of the empty array drops
    // the row.
    df.withColumn("frame_idx",
      explode(when(nf > 0, array_distinct(transform(
        sequence(lit(0L), lit((k - 1).toLong)),
        i => call_function("div", i * nf, lit(k.toLong)))))
        .otherwise(array().cast("array<long>"))))
  }

  /** Aspect-preserving resize planning: target dimensions that fit
    * `(maxW, maxH)` without upscaling, computed with integer-exact
    * arithmetic — SQL `div` (IntegralDivide), never a double-typed `/`,
    * so any engine reproduces them bit-for-bit at ANY input magnitude
    * (the q_mm3 oracle recomputes the same CASE with DuckDB's `//`).
    * A row whose decode failed (null metadata, null or non-positive
    * dimension) gets NULL resize dims — a plan must never be fabricated
    * for an image we couldn't measure; downstream skips on NULL, the
    * same contract as [[sampleFrames]] dropping frameless clips. This
    * is the metadata half of resize; the pixel transform itself is the
    * stubbed codec kernel. Codegen'd per-row arithmetic: scan-bound at
    * 100 TB. */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int,
      metaCol: String = "media_meta"): DataFrame = {
    require(maxW > 0 && maxH > 0, s"bounds ($maxW, $maxH) must be positive")
    val w = col(s"$metaCol.width").cast("long")
    val h = col(s"$metaCol.height").cast("long")
    // null w/h makes the predicate NULL, which falls through to the
    // trailing otherwise(NULL) — no isNull checks needed
    val measurable = w > 0 && h > 0
    val fits = w <= maxW && h <= maxH
    val wLimited = w * maxH >= h * maxW
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    df
      .withColumn("resize_w",
        when(measurable && fits, w)
          .when(measurable && wLimited, lit(maxW.toLong))
          .when(measurable, greatest(lit(1L), idiv(w * maxH, h)))
          .otherwise(lit(null).cast("long")))
      .withColumn("resize_h",
        when(measurable && fits, h)
          .when(measurable && wLimited, greatest(lit(1L), idiv(h * maxW, w)))
          .when(measurable, lit(maxH.toLong))
          .otherwise(lit(null).cast("long")))
  }

  /** Size-aware repartition: media rows are large, so partition by
    * cumulative payload bytes rather than row count. */
  def repartitionByBytes(df: DataFrame, payloadCol: String,
      targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val totalBytes = df.agg(coalesce(sum(octet_length(col(payloadCol))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    df.repartition(parts)
  }
}
