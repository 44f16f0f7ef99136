package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) as opaque `binary` columns plus typed metadata,
  * with format sniffing, deterministic byte-level features, and the
  * plumbing (schema, batching, partitioning) for model-based decode
  * stages.
  *
  * The environment has no compressed-media codecs, so jpeg/png/mp3
  * decode is STUBBED (see [[decodeStub]]) — deterministic fake outputs
  * behind the same schema/batch shape a real decoder (JNI codec or
  * model server) would use. The codec-FREE containers decode for real:
  * binary PPM and uncompressed 24-bit BMP ([[parsePpm]]/[[parseBmp]],
  * full raster-byte sums) and RIFF/WAVE integer PCM ([[parseWav]],
  * full sample-byte sum). Everything around the stub — magic-number
  * sniffing, hashing, batch iteration, salting — is real and tested.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("declared_format", StringType))))))

  /** Container-format sniffing from magic numbers — real logic, no
    * codecs needed. Unknown payloads yield "unknown".
    */
  def sniffFormat(bytes: Column): Column = {
    def hexPrefix(n: Int): Column = hex(substring(bytes, 1, n))
    when(hexPrefix(2) === "FFD8", "jpeg")
      .when(hexPrefix(4) === "89504E47", "png")
      .when(hexPrefix(3) === "474946", "gif")
      .when(hexPrefix(4) === "52494646" &&
        hex(substring(bytes, 9, 4)) === "57415645", "wav")
      .when(hex(substring(bytes, 5, 4)) === "66747970", "mp4")
      .when(hexPrefix(3) === "494433", "mp3")
      .when(hexPrefix(2) === "5036", "ppm")   // "P6" binary PPM
      .when(hexPrefix(2) === "424D", "bmp")   // "BM"
      .otherwise("unknown")
  }

  /** Payload size + a stable content digest — the dedup key for binary
    * media (pair with [[graft.dedup.Dedup]] for exact media dedup).
    */
  def contentStats(bytes: Column): Seq[Column] = Seq(
    length(bytes).as("n_bytes"),
    md5(bytes).as("content_md5"))

  /** Deterministic pseudo-embedding of a payload: `dims` floats derived
    * from md5 of (chunk_index, bytes). A stand-in with the exact shape
    * a model-encoder stage would produce (`array<float>`), so downstream
    * similarity/dedup operators can be built and tested against it.
    * STUB: replace with a real encoder at deployment.
    */
  def pseudoEmbedding(bytes: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      (((conv(substring(md5(concat(i.cast("string"), lit(":"), base64(bytes))), 1, 15),
        16, 10).cast("long") % 2000000L) / lit(1000000.0)) - 1.0).cast("float"))

  /** Real parse of a binary PPM (P6) payload — the one container a
    * codec-free environment can genuinely decode: ASCII header
    * `P6 <w> <h> <maxval>` (any whitespace runs, `#` comments legal
    * per the netpbm spec), one whitespace byte, then w*h*3 raw pixel
    * bytes. Returns (width, height, pixelBytesPresent, pixelByteSum) —
    * the sum touches every decoded byte, so a green oracle row is
    * evidence of real pixel data flowing, not header echo.
    */
  private[multimodal] def parsePpm(p: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (p == null || p.length < 2 || p(0) != 'P' || p(1) != '6') None
    else {
      var pos = 2
      def skipWs(): Unit = {
        var go = true
        while (go && pos < p.length) p(pos) match {
          case ' ' | '\n' | '\r' | '\t' => pos += 1
          case '#' => while (pos < p.length && p(pos) != '\n') pos += 1
          case _ => go = false
        }
      }
      def int(): Int = {
        skipWs(); var v = 0
        while (pos < p.length && p(pos) >= '0' && p(pos) <= '9') {
          v = v * 10 + (p(pos) - '0'); pos += 1
        }
        v
      }
      val w = int(); val h = int(); int() // maxval read but not kept
      pos += 1 // exactly one whitespace byte separates header and raster
      if (w <= 0 || h <= 0 || pos > p.length) None
      else {
        val n = math.min(w.toLong * h * 3, (p.length - pos).toLong).toInt
        var sum = 0L; var i = 0
        while (i < n) { sum += (p(pos + i) & 0xFF); i += 1 }
        Some((w, h, n.toLong, sum))
      }
    }
  }

  /** Real parse of an uncompressed 24-bit BMP payload — the second
    * codec-free container: "BM" magic, little-endian pixel-data offset
    * at byte 10, width/height in the BITMAPINFOHEADER at 18/22 (height
    * may be negative for top-down images), bpp at 28 must be 24 and
    * compression at 30 must be 0 (BI_RGB). Rows are padded to 4-byte
    * stride; the sum walks each row's w*3 pixel bytes and skips the
    * padding, so the result is invariant to row order and stride.
    */
  private[multimodal] def parseBmp(p: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    def u16(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
    def i32(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8) |
      ((p(at + 2) & 0xFF) << 16) | ((p(at + 3) & 0xFF) << 24)
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') None
    else {
      val off = i32(10)
      val w = i32(18)
      val h = math.abs(i32(22))
      if (u16(28) != 24 || i32(30) != 0 || w <= 0 || h <= 0 ||
        off < 54 || off > p.length) None
      else {
        // Long arithmetic throughout: a hostile header can declare w or h
        // near Int.MaxValue, where `w * 3` overflows Int and a row walk
        // keyed on the declared h spins ~2^31 empty iterations. Clamp the
        // row count to what the payload can actually contain.
        val rowBytes = w.toLong * 3
        val stride = ((rowBytes + 3) / 4) * 4
        val avail = (p.length - off).toLong
        val hEff = math.min(h.toLong, (avail + stride - 1) / stride).toInt
        var sum = 0L; var nPix = 0L
        var r = 0
        while (r < hEff) {
          val rowStart = off + r.toLong * stride
          var c = 0L
          while (c < rowBytes && rowStart + c < p.length) {
            sum += (p((rowStart + c).toInt) & 0xFF); nPix += 1; c += 1
          }
          r += 1
        }
        Some((w, h, nPix, sum))
      }
    }
  }

  /** Real parse of a RIFF/WAVE PCM payload — the codec-free AUDIO
    * container (the audio analog of [[parsePpm]]/[[parseBmp]]): "RIFF"
    * + "WAVE" magic, then a word-aligned chunk walk; the `fmt ` chunk
    * must declare audio format 1 (integer PCM) and yields (channels,
    * sample rate, bits/sample); the `data` chunk is summed byte-by-byte
    * so a green oracle row is evidence of every PCM sample byte
    * flowing, not header echo. Untrusted-bytes rules as parseBmp:
    * declared chunk sizes are Long-clamped to the payload, so a hostile
    * size can neither overflow nor walk past the buffer. Compressed
    * audio (mp3 etc.) stays behind the decode stub.
    */
  private[multimodal] def parseWav(p: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    if (p == null || p.length < 44) return None
    def u16(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
    def u32(at: Int): Long = (p(at) & 0xFFL) | ((p(at + 1) & 0xFFL) << 8) |
      ((p(at + 2) & 0xFFL) << 16) | ((p(at + 3) & 0xFFL) << 24)
    def tag(at: Int): String = new String(p, at, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var pos = 12L
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[(Long, Long)] = None
      var nonPcm = false
      while (pos + 8 <= p.length && (fmt.isEmpty || data.isEmpty) && !nonPcm) {
        val id = tag(pos.toInt)
        val body = pos + 8
        // clamp the declared size to the payload — untrusted bytes
        val n = math.min(u32(pos.toInt + 4), p.length - body)
        if (id == "fmt " && n >= 16) {
          if (u16(body.toInt) == 1)
            fmt = Some((u16(body.toInt + 2), u32(body.toInt + 4).toInt,
              u16(body.toInt + 14)))
          else nonPcm = true
        } else if (id == "data") {
          var sum = 0L; var i = 0L
          while (i < n) { sum += (p((body + i).toInt) & 0xFF); i += 1 }
          data = Some((n, sum))
        }
        pos = body + n + (n % 2) // chunks are word-aligned
      }
      if (nonPcm) None
      else for { f <- fmt; d <- data } yield (f._1, f._2, f._3, d._1, d._2)
    }
  }

  /** Serialize a RIFF/WAVE integer-PCM payload: 44-byte header (RIFF +
    * fmt + data chunk headers), optionally a 6-byte LIST junk chunk
    * between `fmt ` and `data` (so consumers must chunk-WALK, not
    * assume a fixed 44-byte data offset), then the raw sample bytes.
    * The single source of truth for the qm4 fixture generator and the
    * MultimodalSpec fixtures — one byte layout, one writer.
    * `fmtCode` other than 1 produces a non-PCM file [[parseWav]]
    * rejects (spec uses 3 = IEEE float).
    */
  private[graft] def buildPcmWav(ch: Int, sr: Int, bits: Int,
      data: Array[Byte], junk: Boolean = false, fmtCode: Int = 1): Array[Byte] = {
    val junkLen = if (junk) 6 else -8 // -8 = no LIST chunk at all
    val b = new Array[Byte](44 + 8 + junkLen + data.length)
    def putTag(at: Int, t: String): Unit =
      System.arraycopy(t.getBytes("US-ASCII"), 0, b, at, 4)
    def putU16(at: Int, v: Int): Unit = {
      b(at) = (v & 0xFF).toByte; b(at + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putU32(at: Int, v: Int): Unit = (0 until 4).foreach(k =>
      b(at + k) = ((v >> (8 * k)) & 0xFF).toByte)
    putTag(0, "RIFF"); putU32(4, b.length - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16); putU16(20, fmtCode); putU16(22, ch)
    putU32(24, sr); putU32(28, sr * ch * (bits / 8))
    putU16(32, ch * (bits / 8)); putU16(34, bits)
    var at = 36
    if (junk) { putTag(at, "LIST"); putU32(at + 4, junkLen); at += 8 + junkLen }
    putTag(at, "data"); putU32(at + 4, data.length)
    System.arraycopy(data, 0, b, at + 8, data.length)
    b
  }

  /** Audio decode stage: the same batched per-partition shape as
    * [[decodeStub]], but with the audio-typed output schema. RIFF/WAVE
    * integer-PCM payloads decode for REAL ([[parseWav]] — fmt-chunk
    * metadata + a sum over every data-chunk sample byte, `codec =
    * "wav"`); anything else falls back to the deterministic stub a
    * codec/model call would replace (`codec = "stub"`, `sample_sum`
    * null).
    */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // <-- a codec/model decoder would process `batch` here; the
          //     PCM arm IS that decoder for the container this
          //     environment can parse
          batch.iterator.map { case (id, payload) =>
            parseWav(payload) match {
              case Some((ch, sr, bits, nBytes, sum)) =>
                (id, ch, sr, bits, nBytes, Some(sum), "wav")
              case None =>
                val len = if (payload == null) 0 else payload.length
                (id, 1 + len % 2, 8000, 16, len.toLong,
                  None: Option[Long], "stub")
            }
          }
        }
      }
      .toDF("media_id", "channels", "sample_rate", "bits_per_sample",
        "n_data_bytes", "sample_sum", "codec")
    media.join(out, "media_id")
  }

  /** Decode stage: batched per-partition iteration over (id, bytes)
    * producing fixed-schema decoded features. PPM (P6) and uncompressed
    * 24-bit BMP payloads are decoded for REAL ([[parsePpm]] /
    * [[parseBmp]] — header dims + a sum over every raster byte,
    * `codec = "ppm"`/`"bmp"`); everything else falls back to the
    * deterministic STUB a codec/model call would replace (`codec =
    * "stub"`, `pix_sum` null). The batch shape is the real part either
    * way: one decoder invocation per `batchSize` rows, not per row.
    */
  def decodeStub(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // <-- a codec/model decoder would process `batch` here (one
          //     call per batch, not per row); the PPM arm IS that
          //     decoder for the container this environment can parse
          batch.iterator.map { case (id, payload) =>
            parsePpm(payload).map(d => (d, "ppm"))
              .orElse(parseBmp(payload).map(d => (d, "bmp"))) match {
              case Some(((w, h, nPix, sum), codec)) =>
                (id, w, h, nPix, Some(sum), codec)
              case None =>
                val len = if (payload == null) 0 else payload.length
                val fakeW = 16 + (math.abs(len) % 64)
                (id, fakeW, fakeW / 2, len.toLong, None: Option[Long], "stub")
            }
          }
        }
      }
      .toDF("media_id", "decoded_width", "decoded_height", "decoded_bytes",
        "pix_sum", "codec")
    media.join(out, "media_id")
  }

  /** Skew-safe partitioning for a decode stage: salt by content hash so
    * one giant file class (e.g. all 4K videos on one key) cannot pin a
    * single task at 100 TB.
    */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, abs(hash(col("media_id"), md5(col("bytes")))))

  /** Resize-stage STUB: batched per-partition iteration producing the
    * target-box dimensions with aspect ratio preserved. The geometry is
    * REAL (fit-within-box math on the decoded dimensions); only the
    * pixel resampling a codec would do is absent. Input needs
    * (media_id, decoded_width, decoded_height) — compose after
    * [[decodeStub]].
    */
  def resizeStub(decoded: DataFrame, maxW: Int, maxH: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val out = decoded.select(col("media_id"),
        col("decoded_width"), col("decoded_height"))
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // <-- real resampler would process `batch` here
          batch.iterator.map { case (id, w, h) =>
            val scale = math.min(1.0,
              math.min(maxW.toDouble / math.max(w, 1),
                maxH.toDouble / math.max(h, 1)))
            (id, math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          }
        }
      }.toDF("media_id", "resized_width", "resized_height")
    decoded.join(out, "media_id")
  }

  /** Frame-sampling STUB for video payloads: emits one row per sampled
    * frame — frame index every `everyNth` of a deterministic
    * payload-derived frame count, with a per-frame content key
    * (md5 of payload + frame index; a real decoder hashes the decoded
    * frame). The generator shape (explode to frame granularity with
    * ordinal + key) is the real part.
    */
  def frameSampleStub(media: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth >= 1, "everyNth must be >= 1")
    val frameCount = (length(col("bytes")) % 240 + 1).cast("int")
    media.select(col("media_id"), col("bytes"), frameCount.as("n_frames"))
      .withColumn("frame_index",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .select(col("media_id"), col("n_frames"), col("frame_index"),
        md5(concat(col("bytes"), col("frame_index").cast("string")))
          .as("frame_key"))
  }
}
