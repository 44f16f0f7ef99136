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
  * The environment has no external media codecs, so mp3 (and video)
  * decode is STUBBED (see [[decodeStub]]) — deterministic fake outputs
  * behind the same schema/batch shape a real decoder (JNI codec or
  * model server) would use. Everything the JDK alone can decode is
  * decoded for REAL: binary PPM and uncompressed 24-bit BMP
  * ([[parsePpm]]/[[parseBmp]], full raster-byte sums), RIFF/WAVE
  * integer PCM ([[parseWav]], full sample-byte sum), PNG ([[parsePng]]
  * — zlib inflate via `java.util.zip` plus full five-filter scanline
  * reconstruction), and JPEG ([[parseJpeg]] — the JDK's bundled
  * ImageIO codec; spec-pinned rather than SQL-oracled because IDCT
  * rounding is implementation-defined). Everything around the stub —
  * magic-number sniffing, hashing, batch iteration, salting — is real
  * and tested.
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
    graft.text.TextOps.bindOnce(base64(bytes)) { b64 =>
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (((conv(substring(md5(concat(i.cast("string"), lit(":"), b64)), 1, 15),
          16, 10).cast("long") % 2000000L) / lit(1000000.0)) - 1.0).cast("float"))
    }

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

  /** Real parse of a PNG payload — the COMPRESSED image container a
    * codec-free environment can still genuinely decode, because zlib
    * inflate ships in the JDK (`java.util.zip.Inflater`): signature +
    * chunk walk (IHDR dims/depth/color, IDAT concatenation, stop at
    * IEND), zlib-inflate of the filtered scanline stream, then the full
    * per-row filter RECONSTRUCTION (all five PNG filter types — None /
    * Sub / Up / Average / Paeth) and a sum over every reconstructed
    * pixel byte. Supports 8-bit greyscale (color 0) and RGB (color 2),
    * non-interlaced — the fixture shapes; anything else returns None to
    * the stub. Untrusted-bytes rules: chunk lengths are Long-clamped to
    * the payload, the inflate output is allocated from the DECLARED
    * dims and capped (64 MiB) so a zip bomb cannot balloon memory, and
    * a truncated stream decodes however many complete rows arrived.
    */
  private[multimodal] def parsePng(p: Array[Byte]): Option[(Int, Int, Long, Long)] =
    pngRecon(p).map { case (w, h, bpp, rows, recon) =>
      var sum = 0L; var i = 0
      while (i < rows * w * bpp) { sum += recon(i) & 0xFF; i += 1 }
      (w, h, rows.toLong * w * bpp, sum)
    }

  /** Shared PNG decode core for [[parsePng]] and [[rasterPng]]: chunk
    * walk + inflate + five-filter reconstruction. Returns
    * (w, h, bytesPerPixel, completeRows, recon) where `recon` holds the
    * reconstructed bytes of the `completeRows` scanlines that arrived
    * (truncated streams yield fewer than h).
    */
  private def pngRecon(p: Array[Byte]): Option[(Int, Int, Int, Int, Array[Byte])] = {
    if (p == null || p.length < 45) return None
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) { if ((p(i) & 0xFF) != sig(i)) return None; i += 1 }
    def u32(at: Int): Long = ((p(at) & 0xFFL) << 24) | ((p(at + 1) & 0xFFL) << 16) |
      ((p(at + 2) & 0xFFL) << 8) | (p(at + 3) & 0xFFL)
    def tag(at: Int): String = new String(p, at, 4, "US-ASCII")
    var pos = 8L
    var w = 0; var h = 0; var bpp = 0
    var headerOk = false; var stop = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!stop && pos + 8 <= p.length) {
      val id = tag(pos.toInt + 4)
      val body = pos + 8
      val n = math.min(u32(pos.toInt), p.length - body) // clamp, untrusted
      if (id == "IHDR" && n >= 13) {
        w = u32(body.toInt).toInt; h = u32(body.toInt + 4).toInt
        val depth = p(body.toInt + 8) & 0xFF
        bpp = (p(body.toInt + 9) & 0xFF) match { case 0 => 1; case 2 => 3; case _ => 0 }
        headerOk = depth == 8 && bpp > 0 && (p(body.toInt + 10) & 0xFF) == 0 &&
          (p(body.toInt + 11) & 0xFF) == 0 && (p(body.toInt + 12) & 0xFF) == 0 &&
          w > 0 && h > 0
        if (!headerOk) stop = true
      } else if (id == "IDAT") idat.write(p, body.toInt, n.toInt)
      else if (id == "IEND") stop = true
      pos = body + n + 4 // skip CRC
    }
    val rowBytes = w.toLong * bpp
    // Overflow-safe 64 MiB cap: h * (rowBytes+1) can exceed Long for
    // hostile IHDR dims (w,h near 2^31), wrapping negative and slipping
    // past a direct `expect > cap` compare — so bound h by division
    // first, then the multiply below cannot overflow.
    if (!headerOk || idat.size == 0 || h > (64L << 20) / (rowBytes + 1)) return None
    val expect = h.toLong * (rowBytes + 1)
    val out = new Array[Byte](expect.toInt)
    val inf = new java.util.zip.Inflater()
    var got = 0; var bad = false
    try {
      inf.setInput(idat.toByteArray)
      var go = true
      while (go && got < out.length && !inf.finished()) {
        val k = inf.inflate(out, got, out.length - got)
        if (k == 0) {
          // Zero progress and not finished: either a truncated stream
          // (needsInput — decode the rows that arrived) or a zlib FDICT
          // preset-dictionary stream (needsDictionary — unsupported in
          // PNG, reject). Bailing on ANY zero-progress call also stops
          // a crafted stream from spinning this loop forever.
          if (inf.needsDictionary()) bad = true
          go = false
        } else got += k
      }
    } catch { case _: java.util.zip.DataFormatException => bad = true }
    finally inf.end()
    if (bad) return None
    val stride = rowBytes.toInt + 1
    val rows = got / stride // decode only the COMPLETE rows that arrived
    val prev = new Array[Int](rowBytes.toInt)
    val cur = new Array[Int](rowBytes.toInt)
    val recon = new Array[Byte](rows * rowBytes.toInt)
    var r = 0
    while (r < rows) {
      val f = out(r * stride) & 0xFF
      if (f > 4) return None // invalid filter type byte
      var c = 0
      while (c < rowBytes) {
        val raw = out(r * stride + 1 + c) & 0xFF
        val a = if (c >= bpp) cur(c - bpp) else 0  // left (recon)
        val b = prev(c)                            // up (recon)
        val ul = if (c >= bpp) prev(c - bpp) else 0 // upper-left (recon)
        val v = f match {
          case 0 => raw
          case 1 => (raw + a) & 0xFF
          case 2 => (raw + b) & 0xFF
          case 3 => (raw + (a + b) / 2) & 0xFF
          case 4 =>
            val pp = a + b - ul
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else ul
            (raw + pred) & 0xFF
        }
        cur(c) = v; recon(r * rowBytes.toInt + c) = v.toByte; c += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      r += 1
    }
    Some((w, h, bpp, rows, recon))
  }

  /** Real parse of a JPEG payload via the JDK's bundled ImageIO codec —
    * SOI/JFIF magic, then dimensions read from the HEADER ONLY and
    * bounded by the same 64 MiB raster cap as [[parsePng]] BEFORE the
    * full DCT decode runs, so a decompression bomb is rejected without
    * allocating its raster. The sum is over every decoded pixel's R, G
    * and B bytes (greyscale JPEGs surface each sample three times
    * through `getRGB`, consistently for decode and fixture). No driver
    * oracle row exists for this arm — IDCT rounding is
    * implementation-defined, so there is no closed-form SQL recompute;
    * equality is pinned in MultimodalSpec against an independent
    * same-JVM ImageIO decode of a generated fixture instead. Anything
    * ImageIO cannot read (including the sniff-only jpeg-magic test
    * payloads) returns None to the stub.
    */
  private[multimodal] def parseJpeg(p: Array[Byte]): Option[(Int, Int, Long, Long)] =
    rasterJpeg(p).map { case (w, h, rgb) =>
      var sum = 0L; var i = 0
      while (i < rgb.length) { sum += rgb(i) & 0xFF; i += 1 }
      (w, h, w.toLong * h * 3, sum)
    }

  /** JPEG payload → top-down RGB raster (3 bytes/pixel) via the JDK's
    * bundled ImageIO codec — the shared core of [[parseJpeg]] and the
    * [[resize]] decode arm. Greyscale JPEGs surface each sample three
    * times through `getRGB`, consistently for decode and fixture.
    */
  private[multimodal] def rasterJpeg(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p == null || p.length < 3) return None
    if (p(0) != 0xFF.toByte || p(1) != 0xD8.toByte || p(2) != 0xFF.toByte)
      return None
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory honors ImageIO.getUseCache() (default true) and backs
    // each stream with a TEMP FILE — disk churn per payload in a decode
    // hot path, and a global-state toggle to avoid. The payload is
    // already fully in memory.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        // Bomb cap from the HEADER, before reader.read allocates the
        // raster. The denominator is the RAW band count (a 4-component
        // CMYK/Adobe JPEG allocates a w*h*4 raster, 33% over a
        // 3-bytes/pixel assumption), never below the 3 bytes/pixel the
        // getRGB walk and the returned RGB raster cost.
        val bands = {
          val raw = reader.getRawImageType(0)
          if (raw != null) raw.getNumBands
          else {
            val it = reader.getImageTypes(0)
            if (it.hasNext) it.next().getNumBands else 4
          }
        }
        if (w <= 0 || h <= 0 ||
          h > (64L << 20) / (w.toLong * math.max(3, bands))) return None
        val img = reader.read(0)
        val rgb = new Array[Byte](w * h * 3)
        // bulk per-row getRGB: per-pixel getRGB(x, y) pays a ColorModel
        // conversion CALL per pixel on non-INT_RGB rasters (~22M calls
        // at the cap) — the row form amortizes it across the scanline
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val v = row(x); val at = (y * w + x) * 3
            rgb(at) = ((v >> 16) & 0xFF).toByte
            rgb(at + 1) = ((v >> 8) & 0xFF).toByte
            rgb(at + 2) = (v & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, rgb))
      } finally reader.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** PPM payload → top-down RGB raster. Unlike [[parsePpm]] (which sums
    * whatever clamped prefix of the raster arrived), resampling needs
    * every pixel: a truncated payload returns None to the stub path.
    */
  private[multimodal] def rasterPpm(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
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
      val n = w.toLong * h * 3
      if (w <= 0 || h <= 0 || n > (64L << 20) || pos + n > p.length) None
      else Some((w, h, java.util.Arrays.copyOfRange(p, pos, pos + n.toInt)))
    }
  }

  /** Uncompressed 24-bit BMP payload → top-down RGB raster: rows are
    * stored bottom-up (or top-down when the declared height is
    * negative) in BGR order with 4-byte stride padding — all three
    * normalized away here so every container feeds [[boxResample]] the
    * same layout. Requires the complete raster (see [[rasterPpm]]).
    */
  private[multimodal] def rasterBmp(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u16(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
    def i32(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8) |
      ((p(at + 2) & 0xFF) << 16) | ((p(at + 3) & 0xFF) << 24)
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') None
    else {
      val off = i32(10)
      val hRaw = i32(22)
      val topDown = hRaw < 0
      val w = i32(18)
      val h = math.abs(hRaw)
      val rowBytes = w.toLong * 3
      val stride = ((rowBytes + 3) / 4) * 4
      if (u16(28) != 24 || i32(30) != 0 || w <= 0 || h <= 0 ||
        off < 54 || rowBytes * h > (64L << 20) ||
        off + stride * h > p.length) None
      else {
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val srcRow = off + (if (topDown) y else h - 1 - y).toLong * stride
          var x = 0
          while (x < w) {
            val src = (srcRow + x * 3).toInt; val dst = (y * w + x) * 3
            out(dst) = p(src + 2)     // R
            out(dst + 1) = p(src + 1) // G
            out(dst + 2) = p(src)     // B
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    }
  }

  /** PNG payload → top-down RGB raster ([[pngRecon]] core; greyscale
    * expands each sample to three channels, matching how getRGB
    * surfaces grey JPEGs). Requires every scanline (see [[rasterPpm]]).
    */
  private[multimodal] def rasterPng(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    pngRecon(p).flatMap { case (w, h, bpp, rows, recon) =>
      if (rows < h) None
      else if (bpp == 3) Some((w, h, recon))
      // the grey→RGB expansion is 3 bytes/pixel: pngRecon's 64 MiB cap
      // bounds the 1-byte/pixel inflate buffer, so without this check a
      // hostile greyscale IHDR just under the cap allocates 3x the
      // decompression-bomb budget here (rasterJpeg bounds the RETURNED
      // raster with max(3, bands) for exactly this reason)
      else if (3L * w * h > (64L << 20)) None
      else Some((w, h, {
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val v = recon(i)
          out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
          i += 1
        }
        out
      }))
    }

  /** Fit (w, h) inside a maxW×maxH box preserving aspect ratio, in
    * INTEGER rational arithmetic — a double scale factor turns
    * 8.0/24*24 into 7.999…, and floor of that into an off-by-one output
    * dimension. Never upscales.
    */
  private[multimodal] def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (maxW.toLong * h <= maxH.toLong * w)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Integer area-average box filter over a top-down RGB raster: output
    * pixel (ox, oy) averages the input block x ∈ [ox·w/ow, (ox+1)·w/ow)
    * × y ∈ [oy·h/oh, (oy+1)·h/oh) (floor division, truncated mean) per
    * channel. For exact-divisor scales every block is the same k×k tile
    * — closed-form recomputable, which is what the qm6 oracle pins;
    * non-divisor scales stay deterministic (blocks differ by one
    * row/column).
    */
  private[multimodal] def boxResample(w: Int, h: Int, rgb: Array[Byte],
      ow: Int, oh: Int): Array[Byte] = {
    require(ow >= 1 && ow <= w && oh >= 1 && oh <= h,
      s"box filter only downsamples: ${w}x$h -> ${ow}x$oh")
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      val y0 = (oy.toLong * h / oh).toInt
      val y1 = math.max(y0 + 1, ((oy + 1).toLong * h / oh).toInt)
      var ox = 0
      while (ox < ow) {
        val x0 = (ox.toLong * w / ow).toInt
        val x1 = math.max(x0 + 1, ((ox + 1).toLong * w / ow).toInt)
        val area = (y1 - y0) * (x1 - x0)
        var c = 0
        while (c < 3) {
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += rgb(((y * w + x) * 3) + c) & 0xFF; x += 1 }
            y += 1
          }
          out(((oy * ow + ox) * 3) + c) = (s / area).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Serialize an 8-bit RGB non-interlaced PNG: signature, IHDR, one
    * IDAT (zlib-deflated filtered scanlines), IEND — with real CRCs.
    * `filterOf(row)` picks each row's filter type (0-4), so fixtures
    * can force the decoder through every reconstruction path. Single
    * source of truth for the qm5 fixture generator and the spec
    * fixtures, like [[buildPcmWav]].
    */
  private[graft] def buildPng(w: Int, h: Int, pix: Int => Int,
      filterOf: Int => Int): Array[Byte] = {
    val bpp = 3
    val stride = w * bpp
    val raw = Array.tabulate(h * stride)(i => pix(i) & 0xFF)
    val filtered = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < h) {
      val f = filterOf(r)
      require(f >= 0 && f <= 4, s"invalid PNG filter type $f")
      filtered.write(f)
      var c = 0
      while (c < stride) {
        val x = raw(r * stride + c)
        val a = if (c >= bpp) raw(r * stride + c - bpp) else 0
        val b = if (r > 0) raw((r - 1) * stride + c) else 0
        val ul = if (r > 0 && c >= bpp) raw((r - 1) * stride + c - bpp) else 0
        val v = f match {
          case 0 => x
          case 1 => (x - a) & 0xFF
          case 2 => (x - b) & 0xFF
          case 3 => (x - (a + b) / 2) & 0xFF
          case 4 =>
            val pp = a + b - ul
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else ul
            (x - pred) & 0xFF
        }
        filtered.write(v)
        c += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered.toByteArray); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(id: String, body: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(be32(body.length), 0, 4)
      val idb = id.getBytes("US-ASCII")
      out.write(idb, 0, 4)
      out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32()
      crc.update(idb); crc.update(body)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def putBe32(at: Int, v: Int): Unit = (0 until 4).foreach(k =>
      ihdr(at + k) = ((v >> (8 * (3 - k))) & 0xFF).toByte)
    putBe32(0, w); putBe32(4, h)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit RGB
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
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
    * producing fixed-schema decoded features. PPM (P6), uncompressed
    * 24-bit BMP, PNG, and JPEG payloads are decoded for REAL
    * ([[parsePpm]] / [[parseBmp]] / [[parsePng]] / [[parseJpeg]] —
    * header dims + a sum over every raster (PNG:
    * filter-reconstructed; JPEG: JDK ImageIO DCT-decoded) byte,
    * `codec = "ppm"`/`"bmp"`/`"png"`/`"jpeg"`); everything else falls
    * back to the deterministic STUB a codec/model call would replace
    * (`codec = "stub"`, `pix_sum` null). The batch shape is the real
    * part either way: one decoder invocation per `batchSize` rows, not
    * per row.
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
              .orElse(parseBmp(payload).map(d => (d, "bmp")))
              .orElse(parsePng(payload).map(d => (d, "png")))
              .orElse(parseJpeg(payload).map(d => (d, "jpeg"))) match {
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

  /** Per-channel raster statistics — the normalization-stats stage a
    * vision pipeline runs after decode (channel means for whitening,
    * per-image dynamic range). Decodes to a top-down RGB raster via the
    * raster parsers and emits per-channel byte sums plus the global
    * min/max; payloads no parser accepts keep the stub contract
    * (null stats, `codec = "stub"`). Channel sums are sensitive to the
    * container's channel ORDER — BMP stores BGR bottom-up — so a green
    * row pins the decoder's channel mapping, which qm2's order-blind
    * whole-raster sum cannot see. Batched like every decode stage.
    */
  def channelStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            rasterPpm(payload).map(r => (r, "ppm"))
              .orElse(rasterBmp(payload).map(r => (r, "bmp")))
              .orElse(rasterPng(payload).map(r => (r, "png")))
              .orElse(rasterJpeg(payload).map(r => (r, "jpeg"))) match {
              case Some(((w, h, rgb), codec)) =>
                val sums = new Array[Long](3)
                var mn = 255
                var mx = 0
                var i = 0
                while (i < rgb.length) {
                  val v = rgb(i) & 0xFF
                  sums(i % 3) += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                (id, w, h, Some(sums(0)), Some(sums(1)), Some(sums(2)),
                  Some(mn), Some(mx), codec)
              case None =>
                val len = if (payload == null) 0 else payload.length
                val fakeW = 16 + (math.abs(len) % 64)
                (id, fakeW, fakeW / 2, None: Option[Long],
                  None: Option[Long], None: Option[Long],
                  None: Option[Int], None: Option[Int], "stub")
            }
          }
        }
      }
      .toDF("media_id", "ch_width", "ch_height", "r_sum", "g_sum", "b_sum",
        "px_min", "px_max", "codec")
    media.join(out, "media_id")
  }

  /** Skew-safe partitioning for a decode stage: salt by content hash so
    * one giant file class (e.g. all 4K videos on one key) cannot pin a
    * single task at 100 TB.
    */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, abs(hash(col("media_id"), md5(col("bytes")))))

  /** REAL resize stage: decode the payload to an RGB raster
    * ([[rasterPpm]] / [[rasterBmp]] / [[rasterPng]] / [[rasterJpeg]]),
    * fit the decoded dims into the maxW×maxH box ([[fitDims]], integer
    * rational geometry), then resample with the integer area-average
    * box filter ([[boxResample]]) and sum every resampled byte — so a
    * green qm6 row is evidence of real resampled pixel data, not
    * geometry echo. Payloads no JDK codec can decode (mp3/video/…)
    * keep the stub contract a codec/model call would replace: the
    * deterministic fake dims of [[decodeStub]] fit into the box,
    * `resized_pix_sum` null, `codec = "stub"`. Batched per-partition
    * like every decode stage.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int,
      batchSize: Int = 64): DataFrame = {
    require(maxW >= 1 && maxH >= 1, "target box must be at least 1x1")
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // <-- a codec resampler would process `batch` here; the
          //     raster arms ARE that resampler for the containers this
          //     environment can decode
          batch.iterator.map { case (id, payload) =>
            rasterPpm(payload).map(d => (d, "ppm"))
              .orElse(rasterBmp(payload).map(d => (d, "bmp")))
              .orElse(rasterPng(payload).map(d => (d, "png")))
              .orElse(rasterJpeg(payload).map(d => (d, "jpeg"))) match {
              case Some(((w, h, rgb), codec)) =>
                val (ow, oh) = fitDims(w, h, maxW, maxH)
                val res = boxResample(w, h, rgb, ow, oh)
                var sum = 0L; var i = 0
                while (i < res.length) { sum += res(i) & 0xFF; i += 1 }
                (id, ow, oh, Some(sum), codec)
              case None =>
                val len = if (payload == null) 0 else payload.length
                val fakeW = 16 + (math.abs(len) % 64)
                val (ow, oh) = fitDims(fakeW, math.max(1, fakeW / 2), maxW, maxH)
                (id, ow, oh, None: Option[Long], "stub")
            }
          }
        }
      }.toDF("media_id", "resized_width", "resized_height",
        "resized_pix_sum", "codec")
    media.join(out, "media_id")
  }

  /** 64-bit average-hash (aHash) image fingerprint: decode the payload
    * to RGB, area-average to an 8×8 grid ([[boxResample]] — the same
    * integer floor-division kernel qm6 oracles), take per-cell gray =
    * r+g+b, and set bit p iff gray_p is strictly above the grid mean
    * (compared exactly as `gray_p·64 > Σgray`, no division). The
    * classic perceptual fingerprint: brightness shifts move every
    * gray AND the mean together, so near-identical images land within
    * a few bits. Non-decodable or sub-8×8 payloads hash to null with
    * the stub codec contract. Batched per-partition like every decode
    * stage; output is 8 bytes/image however large the raster.
    */
  def aHash64(media: DataFrame, batchSize: Int = 64): DataFrame =
    media.join(aHashTable(media, batchSize), "media_id")

  /** The bare (media_id, ahash, codec) fingerprint table — what the
    * pairs path consumes directly: joining the payload columns back
    * ([[aHash64]]'s contract, matching the other decode stages) would
    * put an extra media scan + join under a consumer that only needs
    * 8 bytes/image.
    */
  private[graft] def aHashTable(media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val (code, codec) = aHashOf(payload)
            (id, code, codec)
          }
        }
      }.toDF("media_id", "ahash", "codec")
  }

  /** [[aHash64]]'s per-payload kernel — also the piece the streaming
    * ingest path calls directly (its typed map must carry the
    * event-time column, so it cannot use the DataFrame form's
    * join-back). Returns (code, codec); code is None for
    * non-decodable or sub-8×8 payloads.
    */
  private[graft] def aHashOf(payload: Array[Byte]): (Option[Long], String) =
    rasterPpm(payload).map(d => (d, "ppm"))
      .orElse(rasterBmp(payload).map(d => (d, "bmp")))
      .orElse(rasterPng(payload).map(d => (d, "png")))
      .orElse(rasterJpeg(payload).map(d => (d, "jpeg"))) match {
      case Some(((w, h, rgb), codec)) if w >= 8 && h >= 8 =>
        val res = boxResample(w, h, rgb, 8, 8)
        val grays = Array.tabulate(64) { p =>
          (res(p * 3) & 0xFF).toLong +
            (res(p * 3 + 1) & 0xFF) + (res(p * 3 + 2) & 0xFF)
        }
        val total = grays.sum
        var code = 0L
        var p = 0
        while (p < 64) {
          if (grays(p) * 64 > total) code |= 1L << p; p += 1
        }
        (Some(code), codec)
      case Some((_, codec)) => (None, codec)
      case None => (None, "stub")
    }

  /** Perceptual near-duplicate image pairs over [[aHash64]] codes via
    * 4×16-bit multi-index banding — the qd4/qs26 Hamming machinery
    * applied to the image modality. EXACT for `maxDist <= 3`: a pair
    * within Hamming 3 has its ≤3 differing bits spread over 4 bands,
    * so some band matches verbatim (pigeonhole) and the candidate
    * generator — a band-bucket equi-join, never all-pairs — cannot
    * miss it; verification is one `bit_count(xor)` popcount per
    * candidate. The hash table is persisted for its two self-join
    * sides (the qd7 double-subtree lesson); at lake scale the decode
    * runs once and 8 bytes/image flow through the join.
    */
  def imageDupPairs(media: DataFrame, maxDist: Int = 3,
      batchSize: Int = 64, maxBucket: Int = 0): DataFrame =
    hammingDupPairs(aHashTable(media, batchSize), maxDist, maxBucket)

  /** Near-dup pairs over [[audioHash64]] envelope fingerprints — same
    * banded-Hamming machinery, audio modality.
    */
  def audioDupPairs(media: DataFrame, maxDist: Int = 3,
      batchSize: Int = 64, maxBucket: Int = 0): DataFrame =
    hammingDupPairs(audioHashTable(media, batchSize), maxDist, maxBucket)

  /** Band-population audit over the 4×16-bit multi-index keys of a
    * fingerprint table — the qd13 treatment for the media modality:
    * one row per (band ordinal, 16-bit key) bucket with its member
    * count. A bucket holding B fingerprints emits B·(B−1)/2 candidate
    * pairs in [[hammingDupPairs]]' self-join, so the tail of this
    * histogram is exactly the clique mass a given `maxBucket` cap
    * would drop — the measurement the cap is chosen from. Real media
    * corpora make this tail fat (solid-color thumbnails, black frames,
    * silence all collapse to a handful of degenerate codes).
    */
  def hammingBandStats(fingerprinted: DataFrame): DataFrame =
    bandedKeys(fingerprinted)
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .select((col("band_key") % 4).cast("int").as("band"),
        shiftright(col("band_key"), 2).as("band_16bit_key"),
        col("n_docs"))

  /** One row per (fingerprint, band ordinal): `band_key` packs the
    * 16-bit band value and the band ordinal as `value*4 + b`, so a
    * single long column equi-joins candidates across all four bands
    * at once.
    */
  private def bandedKeys(fingerprinted: DataFrame): DataFrame =
    fingerprinted
      .filter(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash"),
        explode(array((0 until 4).map(b =>
          (shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL)) * 4 + b)
            .as(s"k$b")): _*)).as("band_key"))

  /** Banded-Hamming near-dup pairs over any 64-bit fingerprint column
    * `ahash` (null = unfingerprintable, dropped): 4×16-bit multi-index
    * candidates — EXACT for `maxDist <= 3` by pigeonhole — verified by
    * one popcount each. The hash table is persisted for its two
    * self-join sides (the qd7 double-subtree lesson: the upstream is a
    * decode pass worth running once).
    *
    * `maxBucket` (0 = unlimited) is the hot-bucket guard every banded
    * candidate generator in this repo carries
    * ([[graft.ops.Skew.capBuckets]] — aggregate + left_anti, never a
    * per-bucket window): band buckets holding more than `maxBucket`
    * fingerprints are dropped from candidate generation entirely,
    * because one degenerate code clique (solid-color images, silent
    * audio) otherwise turns the band self-join quadratic. Recall
    * trade, eyes open: a pair whose EVERY shared band bucket is
    * oversized is lost — choose the cap from
    * [[hammingBandStats]]' histogram.
    *
    * Cache lifecycle: the fingerprint table is persist()ed and feeds
    * both sides of the band self-join in the returned LAZY plan, so
    * this operator cannot unpersist it itself — the
    * [[graft.dedup.Dedup]] contract applies verbatim: the caller
    * releases it after its action(s) (`spark.catalog.clearCache()`,
    * what Bench does between queries); a long-lived session that
    * skips this accumulates one cached table per call.
    */
  def hammingDupPairs(fingerprinted: DataFrame, maxDist: Int,
      maxBucket: Int = 0): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4x16 banding is exact only for maxDist <= 3, got $maxDist")
    val hashed = fingerprinted
      .filter(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = graft.ops.Skew.capBuckets(
      bandedKeys(hashed), "band_key", maxBucket)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    cand.select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** PCM data-chunk extraction: [[parseWav]]'s chunk walk returning the
    * raw sample bytes instead of their sum — the decode entry the
    * audio fingerprint needs. Same untrusted-bytes clamping.
    */
  private[multimodal] def pcmWav(p: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (p == null || p.length < 44) return None
    def u16(at: Int): Int = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
    def u32(at: Int): Long = (p(at) & 0xFFL) | ((p(at + 1) & 0xFFL) << 8) |
      ((p(at + 2) & 0xFFL) << 16) | ((p(at + 3) & 0xFFL) << 24)
    def tag(at: Int): String = new String(p, at, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var pos = 12L
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[Array[Byte]] = None
      var nonPcm = false
      while (pos + 8 <= p.length && (fmt.isEmpty || data.isEmpty) && !nonPcm) {
        val id = tag(pos.toInt)
        val body = pos + 8
        val n = math.min(u32(pos.toInt + 4), p.length - body)
        if (id == "fmt " && n >= 16) {
          if (u16(body.toInt) == 1)
            fmt = Some((u16(body.toInt + 2), u32(body.toInt + 4).toInt,
              u16(body.toInt + 14)))
          else nonPcm = true
        } else if (id == "data") {
          data = Some(java.util.Arrays.copyOfRange(p, body.toInt,
            (body + n).toInt))
        }
        pos = body + n + (n % 2)
      }
      if (nonPcm) None
      else for { f <- fmt; d <- data } yield (f._1, f._2, f._3, d)
    }
  }

  /** 64-bit audio envelope fingerprint — [[aHash64]]'s recipe applied
    * to the time axis: decode PCM, split the interleaved sample stream
    * into 64 equal frames (floor boundaries, exact frames when the
    * count divides), per-frame energy = Σ|sample| (8-bit centered at
    * 128; 16-bit signed LE), and set bit f iff `e_f·64 > Σe` — the
    * exact integer above-mean compare, so a uniform gain change that
    * scales every frame energy together flips nothing. Sub-64-sample,
    * non-PCM, or unsupported-width (not 8/16-bit) payloads fingerprint
    * to null — [[pcmWav]] accepts any format-code-1 width (24/32-bit
    * PCM is valid WAV), but the envelope kernel only decodes 8/16-bit
    * samples; treating a wider stream as bytes would emit a garbage
    * fingerprint and fake dup candidates, so those widths take the
    * null contract instead.
    */
  def audioHash64(media: DataFrame, batchSize: Int = 64): DataFrame =
    media.join(audioHashTable(media, batchSize), "media_id")

  /** Bare (media_id, ahash, codec) envelope-fingerprint table — the
    * [[aHashTable]] treatment for the audio modality.
    */
  private[graft] def audioHashTable(media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            pcmWav(payload) match {
              case Some((_, _, bits, _)) if bits != 8 && bits != 16 =>
                (id, None: Option[Long], "wav")
              case Some((_, _, bits, data)) =>
                val n = if (bits == 16) data.length / 2 else data.length
                if (n < 64) (id, None: Option[Long], "wav")
                else {
                  val mag = new Array[Long](n)
                  var i = 0
                  if (bits == 16) {
                    while (i < n) {
                      val s = ((data(2 * i) & 0xFF) |
                        (data(2 * i + 1) << 8)).toShort
                      mag(i) = math.abs(s.toLong); i += 1
                    }
                  } else {
                    while (i < n) {
                      mag(i) = math.abs((data(i) & 0xFF) - 128).toLong; i += 1
                    }
                  }
                  val e = Array.tabulate(64) { f =>
                    val lo = (f.toLong * n / 64).toInt
                    val hi = ((f + 1).toLong * n / 64).toInt
                    var s = 0L; var j = lo
                    while (j < hi) { s += mag(j); j += 1 }
                    s
                  }
                  val total = e.sum
                  var code = 0L
                  var f = 0
                  while (f < 64) {
                    if (e(f) * 64 > total) code |= 1L << f; f += 1
                  }
                  (id, Some(code), "wav")
                }
              case None => (id, None: Option[Long], "stub")
            }
          }
        }
      }.toDF("media_id", "ahash", "codec")
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
