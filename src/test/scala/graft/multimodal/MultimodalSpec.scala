package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3)),
    (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)),
    (3L, "RIFF1234WAVEfmt ".getBytes("ASCII")),
    (4L, Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'm', 'p', '4', '2')),
    (5L, "not a media file".getBytes("ASCII")))
    .toDF("media_id", "bytes")

  test("magic-number format sniffing") {
    val m = media.select($"media_id", Multimodal.sniffFormat($"bytes").as("f"))
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "jpeg" && m(2L) == "png" && m(3L) == "wav" &&
      m(4L) == "mp4" && m(5L) == "unknown")
  }

  test("content stats give a stable dedup key") {
    val s = media.select($"media_id" +: Multimodal.contentStats($"bytes"): _*)
    val rows = s.as[(Long, Int, String)].collect()
    assert(rows.forall(_._3.length == 32))
    assert(rows.map(_._3).distinct.length == 5)
  }

  test("pseudo-embedding has model-encoder shape and is deterministic") {
    val e1 = media.select(Multimodal.pseudoEmbedding($"bytes", 8).as("e"))
      .as[Array[Float]].collect()
    val e2 = media.select(Multimodal.pseudoEmbedding($"bytes", 8).as("e"))
      .as[Array[Float]].collect()
    assert(e1.forall(_.length == 8))
    assert(e1.flatten.toSeq == e2.flatten.toSeq)
    assert(e1.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("decode stub preserves ids and emits the decoded schema") {
    val out = Multimodal.decodeStub(media, batchSize = 2)
    assert(out.count() == 5)
    assert(out.columns.contains("decoded_width") && out.columns.contains("decoded_bytes"))
    val r = out.filter($"media_id" === 3L)
      .select($"decoded_bytes").as[Long].head()
    assert(r == 16L)
  }

  test("decodeStub really decodes P6 PPM: header dims + full raster sum") {
    val px = Array.tabulate[Byte](12)(_.toByte) // 2x2 RGB, bytes 0..11
    val ppm = "P6\n# a netpbm comment\n2 2\n255\n".getBytes("ASCII") ++ px
    val df = Seq((10L, ppm), (11L, "nope".getBytes("ASCII")))
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeStub(df)
      .select($"media_id", $"codec", $"decoded_width", $"decoded_height",
        $"decoded_bytes", $"pix_sum")
      .as[(Long, String, Int, Int, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(10L) == ((10L, "ppm", 2, 2, 12L, Some(66L))), out(10L))
    // non-PPM payloads keep the deterministic stub shape
    assert(out(11L)._2 == "stub" && out(11L)._6.isEmpty)
  }

  test("decodeStub really decodes 24-bit BMP and skips the row padding") {
    // 2x2 image: stride = 8, so each 6-byte row carries 2 pad bytes
    // (0xEE) that must NOT enter the sum
    val w = 2; val h = 2; val stride = 8
    val bmp = new Array[Byte](54 + stride * h)
    def putU16(at: Int, v: Int): Unit = {
      bmp(at) = (v & 0xFF).toByte; bmp(at + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putI32(at: Int, v: Int): Unit = (0 until 4).foreach(b =>
      bmp(at + b) = ((v >> (8 * b)) & 0xFF).toByte)
    bmp(0) = 'B'; bmp(1) = 'M'
    putI32(2, bmp.length); putI32(10, 54); putI32(14, 40)
    putI32(18, w); putI32(22, h); putU16(26, 1); putU16(28, 24)
    var v = 0
    for (r <- 0 until h; c <- 0 until stride) {
      bmp(54 + r * stride + c) =
        if (c < w * 3) { val x = v.toByte; v += 1; x } else 0xEE.toByte
    }
    val df = Seq((20L, bmp)).toDF("media_id", "bytes")
    val out = Multimodal.decodeStub(df)
      .select($"codec", $"decoded_width", $"decoded_height",
        $"decoded_bytes", $"pix_sum")
      .as[(String, Int, Int, Long, Option[Long])].head()
    assert(out == (("bmp", 2, 2, 12L, Some(66L))), out)
  }

  // one WAV writer for spec fixtures AND the qm4 fixture generator —
  // one byte layout, one source of truth
  private def wav(ch: Int, sr: Int, bits: Int, data: Array[Byte],
      junk: Boolean = false, fmtCode: Int = 1): Array[Byte] =
    Multimodal.buildPcmWav(ch, sr, bits, data, junk, fmtCode)

  test("decodeAudio really decodes RIFF PCM: fmt metadata + data-byte sum") {
    val data = Array.tabulate[Byte](12)(i => (i * 3).toByte) // sum = 198
    val df = Seq(
      (30L, wav(2, 16000, 16, data)),
      (31L, wav(1, 8000, 8, data, junk = true)), // chunk walk, not offset 44
      (32L, wav(1, 8000, 16, data, fmtCode = 3)), // IEEE-float: not PCM
      (33L, "not audio".getBytes("ASCII")))
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeAudio(df)
      .select($"media_id", $"codec", $"channels", $"sample_rate",
        $"bits_per_sample", $"n_data_bytes", $"sample_sum")
      .as[(Long, String, Int, Int, Int, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(30L) == ((30L, "wav", 2, 16000, 16, 12L, Some(198L))), out(30L))
    assert(out(31L) == ((31L, "wav", 1, 8000, 8, 12L, Some(198L))), out(31L))
    assert(out(32L)._2 == "stub" && out(32L)._7.isEmpty, out(32L))
    assert(out(33L)._2 == "stub" && out(33L)._7.isEmpty, out(33L))
  }

  test("parseWav clamps hostile declared chunk sizes to the payload") {
    val data = Array.fill[Byte](4)(1)
    val w = wav(1, 8000, 8, data)
    // corrupt the data chunk's declared size to u32 max — the sum must
    // clamp to the 4 real bytes instead of walking off the buffer
    val at = w.length - data.length - 4
    (0 until 4).foreach(k => w(at + k) = 0xFF.toByte)
    val r = Multimodal.parseWav(w)
    assert(r.exists { case (_, _, _, n, sum) => n == 4L && sum == 4L }, r)
  }

  test("decodeStub really decodes PNG: inflate + all five filter types") {
    // 3x5 RGB: rows cycle filters None/Sub/Up/Average/Paeth, so every
    // reconstruction path must be exercised to recover the raw pixels
    val w = 3; val h = 5
    def pix(i: Int): Int = (7 + i * 13) % 256
    val png = Multimodal.buildPng(w, h, pix, r => r % 5)
    val expectSum = (0 until w * h * 3).map(pix(_).toLong).sum
    val df = Seq((40L, png)).toDF("media_id", "bytes")
    val out = Multimodal.decodeStub(df)
      .select($"codec", $"decoded_width", $"decoded_height",
        $"decoded_bytes", $"pix_sum")
      .as[(String, Int, Int, Long, Option[Long])].head()
    assert(out == (("png", w, h, (w * h * 3).toLong, Some(expectSum))), out)
    // sanity: the payload carries the real PNG signature (sniffable)
    val sniffed = df.select(Multimodal.sniffFormat($"bytes")).as[String].head()
    assert(sniffed == "png", sniffed)
  }

  test("decodeStub really decodes JPEG via the JDK ImageIO codec") {
    // No SQL oracle is possible for DCT output (IDCT rounding is
    // implementation-defined), so the expectation is computed at
    // fixture-build time by an INDEPENDENT same-JVM ImageIO decode of
    // the encoded bytes — decodeStub must reproduce it through the
    // batched decode shape.
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 11 + y * 7) % 256) << 16) |
        (((x * 5 + y * 3) % 256) << 8) | ((x + y * 13) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val jpeg = baos.toByteArray
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    var expectSum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      expectSum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
    }
    // 51: carries the jpeg magic (sniffable) but is not a decodable
    // stream — must fall through to the stub, not throw
    val df = Seq((50L, jpeg),
      (51L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)))
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeStub(df)
      .select($"media_id", $"codec", $"decoded_width", $"decoded_height",
        $"decoded_bytes", $"pix_sum")
      .as[(Long, String, Int, Int, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(50L) == ((50L, "jpeg", w, h, (w * h * 3).toLong,
      Some(expectSum))), out(50L))
    assert(out(51L)._2 == "stub" && out(51L)._6.isEmpty)
  }

  test("parseJpeg rejects a decompression bomb from the header alone") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val huge = baos.toByteArray
    // patch the SOF0 frame header's declared dims to 60000x60000
    // (raster would be ~10.8 GB) — the header-first cap must reject
    // before the DCT decode allocates anything
    val sof = huge.indices.dropRight(8).find(i =>
      huge(i) == 0xFF.toByte && huge(i + 1) == 0xC0.toByte)
    assert(sof.isDefined, "no SOF0 marker in encoded fixture")
    val at = sof.get
    huge(at + 5) = 0xEA.toByte; huge(at + 6) = 0x60.toByte // height 60000
    huge(at + 7) = 0xEA.toByte; huge(at + 8) = 0x60.toByte // width 60000
    assert(Multimodal.parseJpeg(huge).isEmpty)
    // the unpatched fixture still decodes
    assert(Multimodal.parseJpeg(baos.toByteArray).nonEmpty)
  }

  test("parsePng survives truncated and hostile payloads") {
    val png = Multimodal.buildPng(4, 4, i => i % 256, _ => 4)
    // truncated mid-IDAT: decodes only the complete rows that arrived
    val cut = png.take(png.length - 20)
    Multimodal.parsePng(cut).foreach { case (_, _, n, _) =>
      assert(n <= 4L * 4 * 3, n)
    }
    // hostile declared dims: IHDR says 1e9x1e9 -> expected size cap
    // rejects instead of allocating
    val huge = png.clone()
    def putBe32(at: Int, v: Int): Unit = (0 until 4).foreach(k =>
      huge(at + k) = ((v >> (8 * (3 - k))) & 0xFF).toByte)
    putBe32(16, 1000000000); putBe32(20, 1000000000) // IHDR w/h at offset 16/20
    assert(Multimodal.parsePng(huge).isEmpty)
  }

  test("parseBmp clamps hostile declared dimensions to the payload") {
    // decodeStub runs over arbitrary lake bytes: a malformed header may
    // declare h near Int.MaxValue over a tiny payload (must not spin
    // ~2^31 empty row iterations) or a w where w*3 overflows Int.
    def hostile(w: Int, h: Int): Array[Byte] = {
      val bmp = new Array[Byte](62)
      def putU16(at: Int, v: Int): Unit = {
        bmp(at) = (v & 0xFF).toByte; bmp(at + 1) = ((v >> 8) & 0xFF).toByte
      }
      def putI32(at: Int, v: Int): Unit = (0 until 4).foreach(b =>
        bmp(at + b) = ((v >> (8 * b)) & 0xFF).toByte)
      bmp(0) = 'B'; bmp(1) = 'M'
      putI32(10, 54); putI32(18, w); putI32(22, h); putU16(28, 24)
      bmp
    }
    val t0 = System.nanoTime()
    val tall = Multimodal.parseBmp(hostile(2, Int.MaxValue))
    val wide = Multimodal.parseBmp(hostile(Int.MaxValue / 2, 1))
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "hostile header must not spin")
    // both parse (headers are structurally valid) but the walk is bounded
    // by the 8 payload bytes past the pixel offset
    assert(tall.exists { case (_, _, nPix, _) => nPix > 0 && nPix <= 8 }, tall)
    assert(wide.exists { case (_, _, nPix, _) => nPix > 0 && nPix <= 8 }, wide)
  }

  test("resize keeps the stub contract on non-decodable payloads") {
    val out = Multimodal.resize(media, maxW = 20, maxH = 12)
    assert(out.count() === 5)
    out.select($"codec", $"resized_width", $"resized_height",
        $"resized_pix_sum")
      .as[(String, Int, Int, Option[Long])].collect().foreach {
        case (codec, rw, rh, sum) =>
          assert(codec === "stub" && sum.isEmpty)
          assert(rw >= 1 && rw <= 20 && rh >= 1 && rh <= 12)
      }
  }

  test("resize really box-filters a PPM raster (hand-computed blocks)") {
    // 4x2 RGB, bytes 0..23; box 2x1 -> fitDims gives 2x1, k=2 blocks.
    // Block (0,0): ch sums 30/34/38 -> means 7/8/9; block (1,0):
    // 54/58/62 -> 13/14/15; total resampled sum 66.
    val ppm = "P6\n4 2\n255\n".getBytes("ASCII") ++
      Array.tabulate[Byte](24)(_.toByte)
    val out = Multimodal.resize(
        Seq((1L, ppm)).toDF("media_id", "bytes"), maxW = 2, maxH = 1)
      .select($"codec", $"resized_width", $"resized_height",
        $"resized_pix_sum")
      .as[(String, Int, Int, Option[Long])].head()
    assert(out === (("ppm", 2, 1, Some(66L))), out)
  }

  test("rasterBmp flips bottom-up BGR rows into a top-down RGB raster") {
    // logical image y0: (1,2,3),(4,5,6); y1: (7,8,9),(10,11,12) —
    // stored bottom-up (y1's row first) in BGR with 2 pad bytes/row
    val bmp = new Array[Byte](54 + 16)
    def putU16(at: Int, v: Int): Unit = {
      bmp(at) = (v & 0xFF).toByte; bmp(at + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putI32(at: Int, v: Int): Unit = (0 until 4).foreach(b =>
      bmp(at + b) = ((v >> (8 * b)) & 0xFF).toByte)
    bmp(0) = 'B'; bmp(1) = 'M'
    putI32(10, 54); putI32(14, 40); putI32(18, 2); putI32(22, 2)
    putU16(26, 1); putU16(28, 24)
    val rows = Array(Array(9, 8, 7, 12, 11, 10), Array(3, 2, 1, 6, 5, 4))
    for (r <- 0 to 1; c <- 0 until 6) bmp(54 + r * 8 + c) = rows(r)(c).toByte
    val got = Multimodal.rasterBmp(bmp)
    assert(got.exists(_._3.toSeq == (1 to 12).map(_.toByte)), got)
  }

  test("resize is container-invariant: same raster as PPM and PNG") {
    def pix(i: Int): Int = (i * 7) % 256
    val ppm = "P6\n8 4\n255\n".getBytes("ASCII") ++
      Array.tabulate[Byte](8 * 4 * 3)(i => pix(i).toByte)
    val png = Multimodal.buildPng(8, 4, pix, r => r % 5)
    val out = Multimodal.resize(
        Seq((1L, ppm), (2L, png)).toDF("media_id", "bytes"),
        maxW = 4, maxH = 4)
      .select($"media_id", $"codec", $"resized_width", $"resized_height",
        $"resized_pix_sum")
      .as[(Long, String, Int, Int, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "ppm" && out(2L)._2 === "png")
    assert(out(1L)._3 === 4 && out(1L)._4 === 2) // 8x4 into 4x4 box
    assert((out(1L)._3, out(1L)._4, out(1L)._5) ===
      ((out(2L)._3, out(2L)._4, out(2L)._5)))
    assert(out(1L)._5.nonEmpty)
  }

  test("channelStats resolves BMP's BGR order into true RGB channels") {
    // 1x1 BMP storing (B=10, G=20, R=30) at the file level: a decoder
    // that skipped the BGR->RGB swap would report r_sum=10/b_sum=30
    // and still pass any whole-raster sum check
    val bmp = new Array[Byte](54 + 4)
    def putU16(at: Int, v: Int): Unit = {
      bmp(at) = (v & 0xFF).toByte; bmp(at + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putI32(at: Int, v: Int): Unit = (0 until 4).foreach(b =>
      bmp(at + b) = ((v >> (8 * b)) & 0xFF).toByte)
    bmp(0) = 'B'; bmp(1) = 'M'
    putI32(10, 54); putI32(14, 40); putI32(18, 1); putI32(22, 1)
    putU16(26, 1); putU16(28, 24)
    bmp(54) = 10; bmp(55) = 20; bmp(56) = 30
    val ppm = "P6\n1 1\n255\n".getBytes("ASCII") ++
      Array[Byte](30, 20, 10) // same logical pixel, RGB container
    val out = Multimodal.channelStats(
        Seq((1L, bmp), (2L, ppm), (3L, Array[Byte](1, 2, 3)))
          .toDF("media_id", "bytes"))
      .select($"media_id", $"codec", $"r_sum", $"g_sum", $"b_sum",
        $"px_min", $"px_max")
      .as[(Long, String, Option[Long], Option[Long], Option[Long],
        Option[Int], Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "bmp", Some(30L), Some(20L), Some(10L),
      Some(10), Some(30))))
    assert(out(2L) === ((2L, "ppm", Some(30L), Some(20L), Some(10L),
      Some(10), Some(30))))
    assert(out(3L)._2 === "stub" && out(3L)._3.isEmpty)
  }

  test("frame sampling explodes to every-nth frame with ordinal + key") {
    val out = Multimodal.frameSampleStub(media, everyNth = 3)
    val byId = out.groupBy($"media_id")
      .agg(max($"n_frames").as("nf"), count(lit(1)).as("n"),
        countDistinct($"frame_key").as("dk"))
      .as[(Long, Int, Long, Long)].collect()
    assert(byId.length === 5)
    byId.foreach { case (_, nf, n, dk) =>
      assert(n === (nf + 2) / 3) // ceil(nf / 3): frames 0, 3, 6, ...
      assert(dk === n)           // one distinct key per sampled frame
    }
    // deterministic: same payload, same keys
    val again = Multimodal.frameSampleStub(media, everyNth = 3)
    assert(out.orderBy($"media_id", $"frame_index").collect().toSeq ===
      again.orderBy($"media_id", $"frame_index").collect().toSeq)
  }

  private def flatPpm(w: Int, h: Int, pix: Int => Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("ASCII") ++
      Array.tabulate[Byte](w * h * 3)(i => (pix(i) & 0xFF).toByte)

  test("aHash64: hand-computed bits, sign bit, and invariances") {
    // 8x8 image, left half bright (200) right half dark (10): bits =
    // exactly the 32 left-half cells (gray 600 vs mean ~305)
    def halfPix(i: Int): Int = if ((i / 3) % 8 < 4) 200 else 10
    val expectedHalf = (0 until 64).filter(p => p % 8 < 4)
      .foldLeft(0L)((acc, p) => acc | (1L << p))
    // bottom-right cell alone bright: only bit 63 -> negative long
    def cornerPix(i: Int): Int = if (i / 3 == 63) 255 else 0
    val df = Seq(
      (1L, flatPpm(8, 8, halfPix)),
      (2L, flatPpm(8, 8, cornerPix)),
      // same half image at 16x16 (each cell a 2x2 tile): box filter
      // must make the hash SCALE-invariant
      (3L, flatPpm(16, 16, i => if ((i / 3) % 16 < 8) 200 else 10)),
      // uniform +5 brightness, no saturation: gray and mean shift
      // together, zero bits flip
      (4L, flatPpm(8, 8, i => halfPix(i) + 5)),
      (5L, "not an image".getBytes("ASCII")))
      .toDF("media_id", "bytes")
    val out = Multimodal.aHash64(df)
      .select($"media_id", $"ahash", $"codec")
      .as[(Long, Option[Long], String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === Some(expectedHalf))
    assert(out(2L)._2 === Some(Long.MinValue)) // bit 63 only
    assert(out(3L)._2 === Some(expectedHalf), "aHash must be scale-invariant")
    assert(out(4L)._2 === Some(expectedHalf), "uniform brightness shift must not flip bits")
    assert(out(5L)._2.isEmpty && out(5L)._3 === "stub")
  }

  test("imageDupPairs: banded candidates find every pair within Hamming 3") {
    // base image + 1-cell flip (dist 2: one bit clears, mean moves no
    // bit) ... construct directly: three images whose hashes are known
    def halfPix(i: Int): Int = if ((i / 3) % 8 < 4) 200 else 10
    // flip cell 0 dark: bits lose position 0 -> dist 1 from base
    def flippedPix(i: Int): Int = if (i / 3 == 0) 10 else halfPix(i)
    // far image: checkerboard, many bits away from both
    def checkerPix(i: Int): Int =
      if (((i / 3) % 8 + (i / 3) / 8) % 2 == 0) 200 else 10
    val df = Seq(
      (1L, flatPpm(8, 8, halfPix)),
      (2L, flatPpm(8, 8, halfPix)),     // exact dup of 1
      (3L, flatPpm(8, 8, flippedPix)),  // near dup of 1/2
      (4L, flatPpm(8, 8, checkerPix)))  // unrelated
      .toDF("media_id", "bytes")
    val pairs = Multimodal.imageDupPairs(df, maxDist = 3)
      .select($"id_a", $"id_b", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    // exhaustive reference: every pair within dist 3 must be present
    val codes = Multimodal.aHash64(df).filter($"ahash".isNotNull)
      .select($"media_id", $"ahash").as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- codes.keys; b <- codes.keys if a < b
      d = java.lang.Long.bitCount(codes(a) ^ codes(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(pairs === expected)
    assert(pairs.contains((1L, 2L, 0)), "exact dup must surface at dist 0")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "1-cell edit must stay within the banded net")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
      "checkerboard is not a near-dup of anything")
    // the banding contract refuses distances it cannot guarantee
    intercept[IllegalArgumentException] {
      Multimodal.imageDupPairs(df, maxDist = 4)
    }
  }

  test("audioHash64: hand-computed envelope bits across both PCM widths") {
    // 64 8-bit samples (one per frame): first 32 loud (|255-128|=127),
    // last 32 silent at the 128 midpoint -> bits 0..31 exactly
    val loudQuiet8 = Array.tabulate[Byte](64)(i =>
      if (i < 32) 255.toByte else 128.toByte)
    // same envelope in 16-bit LE: +/-1000 vs 0
    val loudQuiet16 = new Array[Byte](128)
    (0 until 32).foreach { i =>
      loudQuiet16(2 * i) = (1000 & 0xFF).toByte
      loudQuiet16(2 * i + 1) = ((1000 >> 8) & 0xFF).toByte
    }
    val expected = (0 until 32).foldLeft(0L)((a, p) => a | (1L << p))
    val df = Seq(
      (1L, Multimodal.buildPcmWav(1, 8000, 8, loudQuiet8, junk = false)),
      (2L, Multimodal.buildPcmWav(1, 8000, 8, loudQuiet8, junk = true)),
      (3L, Multimodal.buildPcmWav(1, 8000, 16, loudQuiet16, junk = false)),
      (4L, Multimodal.buildPcmWav(1, 8000, 8, Array.fill[Byte](10)(0), junk = false)),
      (5L, "not audio".getBytes("ASCII")))
      .toDF("media_id", "bytes")
    val out = Multimodal.audioHash64(df)
      .select($"media_id", $"ahash", $"codec")
      .as[(Long, Option[Long], String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === Some(expected))
    assert(out(2L)._2 === Some(expected), "junk chunk must not change the fingerprint")
    assert(out(3L)._2 === Some(expected), "16-bit path must produce the same envelope")
    assert(out(4L)._2.isEmpty && out(4L)._3 === "wav", "sub-64-sample audio has no envelope")
    assert(out(5L)._2.isEmpty && out(5L)._3 === "stub")
    // audioDupPairs on the same table: 1,2,3 are mutual exact dups
    val pairs = Multimodal.audioDupPairs(df, maxDist = 3)
      .select($"id_a", $"id_b", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("audioHash64 fingerprints only 8/16-bit PCM; wider widths go null") {
    // 24/32-bit payloads are VALID format-code-1 WAV (pcmWav accepts
    // them) but the envelope kernel has no decode branch for them —
    // they must take the null contract, never a garbage fingerprint
    val bytes24 = Array.tabulate[Byte](64 * 3)(i => (i * 11 % 256).toByte)
    val bytes32 = Array.tabulate[Byte](64 * 4)(i => (i * 7 % 256).toByte)
    val df = Seq(
      (1L, Multimodal.buildPcmWav(1, 8000, 24, bytes24)),
      (2L, Multimodal.buildPcmWav(1, 8000, 32, bytes32)),
      (3L, Multimodal.buildPcmWav(1, 8000, 8,
        Array.tabulate[Byte](64)(i => if (i < 32) 255.toByte else 128.toByte))))
      .toDF("media_id", "bytes")
    val out = Multimodal.audioHash64(df)
      .select($"media_id", $"ahash", $"codec")
      .as[(Long, Option[Long], String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2.isEmpty && out(1L)._3 === "wav")
    assert(out(2L)._2.isEmpty && out(2L)._3 === "wav")
    assert(out(3L)._2.nonEmpty, "8-bit PCM still fingerprints")
  }

  test("hammingDupPairs maxBucket drops hot-band cliques; stats measure them") {
    // a 5-member identical-code clique (every band bucket holds 5) plus
    // a dist-1 pair whose codes share no band with the clique
    val c6 = 0x0001000200030004L
    val c7 = c6 ^ 1L // band 0 differs; bands 1-3 still match c6
    val fp = (Seq.tabulate(5)(i => (i + 1L, 0L)) ++
      Seq((6L, c6), (7L, c7)))
      .toDF("media_id", "ahash")
    val uncapped = Multimodal.hammingDupPairs(fp, maxDist = 3)
      .select($"id_a", $"id_b", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(uncapped.size === 11) // C(5,2) clique pairs + (6,7)
    val capped = Multimodal.hammingDupPairs(fp, maxDist = 3, maxBucket = 4)
      .select($"id_a", $"id_b", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(capped === Set((6L, 7L, 1)),
      "cap must drop exactly the hot-bucket clique, keep the cold pair")
    // the audit sees the clique's four size-5 buckets, the pair's three
    // shared size-2 buckets, and the two split band-0 singletons
    val hist = Multimodal.hammingBandStats(fp)
      .groupBy($"n_docs").count()
      .as[(Long, Long)].collect().toMap
    assert(hist === Map(5L -> 4L, 2L -> 3L, 1L -> 2L))
  }
}
