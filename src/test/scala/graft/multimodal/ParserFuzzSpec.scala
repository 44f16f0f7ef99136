package graft.multimodal

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz guardrail for the binary container parsers: [[Multimodal]]'s
  * decode stage runs them over arbitrary LAKE bytes, so on ANY input —
  * random noise, truncated real files, bit-flipped headers — they must
  * return (never throw), terminate promptly (no declared-size spins),
  * and never claim more decoded bytes than the payload holds. Pure
  * JVM-side (no SparkSession needed): seeds are fixed, runs are
  * deterministic.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val rnd = new Random(90210L)

  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  private def jpegSample(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def validSamples(): Seq[Array[Byte]] = {
    val px = Array.tabulate[Byte](12)(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val wav = Multimodal.buildPcmWav(2, 16000, 16,
      Array.tabulate[Byte](12)(i => (i * 3).toByte), junk = true)
    val bmp = new Array[Byte](54 + 16)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putI32(at: Int, v: Int): Unit = (0 until 4).foreach(k =>
      bmp(at + k) = ((v >> (8 * k)) & 0xFF).toByte)
    putI32(10, 54); putI32(18, 2); putI32(22, 2)
    bmp(28) = 24
    val png = Multimodal.buildPng(2, 2, i => i * 11, r => r % 5)
    Seq(ppm, wav, bmp, png, jpegSample())
  }

  test("the seed samples are genuinely valid (fuzz arms are non-vacuous)") {
    // if a future edit breaks a hand-built sample, every derived
    // truncation/corruption case silently degrades to noise-only
    // coverage — so pin that each sample parses in full
    val Seq(ppm, wavB, bmp, png, jpg) = validSamples()
    assert(Multimodal.parsePpm(ppm).exists(_._3 == 12L), "ppm sample invalid")
    assert(Multimodal.parseWav(wavB).exists(_._4 == 12L), "wav sample invalid")
    assert(Multimodal.parseBmp(bmp).exists(_._3 == 12L), "bmp sample invalid")
    assert(Multimodal.parsePng(png).exists(_._3 == 12L), "png sample invalid")
    assert(Multimodal.parseJpeg(jpg).exists(_._3 == 4L * 4 * 3), "jpeg sample invalid")
  }

  test("parsers never throw, spin, or over-claim on arbitrary bytes") {
    val cases: Seq[Array[Byte]] =
      // pure noise at assorted sizes (incl. the header-boundary sizes)
      Seq(0, 1, 2, 11, 12, 43, 44, 53, 54, 55, 200, 4096).map(randomBytes) ++
      // valid files truncated at every prefix length
      validSamples().flatMap(v => (0 to v.length).map(v.take)) ++
      // valid files with 200 random single-byte corruptions each
      validSamples().flatMap { v =>
        (1 to 200).map { _ =>
          val m = v.clone()
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          m
        }
      }
    val t0 = System.nanoTime()
    cases.foreach { p =>
      Multimodal.parsePpm(p).foreach { case (_, _, n, _) =>
        assert(n >= 0 && n <= p.length, s"ppm over-claims: $n of ${p.length}")
      }
      Multimodal.parseBmp(p).foreach { case (_, _, n, _) =>
        assert(n >= 0 && n <= p.length, s"bmp over-claims: $n of ${p.length}")
      }
      Multimodal.parseWav(p).foreach { case (_, _, _, n, _) =>
        assert(n >= 0 && n <= p.length, s"wav over-claims: $n of ${p.length}")
      }
      // png/jpeg decode COMPRESSED data, so the bound is the declared
      // raster size, not the payload length
      Multimodal.parsePng(p).foreach { case (w, h, n, _) =>
        assert(n >= 0 && n <= w.toLong * h * 3, s"png over-claims: $n of ${w}x$h")
      }
      Multimodal.parseJpeg(p).foreach { case (w, h, n, _) =>
        assert(n >= 0 && n <= w.toLong * h * 3, s"jpeg over-claims: $n of ${w}x$h")
      }
      Multimodal.pcmWav(p).foreach { case (_, _, _, d) =>
        assert(d.length <= p.length, s"pcmWav over-claims: ${d.length} of ${p.length}")
      }
      // the fingerprint kernels run the full decode+hash chain over
      // lake bytes — they must be total too
      Multimodal.aHashOf(p)
    }
    // ~900 payloads: a declared-size spin (the pre-r8 parseBmp bug ran
    // ~2^31 iterations on ONE hostile header) would blow far past this
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "parser fuzz too slow")
  }

  /** Hand-build a PNG from raw chunks (CRCs zeroed — parsePng skips
    * them), so hostile-header cases can set fields fuzzing can't reach:
    * random corruption of a valid file breaks the zlib FCHECK or the
    * IHDR validity gate long before these paths.
    */
  private def pngOf(chunks: (String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    chunks.foreach { case (id, body) =>
      (24 to 0 by -8).foreach(s => out.write((body.length >> s) & 0xFF))
      out.write(id.getBytes("US-ASCII"))
      out.write(body)
      out.write(Array[Byte](0, 0, 0, 0)) // CRC, unchecked
    }
    out.toByteArray
  }

  private def ihdr(w: Long, h: Long): Array[Byte] = {
    val b = new Array[Byte](13)
    (0 until 4).foreach(k => b(k) = ((w >> (24 - 8 * k)) & 0xFF).toByte)
    (0 until 4).foreach(k => b(4 + k) = ((h >> (24 - 8 * k)) & 0xFF).toByte)
    b(8) = 8; b(9) = 2 // depth 8, color RGB; compress/filter/interlace 0
    b
  }

  test("parsePng rejects a zlib FDICT (preset-dictionary) stream without spinning") {
    // zlib header 0x78 0x20: FDICT bit set, (0x78*256 + 0x20) % 31 == 0
    // so FCHECK passes; Inflater then returns 0 with needsDictionary()
    // and neither needsInput() nor finished() — a naive k==0 loop spins
    // forever on this single payload
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x42, 0x42)
    val png = pngOf("IHDR" -> ihdr(2, 2), "IDAT" -> fdict, "IEND" -> Array.empty)
    val t0 = System.nanoTime()
    assert(Multimodal.parsePng(png).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "FDICT stream spun the inflate loop")
  }

  test("parsePng rejects hostile IHDR dims whose raster size overflows Long") {
    // w = h = 2^31 - 1, bpp 3: h * (rowBytes + 1) ≈ 1.38e19 > Long.Max,
    // wrapping negative — a direct `expect > cap` compare passes and the
    // wrapped .toInt allocation throws NegativeArraySizeException
    val big = (1L << 31) - 1
    val deflated = Array[Byte](0x78, 0x01, 1, 4, 0, (0xFB).toByte, (0xFF).toByte, 9, 9, 9, 9)
    for ((w, h) <- Seq((big, big), (big, 3L), (3L, big), (1L << 30, 1L << 30))) {
      val png = pngOf("IHDR" -> ihdr(w, h), "IDAT" -> deflated, "IEND" -> Array.empty)
      assert(Multimodal.parsePng(png).isEmpty, s"${w}x$h must be rejected")
    }
  }
}
