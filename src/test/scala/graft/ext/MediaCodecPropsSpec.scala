package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property fuzzing of the real media codecs: random sample streams and
  * pixel grids go through the byte-level encode + decode (driver-side —
  * the Dataset path is covered by MultimodalSpec and the round-trip
  * queries) and the decoded layout + statistics must equal a direct
  * Scala computation over the same inputs, for every generated shape —
  * stride padding, odd widths, extreme amplitudes, all-zero streams.
  */
class MediaCodecPropsSpec extends AnyFunSuite with Matchers {

  private def samplesOf(gen: Gen[List[Int]], seed: Long): List[Int] =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: WAV encode+decode reproduces exact amplitude statistics (60 cases)") {
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      n <- Gen.choose(1, 400)
      s <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-32768, 32767), // full range
        Gen.choose(-3, 3),         // sign-change + zero heavy
        Gen.const(0)))             // silence runs
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.oneOf(1, 2)
    } yield (s, rate, ch)
    for (seed <- 1L to 60L) {
      val (s, rate, ch) = gen.apply(Gen.Parameters.default, Seed(seed * 31L)).get
      val samples = if (ch == 2 && s.size % 2 == 1) s :+ 0 else s
      val f = dec.decode(Multimodal.MediaDoc(seed, "audio/wav",
        Multimodal.encodeWav(rate, ch, samples)))
      val n = samples.size
      withClue(s"seed=$seed n=$n rate=$rate ch=$ch: ") {
        f.width shouldBe rate
        f.height shouldBe ch
        f.n_frames shouldBe n / ch
        f.n_bytes shouldBe 44 + 2 * n
        val vs = samples.map(_ / 32768.0)
        f.feat0 shouldBe vs.sum / n +- 1e-12
        f.feat1 shouldBe math.sqrt(vs.map(v => v * v).sum / n) +- 1e-12
        // model zero-crossings exactly as documented: sign changes over
        // the interleaved stream, zeros skipped
        val signs = samples.map(v => Integer.signum(v)).filter(_ != 0)
        val crossings = signs.zip(signs.drop(1)).count { case (a, b) => a != b }
        f.feat2 shouldBe crossings.toDouble / n +- 1e-12
        f.feat3 shouldBe vs.map(math.abs).maxOption.getOrElse(0.0) +- 1e-12
      }
    }
  }

  test("property: BMP encode+decode reproduces exact channel means at every shape (60 cases)") {
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      w <- Gen.choose(1, 9) // widths 1..9 hit every stride-padding residue
      h <- Gen.choose(1, 9)
      px <- Gen.listOfN(w * h, for {
        b <- Gen.choose(0, 255); g <- Gen.choose(0, 255); r <- Gen.choose(0, 255)
      } yield (b, g, r))
    } yield (w, h, px)
    for (seed <- 1L to 60L) {
      val (w, h, px) = gen.apply(Gen.Parameters.default, Seed(seed * 37L)).get
      val f = dec.decode(Multimodal.MediaDoc(seed, "image/bmp",
        Multimodal.encodeBmp(w, h, px)))
      withClue(s"seed=$seed ${w}x$h: ") {
        f.width shouldBe w
        f.height shouldBe h
        f.n_frames shouldBe 1
        def mean(pick: ((Int, Int, Int)) => Int): Double =
          px.map(pick).sum.toDouble / px.size / 255.0
        f.feat0 shouldBe mean(_._1) +- 1e-12
        f.feat1 shouldBe mean(_._2) +- 1e-12
        f.feat2 shouldBe mean(_._3) +- 1e-12
        f.feat3 shouldBe (0.114 * f.feat0 + 0.587 * f.feat1 + 0.299 * f.feat2) +- 1e-12
      }
    }
  }

  test("property: PNG encode+decode is lossless — exact channel means at every shape (60 cases)") {
    // same generator as the BMP property, but the payload goes through a
    // real zlib-compressed PNG (ImageIO both ways) — losslessness is what
    // lets q_png_roundtrip be oracle-gated exactly
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 9)
      px <- Gen.listOfN(w * h, for {
        b <- Gen.choose(0, 255); g <- Gen.choose(0, 255); r <- Gen.choose(0, 255)
      } yield (b, g, r))
    } yield (w, h, px)
    for (seed <- 1L to 60L) {
      val (w, h, px) = gen.apply(Gen.Parameters.default, Seed(seed * 41L)).get
      val f = dec.decode(Multimodal.MediaDoc(seed, "image/png",
        Multimodal.encodePng(w, h, px)))
      withClue(s"seed=$seed ${w}x$h: ") {
        f.width shouldBe w
        f.height shouldBe h
        def mean(pick: ((Int, Int, Int)) => Int): Double =
          px.map(pick).sum.toDouble / px.size / 255.0
        f.feat0 shouldBe mean(_._1) +- 1e-12
        f.feat1 shouldBe mean(_._2) +- 1e-12
        f.feat2 shouldBe mean(_._3) +- 1e-12
      }
    }
  }

  test("property: truncating PNG/JPEG payloads fails loudly (structural container check, 40 cases)") {
    val dec = new Multimodal.MediaDecoder()
    val px = (0 until 16).map(i => (i * 13 % 256, i * 29 % 256, i * 53 % 256))
    val pngB = Multimodal.encodePng(4, 4, px)
    val jpgB = Multimodal.encodeJpeg(4, 4, px)
    for (seed <- 1L to 20L) {
      val cutP = (seed * 7 % (pngB.length - 1)).toInt + 1
      intercept[IllegalArgumentException] {
        dec.decode(Multimodal.MediaDoc(seed, "image/png", pngB.take(cutP)))
      }
      val cutJ = (seed * 11 % (jpgB.length - 1)).toInt + 1
      val t = jpgB.take(cutJ)
      // a cut landing right after an interior 0xFFD9 byte pair would pass
      // the EOI structural check by coincidence; every other cut must fail
      if (!(t.length >= 2 && (t(t.length - 2) & 0xff) == 0xff &&
          (t(t.length - 1) & 0xff) == 0xd9))
        intercept[IllegalArgumentException] {
          dec.decode(Multimodal.MediaDoc(seed, "image/jpeg", t))
        }
    }
  }

  test("property: nearest-neighbor resize through the PNG round-trip matches direct selection (40 cases)") {
    // the H10 pixel transform end-to-end: grid -> real PNG -> ImageIO
    // decode -> resizeNearest must equal selecting src(x*sw/dw, y*sh/dh)
    // from the ORIGINAL grid directly, for every shape
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      w <- Gen.choose(1, 9); h <- Gen.choose(1, 9)
      dw <- Gen.choose(1, 9); dh <- Gen.choose(1, 9)
      px <- Gen.listOfN(w * h, for {
        b <- Gen.choose(0, 255); g <- Gen.choose(0, 255); r <- Gen.choose(0, 255)
      } yield (b, g, r))
    } yield (w, h, dw, dh, px)
    for (seed <- 1L to 40L) {
      val (w, h, dw, dh, px) = gen.apply(Gen.Parameters.default, Seed(seed * 43L)).get
      val (rw, rh, argb) = dec.decodeImagePixels(Multimodal.MediaDoc(seed, "image/png",
        Multimodal.encodePng(w, h, px)))
      val out = Multimodal.resizeNearest(rw, rh, argb, dw, dh)
      withClue(s"seed=$seed ${w}x$h -> ${dw}x$dh: ") {
        (rw, rh) shouldBe ((w, h))
        out.length shouldBe dw * dh
        for (y <- 0 until dh; x <- 0 until dw) {
          val (b, g, r) = px(((y * h) / dh) * w + (x * w) / dw)
          val v = out(y * dw + x)
          (v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff) shouldBe ((b, g, r))
        }
      }
    }
  }

  test("property: decimation through the WAV round-trip keeps exactly every k-th sample (40 cases)") {
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      n <- Gen.choose(1, 300)
      k <- Gen.choose(1, 7)
      s <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield (k, s)
    for (seed <- 1L to 40L) {
      val (k, s) = gen.apply(Gen.Parameters.default, Seed(seed * 47L)).get
      val (_, _, samples) = dec.decodeWavSamples(Multimodal.MediaDoc(seed, "audio/wav",
        Multimodal.encodeWav(8000, 1, s)))
      val out = Multimodal.decimate(samples, k)
      withClue(s"seed=$seed n=${s.size} k=$k: ") {
        out.toSeq shouldBe s.zipWithIndex.collect {
          case (v, i) if i % k == 0 => v.toShort
        }
      }
    }
  }

  test("property: MP3 encode+frame-walk reproduces the exact stream census (60 cases)") {
    val dec = new Multimodal.MediaDecoder()
    val kbpsTable = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val gen = for {
      n <- Gen.choose(1, 40)
      ks <- Gen.listOfN(n, Gen.oneOf(kbpsTable))
      ch <- Gen.oneOf(1, 2)
    } yield (ks, ch)
    for (seed <- 1L to 60L) {
      val (ks, ch) = gen.apply(Gen.Parameters.default, Seed(seed * 53L)).get
      val f = dec.decode(Multimodal.MediaDoc(seed, "audio/mpeg",
        Multimodal.encodeMp3(ch, ks)))
      withClue(s"seed=$seed n=${ks.size} ch=$ch: ") {
        f.width shouldBe 44100
        f.height shouldBe ch
        f.n_frames shouldBe ks.size
        f.n_bytes shouldBe 30 + ks.map(k => 144 * k * 1000 / 44100).sum
        f.feat0 shouldBe ks.size * 1152.0 / 44100 +- 1e-12
        f.feat1 shouldBe ks.sum.toDouble / ks.size +- 1e-9
        f.feat2 shouldBe (if (ks.distinct.size > 1) 1.0 else 0.0)
        f.feat3 shouldBe ks.max.toDouble
      }
    }
  }

  test("property: truncating an MP3 anywhere throws or parses the exact frame prefix (40 cases)") {
    // a cut exactly on a frame boundary IS a structurally valid shorter
    // stream (a frame prefix) — the walk must report exactly the frames
    // before the cut; any other cut must fail loudly, never mis-census
    val dec = new Multimodal.MediaDecoder()
    val ks = Seq(128, 192, 64, 320, 128)
    val full = Multimodal.encodeMp3(2, ks)
    val boundaries = ks.scanLeft(30)((p, k) => p + 144 * k * 1000 / 44100).toVector
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 131) % (full.length - 1)).toInt
      val t = full.take(cut)
      withClue(s"seed=$seed cut=$cut: ") {
        if (boundaries.contains(cut) && cut > 30)
          dec.decode(Multimodal.MediaDoc(seed, "audio/mpeg", t))
            .n_frames shouldBe boundaries.indexOf(cut)
        else intercept[IllegalArgumentException] {
          dec.decode(Multimodal.MediaDoc(seed, "audio/mpeg", t))
        }
      }
    }
  }

  test("property: H.264 encode+parse reproduces dimensions and census at every shape (60 cases)") {
    // wide mb ranges exercise long Exp-Golomb codes (and with them the
    // zero-heavy bitstreams emulation prevention exists for)
    val dec = new Multimodal.MediaDecoder()
    val gen = for {
      wm <- Gen.choose(1, 300); hm <- Gen.choose(1, 200)
      cr <- Gen.choose(0, 7); cb <- Gen.choose(0, 7)
      ns <- Gen.choose(0, 40); ev <- Gen.choose(1, 9)
    } yield (wm, hm, cr, cb, ns, ev)
    for (seed <- 1L to 60L) {
      val (wm, hm, cr, cb, ns, ev) =
        gen.apply(Gen.Parameters.default, Seed(seed * 59L)).get
      val f = dec.decode(Multimodal.MediaDoc(seed, "video/h264",
        Multimodal.encodeH264(wm, hm, cr, cb, ns, ev)))
      withClue(s"seed=$seed ${wm}x$hm crop($cr,$cb) ns=$ns ev=$ev: ") {
        f.width shouldBe wm * 16 - 2 * cr
        f.height shouldBe hm * 16 - 2 * cb
        f.n_frames shouldBe ns
        f.feat0 shouldBe 66.0
        f.feat1 shouldBe 30.0
        f.feat2 shouldBe ((ns + ev - 1) / ev).toDouble
        f.feat3 shouldBe (ns + 2).toDouble
      }
    }
  }

  test("property: truncating an H.264 stream throws or yields a clean NAL prefix (40 cases)") {
    // header parsing must never silently corrupt: a successful parse of a
    // truncated stream means the SPS fields were fully inside the kept
    // prefix (so they are EXACT) and the NAL census only shrank
    val dec = new Multimodal.MediaDecoder()
    val full = Multimodal.encodeH264(11, 7, 2, 1, 9, 3)
    val ref = dec.decode(Multimodal.MediaDoc(0L, "video/h264", full))
    for (seed <- 1L to 40L) {
      val cut = 5 + ((seed * 97) % (full.length - 5)).toInt
      withClue(s"seed=$seed cut=$cut: ") {
        try {
          val f = dec.decode(Multimodal.MediaDoc(seed, "video/h264", full.take(cut)))
          f.width shouldBe ref.width
          f.height shouldBe ref.height
          f.feat0 shouldBe 66.0
          f.feat1 shouldBe 30.0
          f.n_frames should be <= ref.n_frames
        } catch { case _: IllegalArgumentException => () }
      }
    }
  }

  test("property: JPEG encode+marker-walk reproduces the structure at every shape (40 cases)") {
    val gen = for {
      w <- Gen.choose(1, 200); h <- Gen.choose(1, 150)
      gray <- Gen.oneOf(true, false); prog <- Gen.oneOf(true, false)
      exif <- Gen.oneOf(true, false)
    } yield (w, h, gray, prog, exif)
    for (seed <- 1L to 40L) {
      val (w, h, gray, prog, exif) =
        gen.apply(Gen.Parameters.default, Seed(seed * 83L)).get
      val enc0 = Multimodal.encodeJpegStream(w, h, gray, prog, seed)
      val enc = if (exif) Multimodal.withExifApp1(enc0) else enc0
      val m = Multimodal.parseJpegMeta(seed, enc)
      withClue(s"seed=$seed ${w}x$h gray=$gray prog=$prog exif=$exif: ") {
        m.width shouldBe w
        m.height shouldBe h
        m.bitDepth shouldBe 8
        m.nComponents shouldBe (if (gray) 1 else 3)
        m.progressive shouldBe prog
        m.hasExif shouldBe exif
        m.nSegments should be >= 5 // SOI, DQT, SOF, SOS, EOI at minimum
      }
    }
  }

  test("property: truncating a JPEG anywhere fails loudly, never mis-parses (40 cases)") {
    // the stream has no valid prefix: every marker segment is
    // length-prefixed and the walk must reach EOI, so ANY truncation
    // (even inside entropy data, which can never contain a bare FFD9)
    // throws with a byte offset instead of returning partial structure
    val full = Multimodal.withExifApp1(
      Multimodal.encodeJpegStream(40, 30, gray = false, progressive = true, seed = 7L))
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 131) % (full.length - 1)).toInt
      withClue(s"seed=$seed cut=$cut: ") {
        intercept[IllegalArgumentException] {
          Multimodal.parseJpegMeta(seed, full.take(cut))
        }.getMessage should include("JPEG parse at byte")
      }
    }
  }

  test("property: truncating an encoded payload anywhere fails loudly, never mis-decodes (40 cases)") {
    val dec = new Multimodal.MediaDecoder()
    for (seed <- 1L to 20L) {
      val s = samplesOf(Gen.listOfN(16, Gen.choose(-100, 100)), seed)
      val wavB = Multimodal.encodeWav(8000, 1, s)
      val cut = 12 + (seed % (wavB.length - 12)).toInt
      intercept[IllegalArgumentException] {
        dec.decode(Multimodal.MediaDoc(seed, "audio/wav", wavB.take(cut)))
      }
      val bmpB = Multimodal.encodeBmp(2, 2, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)))
      val cutB = (seed % bmpB.length).toInt
      intercept[IllegalArgumentException] {
        dec.decode(Multimodal.MediaDoc(seed, "image/bmp", bmpB.take(cutB)))
      }
    }
  }
}
