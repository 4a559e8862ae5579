package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The r11 codec additions: the real GIF89a LZW codec + block walk
  * (Gif.scala), the FLAC metadata walk + STREAMINFO bit parse
  * (Flac.scala), and the dHash image near-dedup built on them
  * (ImageDedup.scala). Property fuzzing follows MediaCodecPropsSpec's
  * pattern; the GIF compressor is additionally CROSS-validated against
  * the JDK's own independent ImageIO GIF implementation in both
  * directions (our encode → ImageIO decode; ImageIO encode → our
  * decode), which pins spec compliance, not just self-consistency.
  */
class GifFlacSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- LZW -------------------------------------------------------------------

  test("property: GIF LZW round-trips at every palette width, incl. dictionary reset (60 cases)") {
    val g = for {
      min <- Gen.choose(2, 8)
      n <- Gen.oneOf(Gen.choose(0, 300), Gen.choose(4000, 9000)) // short + past-4096-reset
      idx <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0, 1),          // run-heavy (deep dictionary chains)
        Gen.const(0),              // constant run (KwKwK territory)
        Gen.choose(0, Int.MaxValue))) // full palette range, masked below
    } yield (min, idx)
    for (seed <- 1L to 60L) {
      val (min, idxRaw) = gen(g, seed * 61L)
      val idx = idxRaw.map(v => math.floorMod(v, 1 << min)).toArray
      val enc = Gif.lzwEncode(min, idx)
      val dec = Gif.lzwDecode(min, enc, idx.length,
        why => fail(s"seed=$seed min=$min n=${idx.length}: $why"))
      withClue(s"seed=$seed min=$min n=${idx.length}: ") {
        dec.toSeq shouldBe idx.toSeq
      }
    }
  }

  test("LZW KwKwK: the pathological aaaa... stream round-trips") {
    for (n <- Seq(1, 2, 3, 7, 100, 5000)) {
      val idx = Array.fill(n)(1)
      val dec = Gif.lzwDecode(2, Gif.lzwEncode(2, idx), n, fail(_))
      dec.toSeq shouldBe idx.toSeq
    }
  }

  // ---- container round trip ---------------------------------------------------

  test("property: GIF encode+parse round-trips frames, delays, palette mapping (40 cases)") {
    val g = for {
      w <- Gen.choose(1, 9); h <- Gen.choose(1, 9)
      nf <- Gen.choose(1, 5)
      palSize <- Gen.choose(2, 16)
      pal <- Gen.listOfN(palSize, Gen.choose(0, 0xffffff))
      frames <- Gen.listOfN(nf, for {
        d <- Gen.choose(0, 500)
        px <- Gen.listOfN(w * h, Gen.choose(0, palSize - 1))
      } yield (d, px))
      loop <- Gen.oneOf(true, false)
    } yield (w, h, pal, frames, loop)
    for (seed <- 1L to 40L) {
      val (w, h, pal, frames, loop) = gen(g, seed * 67L)
      val b = Gif.encodeGif(w, h, pal.toIndexedSeq,
        frames.map { case (d, px) => (d, px.toArray) }, loop,
        comment = if (seed % 2 == 0) Some("fuzz " * seed.toInt) else None)
      val a = Gif.parseGif(seed, b)
      withClue(s"seed=$seed ${w}x$h nf=${frames.size} pal=${pal.size}: ") {
        a.width shouldBe w
        a.height shouldBe h
        a.looped shouldBe loop
        a.frames.size shouldBe frames.size
        a.frames.zip(frames).foreach { case (got, (d, px)) =>
          got.delayCs shouldBe d
          got.rgb.toSeq shouldBe px.map(pal(_))
        }
      }
    }
  }

  test("property: truncating a GIF anywhere fails loudly with a byte offset (40 cases)") {
    val pal = IndexedSeq.tabulate(16)(i => i * 0x111111)
    val full = Gif.encodeGif(4, 3, pal,
      Seq((10, Array.tabulate(12)(_ % 16)), (20, Array.tabulate(12)(i => (i * 7) % 16))))
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 131) % (full.length - 1)).toInt
      withClue(s"seed=$seed cut=$cut: ") {
        intercept[IllegalArgumentException] {
          Gif.parseGif(seed, full.take(cut))
        }.getMessage should include("GIF parse at byte")
      }
    }
  }

  test("malformed GIFs fail loudly: zero-area frame, pixel overflow after a mid-stream clear") {
    // zero-area image descriptor: single-frame encode (no loop/comment)
    // puts the descriptor at byte 69 — patch its width field to 0
    val b = Gif.encodeGif(3, 2, Gif.Palette,
      Seq((0, Array.tabulate(6)(_ % 16))), loop = false)
    (b(69) & 0xff) shouldBe 0x2c // layout guard: introducer where expected
    val patched = b.clone()
    patched(74) = 0; patched(75) = 0
    intercept[IllegalArgumentException] {
      Gif.parseGif(1L, patched)
    }.getMessage should include("zero-area")
    // literal code arriving after the expected pixel count is full
    // (CLEAR resets prev, so the first-literal branch must also bound n):
    // codes [clear, 0, clear, 0, eoi] at minCode=2 → 3-bit LSB packing
    def pack(codes: Seq[Int], size: Int): Array[Byte] = {
      var (buf, cnt) = (0L, 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      codes.foreach { c =>
        buf |= c.toLong << cnt; cnt += size
        while (cnt >= 8) { out += (buf & 0xff).toByte; buf >>>= 8; cnt -= 8 }
      }
      if (cnt > 0) out += (buf & 0xff).toByte
      out.toArray
    }
    val overfull = pack(Seq(4, 0, 4, 0, 5), 3)
    intercept[IllegalArgumentException] {
      Gif.lzwDecode(2, overfull, 1,
        why => throw new IllegalArgumentException(why))
    }.getMessage should include("more than 1 pixels")
  }

  // ---- cross-validation against the JDK's independent GIF implementation ------

  test("cross-check: our GIF encode decodes identically under ImageIO (20 cases)") {
    val g = for {
      w <- Gen.choose(1, 8); h <- Gen.choose(1, 8)
      nf <- Gen.choose(1, 4)
      frames <- Gen.listOfN(nf, Gen.listOfN(w * h, Gen.choose(0, 15)))
    } yield (w, h, frames)
    for (seed <- 1L to 20L) {
      val (w, h, frames) = gen(g, seed * 71L)
      val b = Gif.encodeGif(w, h, Gif.Palette,
        frames.zipWithIndex.map { case (px, i) => (i + 1, px.toArray) })
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      withClue(s"seed=$seed ${w}x$h nf=${frames.size}: ") {
        reader.getNumImages(true) shouldBe frames.size
        for ((px, i) <- frames.zipWithIndex) {
          val img = reader.read(i)
          img.getWidth shouldBe w
          img.getHeight shouldBe h
          for (y <- 0 until h; x <- 0 until w)
            withClue(s"frame $i px($x,$y): ") {
              (img.getRGB(x, y) & 0xffffff) shouldBe Gif.Palette(px(y * w + x))
            }
        }
      }
      reader.dispose()
    }
  }

  test("cross-check: an ImageIO-written GIF parses identically under our decoder (10 cases)") {
    for (seed <- 1L to 10L) {
      val (w, h) = (1 + (seed % 7).toInt, 1 + (seed % 5).toInt)
      // indexed color model from our palette keeps the write lossless
      val cm = new java.awt.image.IndexColorModel(8, Gif.Palette.size,
        Gif.Palette.map(c => (c >> 16).toByte).toArray,
        Gif.Palette.map(c => ((c >> 8) & 0xff).toByte).toArray,
        Gif.Palette.map(c => (c & 0xff).toByte).toArray)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val px = Array.tabulate(w * h)(i => ((i * 7 + seed) % 16).toInt)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, Gif.Palette(px(y * w + x)) | 0xff000000)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", baos) shouldBe true
      val a = Gif.parseGif(seed, baos.toByteArray)
      withClue(s"seed=$seed ${w}x$h: ") {
        a.width shouldBe w
        a.height shouldBe h
        a.frames.size shouldBe 1
        a.frames.head.rgb.toSeq shouldBe px.map(Gif.Palette(_)).toSeq
      }
    }
  }

  // ---- FLAC -------------------------------------------------------------------

  test("property: FLAC encode+parse round-trips STREAMINFO bit fields (60 cases)") {
    val g = for {
      rate <- Gen.oneOf(Gen.choose(1, (1 << 20) - 1), Gen.oneOf(8000, 44100, 96000))
      ch <- Gen.choose(1, 8)
      bps <- Gen.choose(4, 32)
      total <- Gen.oneOf(Gen.choose(0L, (1L << 36) - 1), Gen.const(0L),
        Gen.const((1L << 36) - 1)) // boundary: all 36 bits set
      pad <- Gen.choose(0, 5)
      audio <- Gen.choose(0, 200)
    } yield (rate, ch, bps, total, pad, audio)
    for (seed <- 1L to 60L) {
      val (rate, ch, bps, total, pad, audio) = gen(g, seed * 73L)
      val m = Flac.parseFlac(seed,
        Flac.encodeFlac(rate, ch, bps, total, pad, audio))
      withClue(s"seed=$seed rate=$rate ch=$ch bps=$bps total=$total pad=$pad: ") {
        m.sampleRate shouldBe rate
        m.channels shouldBe ch
        m.bitsPerSample shouldBe bps
        m.totalSamples shouldBe total
        m.minBlock shouldBe 4096
        m.maxBlock shouldBe 4096
        m.nMetaBlocks shouldBe 1 + pad
        m.nPadding shouldBe pad
        m.audioBytes shouldBe audio
      }
    }
  }

  test("property: truncating FLAC metadata fails loudly; audio-region cuts only shrink it (40 cases)") {
    val full = Flac.encodeFlac(44100, 2, 16, 123456789L, nPadding = 2, audioBytes = 50)
    val metaLen = full.length - 50
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 127) % (full.length - 1)).toInt
      val t = full.take(cut)
      withClue(s"seed=$seed cut=$cut metaLen=$metaLen: ") {
        if (cut < metaLen)
          intercept[IllegalArgumentException] {
            Flac.parseFlac(seed, t)
          }.getMessage should include("FLAC parse at byte")
        else Flac.parseFlac(seed, t).audioBytes shouldBe cut - metaLen
      }
    }
  }

  // ---- WARC -------------------------------------------------------------------

  test("property: WARC member-per-record gzip round-trips payloads exactly (40 cases)") {
    val g = for {
      n <- Gen.choose(1, 12)
      recs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 600)
        body <- Gen.listOfN(len, Gen.choose(0, 255))
      } yield body.map(_.toByte).toArray)
    } yield recs
    for (seed <- 1L to 40L) {
      val payloads = gen(g, seed * 79L)
      val recs = payloads.zipWithIndex.map { case (p, i) =>
        (s"https://example.org/doc/$i", s"urn:doc:$i", p)
      }
      val parsed = Warc.parseWarc(seed, Warc.encodeWarc(recs))
      withClue(s"seed=$seed n=${recs.size}: ") {
        parsed.size shouldBe recs.size
        parsed.zip(recs).foreach { case (got, (uri, id, p)) =>
          got.uri shouldBe uri
          got.id shouldBe id
          got.contentLength shouldBe p.length
          got.payload.toSeq shouldBe p.toSeq
        }
        // offsets are strictly increasing and start at 0
        parsed.head.offset shouldBe 0L
        parsed.map(_.offset) shouldBe parsed.map(_.offset).sorted
      }
    }
  }

  test("WARC framing survives adversarial payloads (embedded WARC/1.0 lines, CRLFCRLF)") {
    // a delimiter-scanning reader would split these payloads; the
    // Content-Length framing must not
    val evil = Seq(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n",
      "\r\n\r\n\r\n\r\n",
      "Content-Length: 0\r\n\r\n")
      .zipWithIndex.map { case (s, i) =>
        (s"https://example.org/doc/$i", s"urn:doc:$i", s.getBytes("UTF-8"))
      }
    val parsed = Warc.parseWarc(0L, Warc.encodeWarc(evil))
    parsed.size shouldBe 3
    parsed.zip(evil).foreach { case (got, (_, _, p)) =>
      got.payload.toSeq shouldBe p.toSeq
    }
  }

  test("property: truncating a WARC file anywhere fails loudly (40 cases)") {
    val recs = (0 until 4).map(i =>
      (s"https://example.org/doc/$i", s"urn:doc:$i",
        (s"payload body $i " * 10).getBytes("UTF-8")))
    val full = Warc.encodeWarc(recs)
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 131) % (full.length - 1)).toInt
      withClue(s"seed=$seed cut=$cut: ") {
        // a cut INSIDE a gzip member corrupts the stream; a cut exactly on
        // a member boundary yields a shorter but well-formed file — the
        // parse must then return exactly the complete prefix records
        try {
          val parsed = Warc.parseWarc(seed, full.take(cut))
          parsed.size should be < recs.size
          parsed.zip(recs).foreach { case (got, (uri, _, p)) =>
            got.uri shouldBe uri
            got.payload.toSeq shouldBe p.toSeq
          }
        } catch { case e: IllegalArgumentException =>
          e.getMessage should (include("WARC") or include("gzip"))
        }
      }
    }
  }

  // ---- MP4 --------------------------------------------------------------------

  test("property: MP4 encode+box-walk reproduces the structure at every shape (60 cases)") {
    val g = for {
      ts <- Gen.choose(1L, 1000000L)
      dur <- Gen.choose(0L, 100000L)
      w <- Gen.choose(16, 4096); h <- Gen.choose(16, 2160)
      na <- Gen.choose(0, 5)
      lang <- Gen.oneOf("eng", "und", "fra", "deu", "zho")
      mb <- Gen.choose(0, 300)
      large <- Gen.oneOf(true, false)
    } yield (ts, dur, w, h, na, lang, mb, large)
    for (seed <- 1L to 60L) {
      val (ts, dur, w, h, na, lang, mb, large) = gen(g, seed * 89L)
      val m = Mp4.parseMp4(seed,
        Mp4.encodeMp4(ts, dur, w, h, na, lang, mb, large))
      withClue(s"seed=$seed ts=$ts ${w}x$h na=$na lang=$lang large=$large: ") {
        m.timescale shouldBe ts
        m.duration shouldBe dur
        m.nTracks shouldBe 1 + na
        m.nVideo shouldBe 1
        m.nAudio shouldBe na
        m.width shouldBe w
        m.height shouldBe h
        m.lang shouldBe lang
        m.nBoxes shouldBe 4 + 5 * (1 + na)
        m.mdatBytes shouldBe mb
      }
    }
  }

  test("property: truncating an MP4 anywhere fails loudly, never mis-walks (40 cases)") {
    val full = Mp4.encodeMp4(1000, 5000, 320, 240, nAudio = 2,
      lang = "eng", mdatBytes = 50, largeMdat = true)
    for (seed <- 1L to 40L) {
      val cut = 1 + ((seed * 131) % (full.length - 1)).toInt
      withClue(s"seed=$seed cut=$cut: ") {
        intercept[IllegalArgumentException] {
          Mp4.parseMp4(seed, full.take(cut))
        }.getMessage should include("MP4 parse at byte")
      }
    }
  }

  test("corrupting a LATER gzip member fails loudly (the GZIPInputStream silent-prefix trap)") {
    val recs = (0 until 3).map(i =>
      (s"https://example.org/doc/$i", s"urn:doc:$i", s"body $i".getBytes("UTF-8")))
    val full = Warc.encodeWarc(recs)
    // find the second member's header (gzip magic 1f 8b after offset 0)
    val m2 = (1 until full.length - 1).find(i =>
      (full(i) & 0xff) == 0x1f && (full(i + 1) & 0xff) == 0x8b).get
    // flip a bit in the second member's magic: a silent-prefix reader
    // returns record 0 only; the verified member walk must fail loudly
    val corrupt = full.clone()
    corrupt(m2) = 0x55
    intercept[IllegalArgumentException] {
      Warc.parseWarc(9L, corrupt)
    }.getMessage should include("gzip member")
    // trailing garbage after valid members must also fail, not vanish
    intercept[IllegalArgumentException] {
      Warc.parseWarc(9L, full ++ Array[Byte](1, 2, 3))
    }.getMessage should include("gzip member")
  }

  test("an undersized MP4 leaf box fails by name instead of reading sibling bytes") {
    val full = Mp4.encodeMp4(1000, 500, 320, 240, nAudio = 1,
      lang = "eng", mdatBytes = 4)
    // shrink the first hdlr box: find its fourcc and rewrite the size
    // field to 8 (empty body); the walk must fail loudly, not mis-census
    val i = (0 until full.length - 4).find(p =>
      new String(full, p, 4, "US-ASCII") == "hdlr").get
    val patched = full.clone()
    patched(i - 4) = 0; patched(i - 3) = 0; patched(i - 2) = 0; patched(i - 1) = 8
    val e = intercept[IllegalArgumentException] { Mp4.parseMp4(7L, patched) }
    e.getMessage should (include("'hdlr' body") or include("do not tile") or
      include("overruns"))
  }

  // ---- TAR --------------------------------------------------------------------

  test("property: ustar encode+parse round-trips names, payloads, offsets (40 cases)") {
    val g = for {
      n <- Gen.choose(1, 10)
      recs <- Gen.listOfN(n, for {
        len <- Gen.oneOf(Gen.choose(0, 1500), Gen.const(512), Gen.const(0))
        body <- Gen.listOfN(len, Gen.choose(0, 255))
      } yield body.map(_.toByte).toArray)
    } yield recs
    for (seed <- 1L to 40L) {
      val payloads = gen(g, seed * 97L)
      val entries = payloads.zipWithIndex.map { case (p, i) => (s"e$i.bin", p) }
      val parsed = Tar.parseTar(seed, Tar.encodeTar(entries))
      withClue(s"seed=$seed n=${entries.size}: ") {
        parsed.size shouldBe entries.size
        parsed.zip(entries).foreach { case (got, (name, p)) =>
          got.name shouldBe name
          got.payload.toSeq shouldBe p.toSeq
          got.dataOffset % 512 shouldBe 0
        }
      }
    }
  }

  test("property: corrupting any tar byte fails loudly or leaves the archive exact (40 cases)") {
    val entries = (0 until 3).map(i => (s"f$i.txt", (s"content $i " * 20).getBytes("UTF-8")))
    val full = Tar.encodeTar(entries)
    val ref = Tar.parseTar(0L, full)
    for (seed <- 1L to 40L) {
      val at = ((seed * 131) % full.length).toInt
      val corrupt = full.clone()
      corrupt(at) = (corrupt(at) ^ 0x55).toByte
      withClue(s"seed=$seed at=$at: ") {
        try {
          // a flip inside PAYLOAD or padding bytes cannot be detected by a
          // header walk (tar has no data checksum) — but the structure
          // must stay exact; a flip in any HEADER byte must fail loudly
          val got = Tar.parseTar(seed, corrupt)
          got.size shouldBe ref.size
          got.map(_.name) shouldBe ref.map(_.name)
          got.map(_.dataOffset) shouldBe ref.map(_.dataOffset)
        } catch { case e: IllegalArgumentException =>
          e.getMessage should include("TAR")
        }
      }
    }
  }

  test("cross-check: our tar extracts identically under GNU tar, and vice versa") {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toFile
    try {
      // direction 1: our encoder -> GNU tar extract
      val entries = (0 until 4).map(i =>
        (s"doc$i.txt", (s"payload $i with spark bytes " * (i + 1)).getBytes("UTF-8")))
      val ours = new java.io.File(dir, "ours.tar")
      java.nio.file.Files.write(ours.toPath, Tar.encodeTar(entries))
      val xd = new java.io.File(dir, "x"); xd.mkdir()
      (Seq("tar", "-xf", ours.getAbsolutePath, "-C", xd.getAbsolutePath).! ) shouldBe 0
      entries.foreach { case (name, p) =>
        java.nio.file.Files.readAllBytes(new java.io.File(xd, name).toPath)
          .toSeq shouldBe p.toSeq
      }
      // direction 2: GNU tar create -> our parser
      val sd = new java.io.File(dir, "s"); sd.mkdir()
      entries.foreach { case (name, p) =>
        java.nio.file.Files.write(new java.io.File(sd, name).toPath, p)
      }
      val theirs = new java.io.File(dir, "theirs.tar")
      (Seq("tar", "--format=ustar", "-cf", theirs.getAbsolutePath,
        "-C", sd.getAbsolutePath) ++ entries.map(_._1)).! shouldBe 0
      val parsed = Tar.parseTar(0L, java.nio.file.Files.readAllBytes(theirs.toPath))
      parsed.map(_.name).sorted shouldBe entries.map(_._1).sorted
      parsed.foreach { e =>
        val want = entries.find(_._1 == e.name).get._2
        e.payload.toSeq shouldBe want.toSeq
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  // ---- the declared queries, end to end ----------------------------------------

  test("q_gif_anim: every user round-trips; sums match a direct recomputation") {
    val df = Gif.q_gif_anim.fn(spark, sf).collect()
    df.length should be > 0
    df.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      nf should be >= 1L
      r.getAs[Long]("n_sampled") shouldBe nf - nf / 2
      r.getAs[Long]("delay_total_cs") shouldBe 3 * nf + nf * (nf - 1) / 2
      r.getAs[Int]("looped") shouldBe 1
      // channel identity: r+g per pixel is 255 (palette construction)
      r.getAs[Long]("sum_r") + r.getAs[Long]("sum_g") shouldBe
        r.getAs[Long]("n_sampled") * 8 * 255
    }
  }

  test("q_flac_meta: fields equal their closed forms for every user") {
    val df = Flac.q_flac_meta.fn(spark, sf).collect()
    df.length should be > 0
    df.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      r.getAs[Long]("channels") shouldBe uid % 2 + 1
      r.getAs[Long]("n_meta_blocks") shouldBe 1 + uid % 3
      r.getAs[Long]("n_padding") shouldBe uid % 3
    }
  }

  test("q_gif_scene_cuts: cuts land exactly at scene boundaries with separated magnitudes") {
    val df = Gif.q_gif_scene_cuts.fn(spark, sf).collect()
    df.length should be > 0
    df.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      // scenes are two frames wide: transitions f->f+1 with f odd cut
      r.getAs[Long]("n_cuts") shouldBe (nf - 1) / 2
      if (nf >= 3) r.getAs[Long]("max_diff") should be >= 544L // across-scene floor
    }
  }

  test("q_audio_silence: run-length census is internally consistent and non-trivial") {
    val df = Multimodal.q_audio_silence.fn(spark, sf).collect()
    df.length should be > 0
    df.foreach { r =>
      val (n, silent, segs, longest) = (r.getAs[Long]("n_samples"),
        r.getAs[Long]("n_silent"), r.getAs[Long]("n_segments"),
        r.getAs[Long]("longest_run"))
      silent should be <= n
      segs should be <= silent
      longest should be <= silent
      if (silent > 0) { segs should be >= 1L; longest should be >= 1L }
      // every run is at most the longest, so segments x longest covers all
      silent should be <= segs * longest
    }
    df.map(_.getAs[Long]("n_segments")).sum should be > 0L
  }

  test("q_image_dhash_pairs: near-dup structure is cluster-shaped and thresholded") {
    val hashes = ImageDedup.hashesReal(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = ImageDedup.q_image_dhash_pairs.fn(spark, sf).collect()
    pairs.length should be > 0
    pairs.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      a should be < b
      d should be <= 14L
      // the reported distance IS the hash distance
      java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong shouldBe d
    }
    // planted structure: most verified pairs share the user_id%4 cluster
    val sameCluster = pairs.count(r => r.getLong(0) % 4 == r.getLong(1) % 4)
    sameCluster.toDouble / pairs.length should be >= 0.7
  }
}
