package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Real animated-GIF (GIF89a) codec — both halves pure-JVM, no external
  * libraries: a spec-faithful LZW compressor/decompressor (LSB-first bit
  * packing, code-size growth, 4096-entry dictionary reset, deferred-clear
  * tolerance on the read side), the block walk (logical screen
  * descriptor, global color table, graphic-control / application /
  * comment extensions, image descriptors, trailer), and frame
  * compositing onto the logical-screen canvas. This upgrades H10's frame
  * sampling from synthesized frame lists to a REAL animated container:
  * [[q_gif_anim]] encodes each user's event stream as a real multi-frame
  * GIF, walks it back (real LZW decode, real GCE delay parse), samples
  * every 2nd frame, and re-integerizes channel sums for the DuckDB
  * oracle to recompute exactly — GIF is lossless, so the round trip
  * gates the compressor and decompressor bit-for-bit, the same contract
  * as `q_png_roundtrip` (reference analog: the asset pipeline's media
  * metadata pass; see SURVEY.md §2 H9/H10).
  *
  * The parser reads more than the canonical encoder writes — interlaced
  * frames (the 4-pass row reorder ImageIO's own writer emits by
  * default), local color tables, sub-canvas frames — because the decode
  * half must accept real-world files; genuinely unsupported features
  * (transparency, disposal modes 2/3) fail LOUDLY with the byte offset
  * and the named field instead of guessing — a silent best-effort decode
  * would poison a training set, the [[Multimodal.MediaDecoder]]
  * contract.
  *
  * Scale shape: one bounded per-user aggregation (events are already
  * user-keyed), one `mapPartitions` codec pass, zero further shuffles —
  * identical to the other codec round-trips; at 100 TB the codec work is
  * embarrassingly parallel over payload rows.
  */
object Gif {

  /** One decoded frame: its GCE delay (centiseconds) and the full
    * logical-screen canvas AFTER compositing, 0xRRGGBB per pixel.
    */
  final case class Frame(delayCs: Int, rgb: Array[Int])

  /** A parsed animation: dimensions, composited frames, the census of
    * non-image blocks walked (extensions incl. GCEs), and whether a
    * NETSCAPE loop extension was present.
    */
  final case class Anim(width: Int, height: Int, frames: Vector[Frame],
      nExtBlocks: Int, looped: Boolean)

  // ---- LZW (GIF variant) ----------------------------------------------------

  /** GIF-LZW compress palette indices. Code-size discipline mirrors the
    * spec's decoder exactly one step ahead (the encoder's table leads the
    * decoder's by one entry, so it grows the code size when the
    * just-assigned code reaches `1 << codeSize` — the decoder when its
    * NEXT free code does): emit at the current size, add, then grow; at
    * 4096 entries emit a CLEAR and reset, so a stream of any length
    * round-trips.
    */
  private[ext] def lzwEncode(minCode: Int, indices: Array[Int]): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8, s"minCode $minCode out of GIF range")
    val out = ArrayBuffer.empty[Byte]
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCode + 1
    val clear = 1 << minCode
    val eoi = clear + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out += (bitBuf & 0xff).toByte; bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val dict = new scala.collection.mutable.HashMap[Long, Int]
    var next = eoi + 1
    emit(clear)
    if (indices.nonEmpty) {
      var cur = indices(0)
      require(cur < clear, s"index $cur exceeds palette size ${1 << minCode}")
      var i = 1
      while (i < indices.length) {
        val k = indices(i)
        require(k < clear, s"index $k exceeds palette size ${1 << minCode}")
        val key = cur.toLong << 16 | k
        dict.get(key) match {
          case Some(c) => cur = c
          case None =>
            emit(cur)
            dict(key) = next
            next += 1
            if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
            if (next == 4096) { // table full: reset so growth stays bounded
              emit(clear)
              dict.clear()
              next = eoi + 1
              codeSize = minCode + 1
            }
            cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) out += (bitBuf & 0xff).toByte
    out.toArray
  }

  /** GIF-LZW decompress to exactly `expected` indices. Tolerates the
    * deferred-clear convention (a full table simply freezes until the
    * encoder sends CLEAR — ImageIO's writer does this), fails loudly on
    * out-of-range codes, missing EOI, or a pixel-count mismatch.
    */
  private[ext] def lzwDecode(minCode: Int, data: Array[Byte], expected: Int,
      fail: String => Nothing): Array[Int] = {
    if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode out of range")
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](expected)
    var n = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    // expand `code` into out (codes chain suffix-first; literals < clear)
    val stack = new Array[Int](4097)
    def expand(code: Int): Int = {
      var c = code
      var sp = 0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      if (n + sp + 1 > expected) fail(s"LZW emits more than $expected pixels")
      out(n) = c; n += 1
      while (sp > 0) { sp -= 1; out(n) = stack(sp); n += 1 }
      first
    }
    var done = false
    while (!done) {
      while (bitCnt < codeSize) {
        if (pos >= data.length) fail("LZW stream ends before EOI")
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      if (code == clear) {
        codeSize = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) fail(s"first LZW code $code after clear is not a literal")
        if (n >= expected) fail(s"LZW emits more than $expected pixels")
        out(n) = code; n += 1
        prev = code
      } else {
        val first =
          if (code < next && code != clear && code != eoi) expand(code)
          else if (code == next && next < 4096) { // KwKwK
            var c = prev
            while (c >= clear) c = prefix(c)
            // entry(prev) ++ firstChar(prev): expand prev then append c
            expand(prev)
            if (n + 1 > expected) fail(s"LZW emits more than $expected pixels")
            out(n) = c; n += 1
            c
          } else fail(s"LZW code $code beyond table size $next")
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          // deferred clear: at 4096 the table freezes until CLEAR arrives
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (n != expected) fail(s"LZW decoded $n pixels, image declares $expected")
    out
  }

  // ---- container encode ------------------------------------------------------

  private def u16le(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
  }

  /** Wrap raw LZW bytes into length-prefixed sub-blocks + terminator. */
  private def subBlocks(out: ArrayBuffer[Byte], data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out += len.toByte
      out ++= data.slice(off, off + len)
      off += len
    }
    out += 0
  }

  /** Canonical GIF89a encode: one global color table, full-canvas
    * non-interlaced frames, a GCE per frame carrying its delay, an
    * optional NETSCAPE loop extension and a comment extension (both
    * exercise the parser's generic sub-block skip). `palette` must have
    * 2..256 entries of 0xRRGGBB; every frame is `width*height` indices.
    */
  def encodeGif(width: Int, height: Int, palette: IndexedSeq[Int],
      frames: Seq[(Int, Array[Int])], loop: Boolean = true,
      comment: Option[String] = None): Array[Byte] = {
    require(palette.size >= 2 && palette.size <= 256, s"palette size ${palette.size}")
    require(frames.nonEmpty, "GIF needs at least one frame")
    var gctBits = 0 // GCT size = 2^(bits+1) >= palette size
    while ((2 << gctBits) < palette.size) gctBits += 1
    val gctSize = 2 << gctBits
    val minCode = math.max(2, gctBits + 1)
    val out = ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    u16le(out, width); u16le(out, height)
    out += (0x80 | (gctBits << 4) | gctBits).toByte // GCT present, color res
    out += 0 // background color index
    out += 0 // pixel aspect ratio
    for (i <- 0 until gctSize) {
      val c = if (i < palette.size) palette(i) else 0
      out += ((c >> 16) & 0xff).toByte
      out += ((c >> 8) & 0xff).toByte
      out += (c & 0xff).toByte
    }
    if (loop) { // NETSCAPE2.0 application extension: loop forever
      out += 0x21; out += 0xff.toByte; out += 11
      out ++= "NETSCAPE2.0".getBytes("US-ASCII")
      out += 3; out += 1; u16le(out, 0); out += 0
    }
    comment.foreach { c =>
      out += 0x21; out += 0xfe.toByte
      subBlocks(out, c.getBytes("US-ASCII"))
    }
    for ((delayCs, px) <- frames) {
      require(px.length == width * height,
        s"frame has ${px.length} pixels, canvas is ${width}x$height")
      // GCE: disposal 1 (leave in place), no transparency
      out += 0x21; out += 0xf9.toByte; out += 4
      out += 0x04 // disposal = 1 (do not dispose)
      u16le(out, delayCs)
      out += 0 // transparent index (unused: flag clear)
      out += 0
      // image descriptor: full canvas, no LCT, not interlaced
      out += 0x2c
      u16le(out, 0); u16le(out, 0); u16le(out, width); u16le(out, height)
      out += 0
      out += minCode.toByte
      subBlocks(out, lzwEncode(minCode, px))
    }
    out += 0x3b
    out.toArray
  }

  // ---- container decode ------------------------------------------------------

  /** Parse + fully decode an animated GIF: real LZW, palette mapping,
    * frame compositing (disposal none/keep only). Fails loudly with the
    * byte offset on truncation and on any feature the canonical encoder
    * never emits (interlace, transparency, disposal 2/3).
    */
  def parseGif(docId: Long, b: Array[Byte]): Anim = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: GIF parse at byte $off: $why")
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) fail(pos, "truncated")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); val hi = u8(); lo | (hi << 8) }
    def bytes(n: Int): Array[Byte] = {
      if (pos + n > b.length) fail(pos, s"truncated ($n bytes needed)")
      val r = b.slice(pos, pos + n); pos += n; r
    }
    val sig = new String(bytes(6), "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") fail(0, s"bad signature '$sig'")
    val width = u16()
    val height = u16()
    if (width <= 0 || height <= 0) fail(6, s"bad dimensions ${width}x$height")
    val packed = u8()
    u8() // background color index
    u8() // aspect ratio
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val size = 2 << (packed & 7)
        val raw = bytes(3 * size)
        Array.tabulate(size)(i =>
          ((raw(3 * i) & 0xff) << 16) | ((raw(3 * i + 1) & 0xff) << 8) | (raw(3 * i + 2) & 0xff))
      } else Array.empty[Int]
    val canvas = new Array[Int](width * height)
    val frames = Vector.newBuilder[Frame]
    var nFrames = 0
    var nExt = 0
    var looped = false
    var pendingDelay = 0
    def skipSubBlocks(): Array[Byte] = {
      val acc = ArrayBuffer.empty[Byte]
      var len = u8()
      while (len != 0) { acc ++= bytes(len); len = u8() }
      acc.toArray
    }
    var done = false
    while (!done) {
      val at = pos
      u8() match {
        case 0x3b => done = true
        case 0x21 =>
          nExt += 1
          u8() match {
            case 0xf9 => // graphic control
              if (u8() != 4) fail(at, "GCE block size != 4")
              val gp = u8()
              val disposal = (gp >> 2) & 7
              if (disposal > 1) fail(at, s"disposal method $disposal unsupported")
              pendingDelay = u16()
              val tIdx = u8()
              if ((gp & 1) != 0) fail(at, s"transparency (index $tIdx) unsupported")
              if (u8() != 0) fail(at, "GCE missing terminator")
            case 0xff => // application extension
              val len = u8()
              val app = new String(bytes(len), "US-ASCII")
              if (app.startsWith("NETSCAPE")) looped = true
              skipSubBlocks()
            case _ => // comment / plain-text / unknown: skip sub-blocks
              skipSubBlocks()
          }
        case 0x2c =>
          val left = u16()
          val top = u16()
          val iw = u16()
          val ih = u16()
          if (iw == 0 || ih == 0) fail(at, s"zero-area frame ${iw}x$ih")
          val ip = u8()
          val interlaced = (ip & 0x40) != 0
          val pal =
            if ((ip & 0x80) != 0) { // local color table
              val size = 2 << (ip & 7)
              val raw = bytes(3 * size)
              Array.tabulate(size)(i =>
                ((raw(3 * i) & 0xff) << 16) | ((raw(3 * i + 1) & 0xff) << 8) | (raw(3 * i + 2) & 0xff))
            } else gct
          if (pal.isEmpty) fail(at, "image has neither local nor global color table")
          if (left + iw > width || top + ih > height)
            fail(at, s"frame ${iw}x$ih at ($left,$top) exceeds ${width}x$height canvas")
          val minCode = u8()
          val data = skipSubBlocks()
          val lzwAt = at
          val idx = lzwDecode(minCode, data, iw * ih, why => fail(lzwAt, why))
          // interlaced frames (GIF89a appendix E — ImageIO's writer emits
          // them by default) store rows in four passes: 0,8,16… then
          // 4,12… then 2,6,10… then the odd rows
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = ((0 until ih by 8) ++ (4 until ih by 8) ++
                (2 until ih by 4) ++ (1 until ih by 2)).toArray
              order(_)
            }
          var r = 0
          while (r < ih) {
            val y = rowOf(r)
            var x = 0
            while (x < iw) {
              val i = idx(r * iw + x)
              if (i >= pal.length) fail(at, s"pixel index $i outside ${pal.length}-color table")
              canvas((top + y) * width + (left + x)) = pal(i)
              x += 1
            }
            r += 1
          }
          frames += Frame(pendingDelay, canvas.clone())
          nFrames += 1
          pendingDelay = 0
        case other => fail(at, f"unknown block introducer 0x$other%02x")
      }
    }
    if (nFrames == 0) fail(pos, "no image frames before trailer")
    Anim(width, height, frames.result(), nExt, looped)
  }

  /** [[Multimodal.MediaFeatures]] face for `image/gif` payloads: width,
    * height, n_frames from the real walk; feat0-2 = mean B/G/R over all
    * composited frames in [0,1] (the image-modality contract every other
    * image decoder follows — MediaFeatures' scaladoc); feat3 = total
    * animation delay in seconds.
    */
  private[ext] def features(d: Multimodal.MediaDoc): Multimodal.MediaFeatures = {
    val a = parseGif(d.doc_id, d.content)
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var delay = 0L
    a.frames.foreach { f =>
      delay += f.delayCs
      f.rgb.foreach { v =>
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
    }
    val n = a.width.toDouble * a.height * a.frames.size * 255.0
    Multimodal.MediaFeatures(d.doc_id, d.mime, d.content.length,
      a.width, a.height, a.frames.size,
      feat0 = sb / n, feat1 = sg / n, feat2 = sr / n, feat3 = delay / 100.0)
  }

  // ---- the oracle-gated round-trip query --------------------------------------

  /** The q_gif_anim palette: 16 fixed 0xRRGGBB entries, each channel an
    * exact integer function of the index so the oracle recomputes sums
    * closed-form: r = i*17, g = 255 - i*17, b = (i*73) % 256.
    */
  private[ext] val Palette: IndexedSeq[Int] =
    IndexedSeq.tabulate(16)(i => ((i * 17) << 16) | ((255 - i * 17) << 8) | (i * 73 % 256))

  private val FrameW = 4
  private val FrameH = 2
  private val MaxFrames = 6

  /** Real animated-media frame sampling, end-to-end: each user's first
    * 8·F events (F = min(count div 8, 6)) become F frames of 4×2 palette
    * indices (index = value-derived mod 16), the frames go through the
    * REAL GIF89a encode (LZW compression, GCE delays 3+f cs, NETSCAPE
    * loop, comment block) and the REAL parse+decode back, every 2nd
    * composited frame is sampled, and the sampled frames' exact channel
    * sums + the delay censuses return for DuckDB to recompute from
    * events. Lossless codec ⇒ the hash gate covers compressor,
    * decompressor, block walk and GCE parse bit-for-bit.
    */
  val q_gif_anim: QueryDef = QueryDef(
    s"""WITH e AS (SELECT user_id,
       |    ((CAST(floor(value*100) AS BIGINT) % 16) + 16) % 16 AS idx,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |f AS (SELECT user_id, LEAST(count(*) // ${FrameW * FrameH}, $MaxFrames) AS nf
       |  FROM e GROUP BY user_id HAVING count(*) >= ${FrameW * FrameH}),
       |px AS (SELECT e.user_id, f.nf, (e.rn - 1) // ${FrameW * FrameH} AS frame, e.idx
       |  FROM e JOIN f ON e.user_id = f.user_id AND e.rn <= f.nf * ${FrameW * FrameH}),
       |samp AS (SELECT * FROM px WHERE frame % 2 = 0)
       |SELECT user_id,
       |  CAST($FrameW AS BIGINT) AS width, CAST($FrameH AS BIGINT) AS height,
       |  CAST(max(nf) AS BIGINT) AS n_frames,
       |  CAST(max(nf) - (max(nf) // 2) AS BIGINT) AS n_sampled,
       |  CAST(sum(idx * 17) AS BIGINT) AS sum_r,
       |  CAST(sum(255 - idx * 17) AS BIGINT) AS sum_g,
       |  CAST(sum((idx * 73) % 256) AS BIGINT) AS sum_b,
       |  CAST(3 * max(nf) + max(nf) * (max(nf) - 1) // 2 AS BIGINT) AS delay_total_cs,
       |  CAST(1 AS INT) AS looped
       |FROM samp GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val perFrame = FrameW * FrameH
    Tables.events(s, dir)
      .select(col("user_id"),
        pmod(floor(col("value") * 100).cast("long"), lit(16L)).cast("int").as("idx"),
        col("ts"), col("event_id"))
      .transform(DecodeStage.spread(col("user_id")))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("idx"))))
        .as("evs"))
      .filter(size(col("evs")) >= perFrame)
      .select(col("user_id"),
        expr(s"transform(slice(evs, 1, least((size(evs) div $perFrame) * $perFrame, " +
          s"${perFrame * MaxFrames})), e -> e.idx)").as("idxs"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        it.map { case (uid, idxs) =>
          val nf = idxs.size / perFrame
          val frames = (0 until nf).map(fi =>
            (3 + fi, idxs.slice(fi * perFrame, (fi + 1) * perFrame).toArray))
          val gif = encodeGif(FrameW, FrameH, Palette, frames,
            loop = true, comment = Some(s"graft u$uid"))
          val a = parseGif(uid, gif)
          val sampled = a.frames.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f }
          var (sr, sg, sb) = (0L, 0L, 0L)
          sampled.foreach(_.rgb.foreach { v =>
            sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
          })
          val delayTotal = a.frames.map(_.delayCs.toLong).sum
          (uid, a.width.toLong, a.height.toLong, a.frames.size.toLong,
            sampled.size.toLong, sr, sg, sb, delayTotal, if (a.looped) 1 else 0)
        }
      }
      .toDF("user_id", "width", "height", "n_frames", "n_sampled",
        "sum_r", "sum_g", "sum_b", "delay_total_cs", "looped")
      .orderBy(col("user_id"))
  }

  // ---- scene-change detection over the decoded animation -----------------------

  private val CutThreshold = 300

  /** Video-curation composition over the real codec: frames are
    * synthesized with SCENE structure (two frames per scene share a base
    * pattern, per-pixel noise rides on top), go through the real GIF
    * encode+decode, and adjacent DECODED frames' red-channel absolute
    * difference flags a scene cut when it exceeds [[CutThreshold]] — the
    * shot-boundary census a video training pipeline runs before frame
    * dedup/sampling. The synthesis guarantees separation (within-scene
    * diff ≤ 8·17 = 136, across-scene ≥ 8·68 = 544), but the REPORTED
    * diffs are data, recomputed exactly by the oracle.
    *
    * Scale shape: identical to [[q_gif_anim]] — one per-user
    * aggregation, one mapPartitions codec+diff pass, zero further
    * shuffles.
    */
  val q_gif_scene_cuts: QueryDef = QueryDef(
    s"""WITH e AS (SELECT user_id,
       |    ((CAST(floor(value*100) AS BIGINT) % 8) + 8) % 8 AS roll,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |f AS (SELECT user_id, LEAST(count(*) // ${FrameW * FrameH}, $MaxFrames) AS nf
       |  FROM e GROUP BY user_id HAVING count(*) >= ${FrameW * FrameH}),
       |px AS (SELECT e.user_id, f.nf,
       |    (e.rn - 1) // ${FrameW * FrameH} AS frame,
       |    (e.rn - 1) % ${FrameW * FrameH} AS p,
       |    ((((e.rn - 1) // ${FrameW * FrameH}) // 2) * 5
       |      + ((e.rn - 1) % ${FrameW * FrameH}) * 3) % 15
       |      + CASE WHEN e.roll = 0 THEN 1 ELSE 0 END AS idx
       |  FROM e JOIN f ON e.user_id = f.user_id AND e.rn <= f.nf * ${FrameW * FrameH}),
       |d AS (SELECT a.user_id, a.frame,
       |    sum(abs(b.idx * 17 - a.idx * 17)) AS diff
       |  FROM px a JOIN px b ON a.user_id = b.user_id AND a.p = b.p
       |    AND b.frame = a.frame + 1
       |  GROUP BY a.user_id, a.frame)
       |SELECT f.user_id, CAST(f.nf AS BIGINT) AS n_frames,
       |  CAST(coalesce(sum(CASE WHEN d.diff > $CutThreshold THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
       |  CAST(coalesce(sum(d.diff), 0) AS BIGINT) AS total_diff,
       |  CAST(coalesce(max(d.diff), 0) AS BIGINT) AS max_diff
       |FROM f LEFT JOIN d ON f.user_id = d.user_id
       |GROUP BY f.user_id, f.nf
       |ORDER BY f.user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val perFrame = FrameW * FrameH
    Tables.events(s, dir)
      .select(col("user_id"),
        pmod(floor(col("value") * 100).cast("long"), lit(8L)).cast("int").as("roll"),
        col("ts"), col("event_id"))
      .transform(DecodeStage.spread(col("user_id")))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("roll"))))
        .as("evs"))
      .filter(size(col("evs")) >= perFrame)
      .select(col("user_id"),
        expr(s"transform(slice(evs, 1, least((size(evs) div $perFrame) * $perFrame, " +
          s"${perFrame * MaxFrames})), e -> e.roll)").as("rolls"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        it.map { case (uid, rolls) =>
          val nf = rolls.size / perFrame
          val idxs = rolls.zipWithIndex.map { case (roll, i) =>
            val frame = i / perFrame
            val p = i % perFrame
            ((frame / 2) * 5 + p * 3) % 15 + (if (roll == 0) 1 else 0)
          }
          val frames = (0 until nf).map(fi =>
            (1, idxs.slice(fi * perFrame, (fi + 1) * perFrame).toArray))
          val a = parseGif(uid, encodeGif(FrameW, FrameH, Palette, frames))
          // red channel of the DECODED composited frames
          val reds = a.frames.map(_.rgb.map(v => (v >> 16) & 0xff))
          val diffs = reds.zip(reds.drop(1)).map { case (x, y) =>
            x.zip(y).map { case (u, v) => math.abs(v - u).toLong }.sum
          }
          (uid, a.frames.size.toLong,
            diffs.count(_ > CutThreshold).toLong,
            diffs.sum, if (diffs.isEmpty) 0L else diffs.max)
        }
      }
      .toDF("user_id", "n_frames", "n_cuts", "total_diff", "max_diff")
      .orderBy(col("user_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_gif_anim" -> q_gif_anim,
    "q_gif_scene_cuts" -> q_gif_scene_cuts)
}
