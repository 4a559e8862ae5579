package graft.ext

/** LZ4 block format — the remaining parquet page codec (and Kafka's
  * wire compression), hand-rolled against the public spec
  * (lz4.github.io/lz4/lz4_Block_format.html). Sequences of
  * [token: literal-length nibble | match-length nibble]
  * [255-extension bytes] [literals] [2-byte LE offset]
  * [255-extension bytes], matches copied byte-by-byte so overlapping
  * offsets give RLE semantics (offset 1 = repeat last byte). The
  * decoder is STRICT: offset 0, an offset reaching before the output
  * start, literals or extensions crossing the input end, and a block
  * not landing exactly on the declared output size each fail LOUDLY
  * with the byte offset. The encoder is a greedy hash-table matcher
  * honoring the spec's end-of-block rules (last 5 bytes literal, no
  * match starting within the last 12) so ANY conformant decoder reads
  * it — Lz4Spec cross-validates BOTH directions against lz4-java (the
  * library Spark ships).
  *
  * [[hadoopUncompress]] adds the legacy Hadoop framing parquet's
  * `LZ4` codec enum rides ([4B BE uncompressed][4B BE compressed]
  * [block], repeated): what `spark.write.option("compression","lz4")`
  * still produces, vs `LZ4_RAW`'s bare block.
  */
object Lz4 {

  // ---- decode -----------------------------------------------------------------

  /** Strict block decode to exactly `expect` bytes. */
  def decompress(ctx: String, in: Array[Byte], expect: Int): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: lz4 decode at byte $off: $why")
    val out = new Array[Byte](expect)
    var pos = 0
    var opos = 0
    // a zero-byte stream is invalid even for empty output — the empty
    // payload is the single 0x00 token, as the reference encoder emits
    if (in.isEmpty) fail(0, s"empty block (cannot yield $expect bytes)")
    var done = false
    while (!done) {
      if (pos >= in.length) fail(pos, "input ends before a sequence token")
      val token = in(pos) & 0xff
      pos += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (pos >= in.length) fail(pos, "input ends inside a literal-length extension")
          b = in(pos) & 0xff
          pos += 1
          litLen += b
        }
      }
      if (pos + litLen > in.length) fail(pos, s"$litLen literal bytes cross the input end")
      if (opos + litLen > expect) fail(pos, s"$litLen literals overflow the declared output size $expect")
      System.arraycopy(in, pos, out, opos, litLen)
      pos += litLen
      opos += litLen
      if (pos == in.length) {
        // the last sequence is literals-only
        done = true
      } else {
        if (pos + 2 > in.length) fail(pos, "input ends inside the match offset")
        val offset = (in(pos) & 0xff) | ((in(pos + 1) & 0xff) << 8)
        pos += 2
        if (offset == 0) fail(pos - 2, "match offset 0 is invalid")
        if (offset > opos) fail(pos - 2, s"match offset $offset reaches before the output start ($opos written)")
        var matchLen = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var b = 255
          while (b == 255) {
            if (pos >= in.length) fail(pos, "input ends inside a match-length extension")
            b = in(pos) & 0xff
            pos += 1
            matchLen += b
          }
        }
        if (opos + matchLen > expect) fail(pos, s"match of $matchLen overflows the declared output size $expect")
        // byte-by-byte: overlapping copies are the spec's RLE semantics
        var src = opos - offset
        var i = 0
        while (i < matchLen) { out(opos + i) = out(src + i); i += 1 }
        opos += matchLen
      }
    }
    if (opos != expect) fail(pos, s"block yielded $opos bytes, declared $expect")
    out
  }

  // ---- encode -----------------------------------------------------------------

  private val MinMatch = 4
  private val HashLog = 16

  private def hash4(v: Int): Int = (v * -1640531535) >>> (32 - HashLog)

  private def read4(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Greedy single-pass encoder honoring the spec's end rules: matches
    * never start within the last 12 bytes and never extend past
    * len - 5; the final sequence is literals-only.
    */
  def compress(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length + in.length / 255 + 16)
    def writeSeq(litStart: Int, litLen: Int, offset: Int, matchLen: Int): Unit = {
      // matchLen < 0 marks the final literals-only sequence
      val mlNibble = if (matchLen < 0) 0 else math.min(matchLen - MinMatch, 15)
      val token = (math.min(litLen, 15) << 4) | mlNibble
      out.write(token)
      if (litLen >= 15) {
        var rest = litLen - 15
        while (rest >= 255) { out.write(255); rest -= 255 }
        out.write(rest)
      }
      out.write(in, litStart, litLen)
      if (matchLen >= 0) {
        out.write(offset & 0xff)
        out.write((offset >>> 8) & 0xff)
        if (matchLen - MinMatch >= 15) {
          var rest = matchLen - MinMatch - 15
          while (rest >= 255) { out.write(255); rest -= 255 }
          out.write(rest)
        }
      }
    }
    val n = in.length
    if (n == 0) {
      // an empty block is the single 0x00 token (zero literals, end) —
      // what the reference encoder emits; a zero-byte stream is invalid
      writeSeq(0, 0, 0, -1)
      return out.toByteArray
    }
    val table = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(table, -1)
    val matchLimit = n - 5 // matches may not extend into the last 5 bytes
    val mfLimit = n - 12 // and may not START within the last 12
    var anchor = 0
    var i = 0
    while (i < mfLimit) {
      val h = hash4(read4(in, i))
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 0xffff && read4(in, cand) == read4(in, i)) {
        var len = MinMatch
        while (i + len < matchLimit && in(cand + len) == in(i + len)) len += 1
        writeSeq(anchor, i - anchor, i - cand, len)
        i += len
        anchor = i
      } else i += 1
    }
    writeSeq(anchor, n - anchor, 0, -1)
    out.toByteArray
  }

  // ---- legacy Hadoop framing (parquet codec enum LZ4) -------------------------

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  /** Hadoop BlockCompressorStream framing: repeated
    * [4B BE uncompressed chunk size][one or more [4B BE compressed
    * size][lz4 block]] until the chunk is filled. Verified to
    * reassemble exactly `expect` bytes.
    */
  def hadoopUncompress(ctx: String, in: Array[Byte], expect: Int): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: hadoop-lz4 decode at byte $off: $why")
    val out = new java.io.ByteArrayOutputStream(expect)
    var pos = 0
    while (pos < in.length) {
      if (pos + 4 > in.length) fail(pos, "truncated chunk header")
      val chunkLen = be32(in, pos)
      pos += 4
      if (chunkLen < 0) fail(pos - 4, s"negative chunk size $chunkLen")
      var got = 0
      while (got < chunkLen) {
        if (pos + 4 > in.length) fail(pos, "truncated block header")
        val compLen = be32(in, pos)
        pos += 4
        if (compLen < 0 || pos + compLen > in.length)
          fail(pos - 4, s"block of $compLen bytes crosses the input end")
        val block = java.util.Arrays.copyOfRange(in, pos, pos + compLen)
        // each inner block's uncompressed size is the remainder of the
        // chunk, capped at the codec buffer — recover it by decoding to
        // the remaining need (hadoop blocks fill the chunk in order)
        // inner blocks carry `io.compression.codec.lz4.buffersize`
        // (256 KiB default) of the chunk each, the last one the
        // remainder — the strict block decoder must land exactly on it
        val want = math.min(chunkLen - got, 256 * 1024)
        val piece = decompress(ctx, block, want)
        out.write(piece, 0, piece.length)
        got += piece.length
        pos += compLen
      }
    }
    val all = out.toByteArray
    if (all.length != expect)
      fail(pos, s"framing yielded ${all.length} bytes, page header declared $expect")
    all
  }
}
