package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H88 — hand-rolled safetensors codec. The JSON layer is
  * cross-validated against Jackson (the independent JSON implementation
  * Spark ships); the container rules (alignment, tiling, dtype sizes)
  * are the reference implementation's documented validation, pinned by
  * the damage table.
  */
class SafetensorsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def f32(values: Float*): Array[Byte] = {
    val b = ByteBuffer.allocate(values.size * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(b.putFloat)
    b.array()
  }
  private def i64(values: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(values.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(b.putLong)
    b.array()
  }

  /** Hand-build a file from a raw header string + buffer (for lies the
    * writer refuses to produce).
    */
  private def rawFile(header: String, buf: Array[Byte]): Array[Byte] = {
    val hb = header.getBytes(UTF_8)
    val out = new Array[Byte](8 + hb.length + buf.length)
    var h = hb.length.toLong
    var i = 0
    while (i < 8) { out(i) = (h & 0xff).toByte; h >>>= 8; i += 1 }
    System.arraycopy(hb, 0, out, 8, hb.length)
    System.arraycopy(buf, 0, out, 8 + hb.length, buf.length)
    out
  }

  test("round-trip: tensors, metadata, offsets, 8-byte data alignment") {
    val bytes = Safetensors.encode(
      Seq(("emb", "F32", Seq(2L, 3L), f32(1.5f, -2.5f, 0f, 3f, 4f, -5.25f)),
        ("ids", "I64", Seq(2L), i64(7L, -9L))),
      Seq("format" -> "graft", "rev" -> "13"))
    val p = Safetensors.parse(1L, bytes)
    p.dataStart % 8 shouldBe 0L
    p.metadata shouldBe Map("format" -> "graft", "rev" -> "13")
    p.tensors.map(_.name) shouldBe Vector("emb", "ids")
    val emb = p.tensors(0)
    emb.dtype shouldBe "F32"
    emb.shape shouldBe Vector(2L, 3L)
    emb.begin shouldBe 0L
    emb.end shouldBe 24L
    emb.floats(1L) shouldBe Array(1.5f, -2.5f, 0f, 3f, 4f, -5.25f)
    p.tensors(1).longs(1L) shouldBe Array(7L, -9L)
  }

  test("metadata-only file (zero tensors, empty data section) parses") {
    val bytes = Safetensors.encode(Nil, Seq("note" -> "empty"))
    val p = Safetensors.parse(2L, bytes)
    p.tensors shouldBe empty
    p.metadata shouldBe Map("note" -> "empty")
  }

  test("empty tensor (begin == end) is legal and tiles correctly") {
    val bytes = Safetensors.encode(
      Seq(("a", "F32", Seq(0L, 4L), Array.emptyByteArray),
        ("b", "I64", Seq(1L), i64(5L))))
    val p = Safetensors.parse(3L, bytes)
    p.tensors(0).data shouldBe empty
    p.tensors(1).longs(3L) shouldBe Array(5L)
  }

  test("JSON layer cross-validation: our strict parser agrees with Jackson on real headers") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val headers = Seq(
      Safetensors.encode(Seq(("emb", "F32", Seq(2L, 3L), f32(1f, 2f, 3f, 4f, 5f, 6f))),
        Seq("k" -> "v")),
      Safetensors.encode(Seq(
        ("weird \"name\"\\path", "U8", Seq(3L), Array[Byte](1, 2, 3)),
        ("unicodeé中", "I8", Seq(2L), Array[Byte](-1, 7))),
        Seq("esc\tape" -> "new\nline", "sla/sh" -> "ctl")))
    headers.foreach { file =>
      var hlen = 0L
      var i = 7
      while (i >= 0) { hlen = (hlen << 8) | (file(i) & 0xffL); i -= 1 }
      val headerStr = new String(file, 8, hlen.toInt, UTF_8)
      val ours = Safetensors.parseJson(0L, headerStr.trim, 8L)
      val theirs = mapper.readTree(headerStr)
      // field-for-field agreement, insertion order included
      def walk(a: Safetensors.JVal, b: com.fasterxml.jackson.databind.JsonNode): Unit = a match {
        case Safetensors.JStr(s) => b.isTextual shouldBe true; b.asText shouldBe s
        case Safetensors.JNum(n) => b.isIntegralNumber shouldBe true; b.asLong shouldBe n
        case Safetensors.JArr(vs) =>
          b.isArray shouldBe true
          b.size shouldBe vs.size
          vs.zipWithIndex.foreach { case (v, k) => walk(v, b.get(k)) }
        case Safetensors.JObj(fields) =>
          b.isObject shouldBe true
          val names = {
            val it = b.fieldNames()
            val buf = Vector.newBuilder[String]
            while (it.hasNext) buf += it.next()
            buf.result()
          }
          names shouldBe fields.map(_._1)
          fields.foreach { case (k, v) => walk(v, b.get(k)) }
      }
      walk(ours, theirs)
    }
  }

  test("damage table: every validation rule fails loudly") {
    def loud(bytes: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Safetensors.parse(9L, bytes))
      e.getMessage should include("safetensors parse at byte")
      e.getMessage should include(needle)
    }
    val good = Safetensors.encode(Seq(("t", "F32", Seq(2L), f32(1f, 2f))))
    // truncated below the header-length word
    loud(good.take(5), "cannot hold the header length")
    // header length crossing the file end
    val far = good.clone(); far(0) = (far(0) + 64).toByte
    loud(far, "crosses the file end")
    // a gap: tensor starts at 4, buffer is 12
    loud(rawFile("""{"t":{"dtype":"F32","shape":[2],"data_offsets":[4,12]}}""",
      new Array[Byte](12)), "expected 0")
    // overlap: two tensors share bytes
    loud(rawFile(
      """{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]},"b":{"dtype":"F32","shape":[2],"data_offsets":[4,12]}}""",
      new Array[Byte](12)), "gap or overlap")
    // buffer not fully covered
    loud(rawFile("""{"t":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](16)), "not fully covered")
    // shape product disagrees with the extent
    loud(rawFile("""{"t":{"dtype":"F32","shape":[3],"data_offsets":[0,8]}}""",
      new Array[Byte](8)), "!= extent")
    // unknown dtype
    loud(rawFile("""{"t":{"dtype":"Q4","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](8)), "unknown")
    // duplicate tensor names
    loud(rawFile(
      """{"t":{"dtype":"U8","shape":[4],"data_offsets":[0,4]},"t":{"dtype":"U8","shape":[4],"data_offsets":[4,8]}}""",
      new Array[Byte](8)), "duplicate tensor names")
    // non-string metadata value
    loud(rawFile("""{"__metadata__":{"k":5}}""", Array.emptyByteArray), "not a string")
    // floats are outside the header grammar: the integer parser stops at
    // the '.' and the array walk fails on it
    loud(rawFile("""{"t":{"dtype":"F32","shape":[2.5],"data_offsets":[0,8]}}""",
      new Array[Byte](8)), "expected ']'")
    // booleans are outside the header grammar entirely
    loud(rawFile("""{"t":{"dtype":"F32","shape":[true],"data_offsets":[0,8]}}""",
      new Array[Byte](8)), "unexpected character")
    // trailing garbage after the JSON value
    loud(rawFile("""{"t":{"dtype":"U8","shape":[1],"data_offsets":[0,1]}}X""",
      new Array[Byte](1)), "trailing bytes")
  }

  test("q_safetensors is internally consistent at sf0.001") {
    val df = Safetensors.q_safetensors.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      df.count() should be > 0L
      df.filter("emb_exact <> n_vecs * dim or ids_exact <> n_vecs").count() shouldBe 0L
      df.filter("data_start % 8 <> 0").count() shouldBe 0L
    } finally df.unpersist()
  }
}
