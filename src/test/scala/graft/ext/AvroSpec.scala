package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import AvroCodec.Doc

/** The hand-rolled Avro wire/container decode behind q_avro_decode /
  * q_avro_ocf (AvroCodec.scala), cross-validated against the REAL Avro
  * library in BOTH directions: library-written containers and binary
  * records parse identically under our walk, and our encodings decode
  * identically under GenericDatumReader — spec compliance, not
  * self-consistency. Plus the loud-failure contract.
  */
class AvroSpec extends AnyFunSuite with Matchers {

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val schema = new ASchema.Parser().parse(AvroCodec.SchemaJson)

  private val genDoc: Gen[Doc] = for {
    id <- Gen.oneOf(Gen.choose(0L, 100L), Gen.choose(-100L, -1L),
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
    text <- Gen.listOf(Gen.oneOf("word", "byteés", "", " ", "x" * 200))
      .map(_.mkString(" "))
    lang <- Gen.oneOf("en", "es", "zh", "")
  } yield Doc(id, text, lang)

  // ---- binary record: both directions vs the real library ----------------------

  test("property: OUR binary records decode under the REAL GenericDatumReader (50 cases)") {
    val reader = new GenericDatumReader[GenericRecord](schema)
    for (seed <- 1L to 50L) {
      val d = gen(genDoc, seed * 13L)
      val out = new java.io.ByteArrayOutputStream()
      AvroCodec.writeDoc(out, d)
      val dec = DecoderFactory.get().binaryDecoder(out.toByteArray, null)
      val rec = reader.read(null, dec)
      withClue(s"doc=$d: ") {
        rec.get("id") shouldBe d.id
        rec.get("text").toString shouldBe d.text
        rec.get("lang").toString shouldBe d.lang
      }
    }
  }

  test("property: REAL library binary records decode under OUR reader (50 cases)") {
    val writer = new GenericDatumWriter[GenericRecord](schema)
    for (seed <- 1L to 50L) {
      val d = gen(genDoc, seed * 17L)
      val out = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      val rec = new GenericData.Record(schema)
      rec.put("id", java.lang.Long.valueOf(d.id))
      rec.put("text", d.text)
      rec.put("lang", d.lang)
      writer.write(rec, enc)
      enc.flush()
      val r = new AvroCodec.Reader(seed, out.toByteArray, 0)
      AvroCodec.readDoc(r) shouldBe d
      r.atEnd shouldBe true
    }
  }

  test("varLongLen matches the bytes writeVarLong actually emits") {
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 8191L, 8192L,
      1048575L, 1048576L, Long.MaxValue, Long.MinValue)) {
      val out = new java.io.ByteArrayOutputStream()
      AvroCodec.writeVarLong(out, v)
      withClue(s"v=$v: ") { out.size shouldBe AvroCodec.varLongLen(v) }
    }
  }

  // ---- Confluent envelope --------------------------------------------------------

  test("envelope round-trips; damage fails loudly") {
    val d = Doc(42L, "payload text", "en")
    val env = AvroCodec.encodeEnvelope(123456, d)
    AvroCodec.decodeEnvelope(0L, env) shouldBe ((123456, d))
    val badMagic = env.clone(); badMagic(0) = 1
    intercept[IllegalArgumentException](AvroCodec.decodeEnvelope(1L, badMagic))
      .getMessage should include("bad envelope magic")
    intercept[IllegalArgumentException](AvroCodec.decodeEnvelope(2L, env.take(3)))
      .getMessage should include("truncated")
    intercept[IllegalArgumentException](
      AvroCodec.decodeEnvelope(3L, env :+ 0x7.toByte))
      .getMessage should include("trailing bytes")
  }

  // ---- OCF container: real writer, our walk (and codec matrix) ------------------

  private def ocfVia(docs: Seq[Doc], codec: Option[CodecFactory],
      syncInterval: Option[Int] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    syncInterval.foreach(w.setSyncInterval)
    w.create(schema, out)
    docs.foreach { d =>
      val rec = new GenericData.Record(schema)
      rec.put("id", java.lang.Long.valueOf(d.id))
      rec.put("text", d.text)
      rec.put("lang", d.lang)
      w.append(rec)
    }
    w.close()
    out.toByteArray
  }

  test("property: library containers (null + deflate codecs, multi-block) walk exactly (20 cases)") {
    for (seed <- 1L to 20L) {
      val docs = gen(Gen.choose(1, 40).flatMap(Gen.listOfN(_, genDoc)), seed * 7L)
      val deflate = seed % 2 == 0
      val bytes = ocfVia(docs, if (deflate) Some(CodecFactory.deflateCodec(6)) else None)
      val c = AvroCodec.parseOcf(seed, bytes)
      withClue(s"n=${docs.size} deflate=$deflate: ") {
        c.codec shouldBe (if (deflate) "deflate" else "null")
        c.schema should include("\"Doc\"")
        c.docs shouldBe docs.toVector
        c.blocks.map(_._1).sum shouldBe docs.size.toLong
      }
    }
  }

  test("multi-block containers (small sync interval) keep record order and census") {
    val docs = (0 until 30).map(i => Doc(i.toLong, s"text $i " * 50, "en"))
    val c = AvroCodec.parseOcf(0L,
      ocfVia(docs, codec = None, syncInterval = Some(1024)))
    c.blocks.size should be > 1
    c.docs shouldBe docs.toVector
    c.blocks.map(_._1).sum shouldBe 30L
  }

  test("the real DataFileReader agrees with our walk on the same bytes") {
    val docs = (0 until 9).map(i => Doc(i.toLong, s"row $i", "es"))
    val bytes = ocfVia(docs, Some(CodecFactory.deflateCodec(6)))
    val ours = AvroCodec.parseOcf(0L, bytes).docs
    val rdr = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord](schema))
    val theirs = Vector.newBuilder[Doc]
    while (rdr.hasNext) {
      val rec = rdr.next()
      theirs += Doc(rec.get("id").asInstanceOf[Long],
        rec.get("text").toString, rec.get("lang").toString)
    }
    rdr.close()
    ours shouldBe theirs.result()
  }

  test("container damage fails loudly with the byte offset") {
    val docs = (0 until 4).map(i => Doc(i.toLong, "abc", "en"))
    val bytes = ocfVia(docs, Some(CodecFactory.deflateCodec(6)))
    val badMagic = bytes.clone(); badMagic(2) = 'X'
    intercept[IllegalArgumentException](AvroCodec.parseOcf(1L, badMagic))
      .getMessage should include("bad OCF magic")
    // flip a byte in the LAST sync marker: sync verification must catch it
    val badSync = bytes.clone()
    badSync(badSync.length - 3) = (badSync(badSync.length - 3) ^ 0x55).toByte
    intercept[IllegalArgumentException](AvroCodec.parseOcf(2L, badSync))
      .getMessage should include("sync marker mismatch")
    // truncation anywhere strictly inside fails loudly
    for (cut <- Seq(2, 10, bytes.length / 2, bytes.length - 1)) {
      val e = intercept[IllegalArgumentException](
        AvroCodec.parseOcf(3L, bytes.take(cut)))
      withClue(s"cut=$cut: ") { e.getMessage should include("at byte") }
    }
  }

  private def craftHeader(codec: String): java.io.ByteArrayOutputStream = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    AvroCodec.writeVarLong(out, 2L) // map block: 2 entries
    def kv(k: String, v: String): Unit = {
      val kb = k.getBytes(UTF_8); val vb = v.getBytes(UTF_8)
      AvroCodec.writeVarLong(out, kb.length.toLong); out.write(kb, 0, kb.length)
      AvroCodec.writeVarLong(out, vb.length.toLong); out.write(vb, 0, vb.length)
    }
    kv("avro.schema", AvroCodec.SchemaJson)
    kv("avro.codec", codec)
    AvroCodec.writeVarLong(out, 0L)
    out.write(new Array[Byte](16), 0, 16)
    out
  }

  test("unknown codec is named loudly") {
    intercept[IllegalArgumentException](
      AvroCodec.parseOcf(0L, craftHeader("snappy").toByteArray))
      .getMessage should include("unsupported avro.codec 'snappy'")
  }

  test("a non-positive block record count is rejected, not looped over") {
    val out = craftHeader("null")
    AvroCodec.writeVarLong(out, -1L) // block count: corrupt
    AvroCodec.writeVarLong(out, 0L) // block size
    out.write(new Array[Byte](16), 0, 16) // matching (all-zero) sync
    intercept[IllegalArgumentException](AvroCodec.parseOcf(0L, out.toByteArray))
      .getMessage should include("non-positive block record count")
  }

  // ---- schema resolution: OUR resolver vs the library's RESOLVING reader -------

  /** Encode one GenericRecord as Avro binary via the real library. */
  private def libEncode(schema: ASchema, fill: GenericData.Record => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fill(rec)
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode via the library's RESOLVING reader (writer, reader). */
  private def libResolve(bytes: Array[Byte], writer: ASchema,
      reader: ASchema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, dec)
  }

  /** Normalize a library value for comparison with ours. */
  private def norm(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a.toSeq
    case b: Array[Byte] => b.toSeq
    case r: GenericRecord =>
      (0 until r.getSchema.getFields.size).map(i => norm(r.get(i))).toVector
    case l: java.util.List[_] =>
      { val b = Vector.newBuilder[Any]; l.forEach(x => b += norm(x)); b.result() }
    case l: Seq[_] => l.map(norm).toVector
    case x => x
  }

  private def ourResolve(bytes: Array[Byte], writer: ASchema,
      reader: ASchema): Vector[Any] = {
    val r = new AvroCodec.Reader(0L, bytes, 0)
    val v = AvroResolve.read(r, writer, reader).asInstanceOf[Vector[Any]]
    r.atEnd shouldBe true
    v
  }

  test("resolution: added-with-default fields agree with the library's resolving reader") {
    val w = new ASchema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},{"name":"text","type":"string"}]}"""
        .stripMargin.replace("\n", ""))
    val r = new ASchema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},{"name":"text","type":"string"},
        |{"name":"lang","type":"string","default":"und"},
        |{"name":"score","type":"double","default":1.5},
        |{"name":"opt","type":["null","string"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    val bytes = libEncode(w, rec => { rec.put("id", 42L); rec.put("text", "hello") })
    val ours = ourResolve(bytes, w, r)
    val lib = libResolve(bytes, w, r)
    ours.map(norm) shouldBe (0 until 5).map(i => norm(lib.get(i))).toVector
    ours shouldBe Vector(42L, "hello", "und", 1.5, null)
  }

  test("resolution: numeric promotions and string<->bytes agree with the library") {
    val w = new ASchema.Parser().parse(
      """{"type":"record","name":"P","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"long"},
        |{"name":"c","type":"float"},{"name":"s","type":"string"},
        |{"name":"x","type":"bytes"}]}""".stripMargin.replace("\n", ""))
    val r = new ASchema.Parser().parse(
      """{"type":"record","name":"P","fields":[
        |{"name":"a","type":"long"},{"name":"b","type":"double"},
        |{"name":"c","type":"double"},{"name":"s","type":"bytes"},
        |{"name":"x","type":"string"}]}""".stripMargin.replace("\n", ""))
    val bytes = libEncode(w, rec => {
      rec.put("a", Int.MaxValue); rec.put("b", 1L << 40)
      rec.put("c", 2.5f); rec.put("s", "solid")
      rec.put("x", java.nio.ByteBuffer.wrap("raw".getBytes(UTF_8)))
    })
    val ours = ourResolve(bytes, w, r)
    val lib = libResolve(bytes, w, r)
    ours.map(norm) shouldBe (0 until 5).map(i => norm(lib.get(i))).toVector
    ours(0) shouldBe Int.MaxValue.toLong
    ours(1) shouldBe (1L << 40).toDouble
    ours(2) shouldBe 2.5d
    new String(ours(3).asInstanceOf[Array[Byte]], UTF_8) shouldBe "solid"
    ours(4) shouldBe "raw"
  }

  test("resolution: reordered fields and writer-only skips (incl. array/union) agree") {
    val w = new ASchema.Parser().parse(
      """{"type":"record","name":"S","fields":[
        |{"name":"drop_arr","type":{"type":"array","items":"string"}},
        |{"name":"keep1","type":"string"},
        |{"name":"drop_u","type":["null","long"]},
        |{"name":"keep2","type":"long"},
        |{"name":"drop_s","type":"string"}]}""".stripMargin.replace("\n", ""))
    val r = new ASchema.Parser().parse(
      """{"type":"record","name":"S","fields":[
        |{"name":"keep2","type":"long"},{"name":"keep1","type":"string"}]}"""
        .stripMargin.replace("\n", ""))
    val bytes = libEncode(w, rec => {
      val arr = new java.util.ArrayList[String](); arr.add("a"); arr.add("bb")
      rec.put("drop_arr", arr); rec.put("keep1", "alpha")
      rec.put("drop_u", java.lang.Long.valueOf(9L))
      rec.put("keep2", 77L); rec.put("drop_s", "gone")
    })
    val ours = ourResolve(bytes, w, r)
    val lib = libResolve(bytes, w, r)
    ours.map(norm) shouldBe (0 until 2).map(i => norm(lib.get(i))).toVector
    ours shouldBe Vector(77L, "alpha")
  }

  test("resolution: union legs agree (writer union, reader union, both)") {
    val wu = new ASchema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":["null","string"]}]}""".stripMargin.replace("\n", ""))
    val rPlain = new ASchema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":"string"}]}""".stripMargin.replace("\n", ""))
    // writer union -> reader non-union (string branch written)
    val b1 = libEncode(wu, _.put("v", "branchy"))
    ourResolve(b1, wu, rPlain) shouldBe Vector("branchy")
    norm(libResolve(b1, wu, rPlain).get(0)) shouldBe "branchy"
    // writer non-union -> reader union (+ promotion inside the branch)
    val wPlain = new ASchema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":"int"}]}""".stripMargin.replace("\n", ""))
    val ru = new ASchema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":["null","long"]}]}""".stripMargin.replace("\n", ""))
    val b2 = libEncode(wPlain, _.put("v", 5))
    ourResolve(b2, wPlain, ru) shouldBe Vector(5L)
    norm(libResolve(b2, wPlain, ru).get(0)) shouldBe 5L
    // union -> union, null branch
    val b3 = libEncode(wu, _.put("v", null))
    val ruS = new ASchema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |{"name":"v","type":["string","null"]}]}""".stripMargin.replace("\n", ""))
    ourResolve(b3, wu, ruS) shouldBe Vector(null)
    libResolve(b3, wu, ruS).get(0) shouldBe null
  }

  test("resolution: reader union prefers the exact branch over a promotable one") {
    // Writer long vs reader ["float","long"]: first-promotable-wins would
    // silently decode a lossy float; the real resolving reader picks the
    // exact long branch (ADVICE r12). Use a value float cannot represent.
    val w = new ASchema.Parser().parse(
      """{"type":"record","name":"X","fields":[
        |{"name":"v","type":"long"}]}""".stripMargin.replace("\n", ""))
    val r = new ASchema.Parser().parse(
      """{"type":"record","name":"X","fields":[
        |{"name":"v","type":["float","long"]}]}""".stripMargin.replace("\n", ""))
    val big = (1L << 53) + 1L // not exactly representable as float/double
    val b = libEncode(w, _.put("v", java.lang.Long.valueOf(big)))
    ourResolve(b, w, r) shouldBe Vector(big)
    norm(libResolve(b, w, r).get(0)) shouldBe big
    // and int vs ["double","int"]: exact int beats the earlier double
    val wi = new ASchema.Parser().parse(
      """{"type":"record","name":"Y","fields":[
        |{"name":"v","type":"int"}]}""".stripMargin.replace("\n", ""))
    val ri = new ASchema.Parser().parse(
      """{"type":"record","name":"Y","fields":[
        |{"name":"v","type":["double","int"]}]}""".stripMargin.replace("\n", ""))
    val bi = libEncode(wi, _.put("v", 7))
    ourResolve(bi, wi, ri) shouldBe Vector(7)
    norm(libResolve(bi, wi, ri).get(0)) shouldBe 7
  }

  test("resolution errors are loud: missing default, name mismatch, no union branch") {
    val w = new ASchema.Parser().parse(
      """{"type":"record","name":"E","fields":[{"name":"id","type":"long"}]}""")
    val bytes = libEncode(w, _.put("id", 1L))
    val noDefault = new ASchema.Parser().parse(
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"long"},{"name":"need","type":"string"}]}"""
        .stripMargin.replace("\n", ""))
    intercept[IllegalArgumentException](ourResolve(bytes, w, noDefault))
      .getMessage should include("has no default")
    val wrongName = new ASchema.Parser().parse(
      """{"type":"record","name":"Other","fields":[{"name":"id","type":"long"}]}""")
    intercept[IllegalArgumentException](ourResolve(bytes, w, wrongName))
      .getMessage should include("record name mismatch")
    val noBranch = new ASchema.Parser().parse(
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":["null","string"]}]}""".stripMargin.replace("\n", ""))
    intercept[IllegalArgumentException](ourResolve(bytes, w, noBranch))
      .getMessage should include("no reader union branch")
  }

  test("mixed-version OCFs resolve identically to the library's DataFileReader") {
    val reader = new ASchema.Parser().parse(AvroResolve.ReaderV3)
    val docs = Seq((1L, "uno", "es"), (2L, "due", "it"), (3L, "trois", "fr"))
    Seq(1, 2).foreach { version =>
      val bytes = AvroResolve.writeEvolvedOcf(version, docs)
      val ours = AvroResolve.parseOcfResolving(0L, bytes, reader.toString).docs
      val dfr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord](null, reader))
      val lib = Iterator.continually(dfr).takeWhile(_.hasNext).map(_.next()).toVector
      dfr.close()
      ours.size shouldBe 3
      ours.zip(lib).foreach { case (o, l) =>
        o.map(norm) shouldBe (0 until 5).map(i => norm(l.get(i))).toVector
      }
      // v1 files default lang and promote views; v2 files carry lang
      if (version == 1) ours.map(_(2)) shouldBe Vector("und", "und", "und")
      else ours.map(_(2)) shouldBe Vector("es", "it", "fr")
      ours.map(_(3)) shouldBe Vector(1L, 2L, 3L)
      ours.map(_(4)) shouldBe Vector(1.5, 1.5, 1.5)
    }
  }
}
