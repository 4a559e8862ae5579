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
}
