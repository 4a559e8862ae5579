package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

// The REAL protobuf-java runtime — the copy Apache Spark ships relocated
// inside spark-core (org.sparkproject.spark_core.protobuf.*). Used here as
// the independent implementation our hand-rolled wire walk is
// cross-validated against, in BOTH directions; never imported by main code.
import org.sparkproject.spark_core.protobuf.{ByteString, CodedOutputStream, UnknownFieldSet}

/** Protobuf wire format (Proto.scala): hand-rolled varint/zigzag/fixed/
  * length-delimited/packed/group walk vs the real protobuf-java runtime,
  * unknown-field skip + census, Confluent envelope framing, last-one-wins
  * merge, the exact cut-point truncation property, and the loud-failure
  * table.
  */
class ProtoSpec extends AnyFunSuite with Matchers {

  private def enc(id: Long, text: String = "hello", lang: String = "en",
      unknownLen: Int = 2): Array[Byte] =
    Proto.encodeDocEvent(id, delta = (id * 7) % 201 - 100, text, lang,
      tags = Seq(id % 7, id % 13, id % 31), ts = id * 1000003,
      score = (id % 90001).toInt, unknownLen = unknownLen)

  private def lone[T](l: java.util.List[T]): T = { l.size shouldBe 1; l.get(0) }

  test("OUR bytes parse identically under the real UnknownFieldSet") {
    for (id <- Seq(0L, 1L, 42L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong)) {
      val msg = enc(id, text = s"text-$id body", lang = "de")
      val ufs = UnknownFieldSet.parseFrom(msg)
      lone(ufs.getField(1).getVarintList) shouldBe id
      Proto.unzigzag(lone(ufs.getField(2).getVarintList)) shouldBe (id * 7) % 201 - 100
      lone(ufs.getField(3).getLengthDelimitedList).toStringUtf8 shouldBe s"text-$id body"
      lone(ufs.getField(4).getLengthDelimitedList).toStringUtf8 shouldBe "de"
      // packed field arrives as one length-delimited blob of varints
      val packed = lone(ufs.getField(5).getLengthDelimitedList).toByteArray
      val pr = new Proto.Reader(id, packed, 0, packed.length)
      Seq(pr.readVarint(), pr.readVarint(), pr.readVarint()) shouldBe
        Seq(id % 7, id % 13, id % 31)
      pr.atEnd shouldBe true
      lone(ufs.getField(6).getFixed64List) shouldBe id * 1000003
      lone(ufs.getField(7).getFixed32List).toLong shouldBe id % 90001
      val meta = UnknownFieldSet.parseFrom(
        lone(ufs.getField(8).getLengthDelimitedList))
      lone(meta.getField(1).getVarintList) shouldBe
        s"text-$id body".getBytes(UTF_8).length.toLong
      lone(ufs.getField(1000).getLengthDelimitedList).toStringUtf8 shouldBe "uu"
      // and the library's re-serialization (ascending field order) is
      // byte-identical to ours — the strongest equality available
      ufs.toByteArray shouldBe msg
    }
  }

  test("REAL CodedOutputStream bytes decode identically under our walk") {
    val buf = new Array[Byte](512)
    val cos = CodedOutputStream.newInstance(buf)
    cos.writeInt64(1, 77L)
    cos.writeSInt64(2, -33L)
    cos.writeString(3, "réal…text") // multi-byte UTF-8
    cos.writeString(4, "fr")
    // packed tags via raw tag + blob
    val packed = { val w = new Proto.Writer; Seq(5L, 6L, 130L).foreach(v =>
      Proto.writeVarint(w.out, v)); w.toByteArray }
    cos.writeByteArray(5, packed)
    cos.writeFixed64(6, 0x0123456789abcdefL)
    cos.writeFixed32(7, 424242)
    val metaB = { val c2 = CodedOutputStream.newInstance(new Array[Byte](16))
      c2.writeInt64(1, 12L); c2.writeInt64(2, 2L); c2 }
    val meta = { val w = new Proto.Writer; w.int64(1, 12L).int64(2, 2L); w.toByteArray }
    cos.writeByteArray(8, meta)
    cos.writeString(1000, "zzz")
    cos.flush()
    val bytes = java.util.Arrays.copyOf(buf, cos.getTotalBytesWritten)
    val ev = Proto.decodeDocEvent(0L, bytes, 0, bytes.length)
    ev.id shouldBe 77L
    ev.delta shouldBe -33L
    ev.text shouldBe "réal…text"
    ev.lang shouldBe "fr"
    ev.tags shouldBe Seq(5L, 6L, 130L)
    ev.ts shouldBe 0x0123456789abcdefL
    ev.score shouldBe 424242L
    ev.chars shouldBe 12L
    ev.langLen shouldBe 2L
    ev.unknownFields shouldBe 1
    metaB should not be null
  }

  test("negative int64 rides as the full 10-byte varint, both directions") {
    val w = new Proto.Writer
    w.int64(1, -1L)
    val ours = w.toByteArray
    ours.length shouldBe 1 + 10
    val ufs = UnknownFieldSet.parseFrom(ours)
    lone(ufs.getField(1).getVarintList) shouldBe -1L
    val ev = Proto.decodeDocEvent(0L, ufs.toByteArray, 0, ours.length)
    ev.id shouldBe -1L
  }

  test("unknown GROUP framing is skipped with balanced nesting and censused") {
    // the real library writes a group: SGROUP tag, nested fields
    // (including an inner group), EGROUP tag
    val inner = UnknownFieldSet.newBuilder()
      .addField(11, UnknownFieldSet.Field.newBuilder().addVarint(5L).build())
      .build()
    val grp = UnknownFieldSet.newBuilder()
      .addField(10, UnknownFieldSet.Field.newBuilder().addVarint(1L).build())
      .addField(12, UnknownFieldSet.Field.newBuilder().addGroup(inner).build())
      .build()
    val msg = UnknownFieldSet.newBuilder()
      .addField(1, UnknownFieldSet.Field.newBuilder().addVarint(9L).build())
      .addField(99, UnknownFieldSet.Field.newBuilder().addGroup(grp).build())
      .addField(4, UnknownFieldSet.Field.newBuilder()
        .addLengthDelimited(ByteString.copyFromUtf8("sv")).build())
      .build().toByteArray
    val ev = Proto.decodeDocEvent(0L, msg, 0, msg.length)
    ev.id shouldBe 9L
    ev.lang shouldBe "sv"
    ev.unknownFields shouldBe 1 // the whole group subtree is ONE unknown field
    ev.unknownBytes should be > 2
  }

  test("scalar re-occurrence is last-one-wins; absent fields take defaults") {
    val w = new Proto.Writer
    w.int64(1, 5L).int64(1, 6L).int64(1, 7L)
    val b = w.toByteArray
    val ev = Proto.decodeDocEvent(0L, b, 0, b.length)
    ev.id shouldBe 7L
    ev.text shouldBe "" // proto3 default
    ev.delta shouldBe 0L
    ev.tags shouldBe empty
    ev.unknownFields shouldBe 0
  }

  test("unpacked occurrences of the packed field concatenate (spec rule)") {
    val w = new Proto.Writer
    w.packedVarints(5, Seq(1L, 2L))
    w.tag(5, 0); Proto.writeVarint(w.out, 9L) // unpacked third element
    val b = w.toByteArray
    Proto.decodeDocEvent(0L, b, 0, b.length).tags shouldBe Seq(1L, 2L, 9L)
  }

  test("Confluent envelope round-trip and schema id extraction") {
    val (sid, ev) = Proto.decodeEnvelope(3L,
      Proto.encodeEnvelope(Proto.SchemaId, enc(3L)))
    sid shouldBe Proto.SchemaId
    ev.id shouldBe 3L
    ev.unknownBytes shouldBe 2 + 1 + 2 // 2-byte tag(1000) + len + "uu"
  }

  test("truncation: every cut either fails loudly or lands on a field boundary") {
    val id = 12345L
    // rebuild the message field-by-field, recording each boundary offset
    val boundaries = scala.collection.mutable.Set[Int](6) // after the header
    val w = new Proto.Writer
    def mark(): Unit = boundaries += 6 + w.out.size()
    w.int64(1, id); mark()
    w.sint64(2, -9L); mark()
    w.string(3, "boundary text"); mark()
    w.string(4, "en"); mark()
    w.packedVarints(5, Seq(1L, 2L, 3L)); mark()
    w.fixed64(6, 99L); mark()
    w.fixed32(7, 3); mark()
    w.nested(8)(m => { m.int64(1, 13L).int64(2, 2L); () }); mark()
    w.string(1000, "uu"); mark()
    val env = Proto.encodeEnvelope(Proto.SchemaId, w.toByteArray)
    for (cut <- 0 until env.length) {
      val t = java.util.Arrays.copyOf(env, cut)
      val r = try { Proto.decodeEnvelope(id, t); true }
      catch { case e: IllegalArgumentException =>
        e.getMessage should include("proto parse at byte"); false }
      withClue(s"cut at $cut: ") { r shouldBe boundaries.contains(cut) }
    }
  }

  test("loud failures: varint overflow, length overrun, group, wire 6, header") {
    def loud(b: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Proto.decodeDocEvent(0L, b, 0, b.length)
      }
      e.getMessage should include(why)
    }
    loud(Array.fill(11)(0x80.toByte), "longer than 10 bytes")
    loud(Array(0x1a, 0x7f).map(_.toByte), "crosses the message end") // field 3, len 127
    loud(Array(0x0b.toByte), "unterminated") // field 1 SGROUP, no EGROUP
    loud(Array(0x0c.toByte), "unmatched group end")
    loud(Array(0x0e.toByte), "reserved wire type 6")
    loud(Array(0x06.toByte), "illegal field number 0")
    intercept[IllegalArgumentException] {
      Proto.decodeEnvelope(0L, Array[Byte](1, 0, 0, 0, 9, 0))
    }.getMessage should include("bad magic")
    intercept[IllegalArgumentException] {
      Proto.decodeEnvelope(0L, Array[Byte](0, 0, 0))
    }.getMessage should include("6 bytes")
  }

  test("fuzz: 200 seeded random messages, ours -> library -> ours, byte-identical") {
    val rnd = new scala.util.Random(0x9207L) // deterministic
    for (_ <- 1 to 200) {
      val id = rnd.nextLong().abs % (1L << 56)
      val text = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      val lang = rnd.alphanumeric.take(1 + rnd.nextInt(3)).mkString
      val msg = Proto.encodeDocEvent(id, delta = rnd.nextLong() % 100000,
        text, lang, tags = Seq.fill(3)(rnd.nextInt(1 << 20).toLong),
        ts = rnd.nextLong(), score = rnd.nextInt(Int.MaxValue),
        unknownLen = rnd.nextInt(8))
      val ufs = UnknownFieldSet.parseFrom(msg)
      ufs.toByteArray shouldBe msg
      val ev = Proto.decodeDocEvent(id, msg, 0, msg.length)
      ev.id shouldBe id
      ev.text shouldBe text
      ev.tags.size shouldBe 3
    }
  }
}
