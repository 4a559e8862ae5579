package graft.decode

import org.apache.spark.sql.functions.{col, size => asize}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.ext.TextAnalysis
import graft.normalize.Normalize

/** Property tests for the scalar census (SURVEY §2.G): each Spark column
  * expression is checked against an independent Scala model over
  * generated inputs — the per-function analog of the reference's
  * table-driven tests (vulcan_test.go:226-267, main_test.go:674-720).
  *
  * Inputs are generated in batches and evaluated through one DataFrame
  * per property (per-row spark jobs would take minutes).
  */
class ScalarPropsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def evalBatch(inputs: Seq[String], expr: org.apache.spark.sql.Column): Seq[Any] =
    inputs.toDF("s").select(expr.as("out")).collect().toSeq.map(r => r.get(0))

  // --- B2 semver gate model: optional v, >= 3 dot parts, major == 0 --------
  private def modelSupported(v: String): Boolean = {
    val m = "^v?(\\d+)\\.".r.findFirstMatchIn(v)
    m.exists(_.group(1).toLong == 0) && v.split("\\.", -1).length >= 3
  }

  private val versionGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("0.0.0", "v0.1.2", "0.0.0.0", "1.0.0", "v1.2.3", "0.0", "v0",
      "", "x.y.z", "00.1.2", "v00.5.6.7", "0..", "v0..", ".0.0"),
    for {
      pre <- Gen.oneOf("", "v")
      nums <- Gen.listOfN(3, Gen.choose(0, 3)).map(_.mkString("."))
    } yield pre + nums)

  test("semver gate matches the reference model on generated versions") {
    val inputs = Gen.listOfN(300, versionGen).sample.get
    val got = evalBatch(inputs, Decode.supportedVersion(col("s")))
    inputs.zip(got).foreach { case (v, g) =>
      withClue(s"version '$v': ") {
        // Spark's boolean expr yields null (not false) when a cast fails
        // mid-expression; both mean "rejected"
        (g == true) shouldBe modelSupported(v)
      }
    }
  }

  // --- B6 AWS account normalization model ----------------------------------
  private def modelAws(id: String): Option[String] =
    if (id.matches("^arn:aws:iam::[0-9]{12}:root$")) Some(id)
    else if (id.matches("^[0-9]{12}$")) Some(s"arn:aws:iam::$id:root")
    else None

  private val awsGen: Gen[String] = Gen.oneOf(
    Gen.listOfN(12, Gen.numChar).map(_.mkString),
    Gen.listOfN(11, Gen.numChar).map(_.mkString),
    Gen.listOfN(13, Gen.numChar).map(_.mkString),
    Gen.listOfN(12, Gen.numChar).map(cs => s"arn:aws:iam::${cs.mkString}:root"),
    Gen.alphaNumStr.map(_.take(20)),
    Gen.const(""))

  test("AWS normalization matches the reference model on generated ids") {
    val inputs = Gen.listOfN(300, awsGen).sample.get
    val got = evalBatch(inputs, Normalize.normalizeAwsAccountId(col("s")))
    inputs.zip(got).foreach { case (id, g) =>
      withClue(s"id '$id': ") { Option(g) shouldBe modelAws(id) }
    }
  }

  // --- B4 key parse: valid iff exactly two /-separated segments ------------
  test("key parse validity matches split-count model") {
    val keyGen = for {
      n <- Gen.choose(0, 3)
      parts <- Gen.listOfN(n + 1, Gen.alphaNumStr.map(_.take(5)))
    } yield parts.mkString("/")
    val inputs = Gen.listOfN(300, keyGen).sample.get
    val df = inputs.toDF("key")
    val got = Decode.withParsedKey(df).select("key", "key_valid", "team_id", "asset_id").collect()
    got.foreach { r =>
      val k = r.getAs[String]("key")
      val expectValid = k.split("/", -1).length == 2
      withClue(s"key '$k': ") {
        r.getAs[Boolean]("key_valid") shouldBe expectValid
        if (expectValid) {
          r.getAs[String]("team_id") shouldBe k.split("/", -1)(0)
          r.getAs[String]("asset_id") shouldBe k.split("/", -1)(1)
        }
      }
    }
  }

  // --- G Rolfp parse -------------------------------------------------------
  test("rolfp parse recovers generated flag values") {
    val gen = for {
      r <- Gen.choose(0, 1); o <- Gen.choose(0, 1); l <- Gen.choose(0, 1)
      f <- Gen.choose(0, 1); p <- Gen.choose(0, 1); sv <- Gen.choose(0, 9)
    } yield (s"R:$r/O:$o/L:$l/F:$f/P:$p+S:$sv", Seq(r, o, l, f, p, sv))
    val inputs = Gen.listOfN(100, gen).sample.get
    val got = inputs.map(_._1).toDF("s")
      .select(Normalize.parseRolfp(col("s")).as("x"))
      .select("x.r", "x.o", "x.l", "x.f", "x.p", "x.s").collect()
    inputs.zip(got).foreach { case ((in, expect), row) =>
      withClue(s"rolfp '$in': ") {
        (0 until 6).map(row.getInt) shouldBe expect
      }
    }
  }

  // --- TextAnalysis invariants ---------------------------------------------
  test("shingle count is max(0, n_tokens - k + 1); hash60 stays in [0, 2^60)") {
    val textGen = Gen.listOf(Gen.alphaLowerStr.map(_.take(4)).suchThat(_.nonEmpty))
      .map(_.mkString(" "))
    val inputs = Gen.listOfN(200, textGen).sample.get.filter(_.nonEmpty)
    val rows = inputs.toDF("s").select(
      asize(TextAnalysis.tokens(col("s"))).as("n"),
      asize(TextAnalysis.shingles(TextAnalysis.tokens(col("s")), 3)).as("sh"),
      TextAnalysis.hash60(col("s"), 5).as("h")).collect()
    rows.foreach { r =>
      r.getAs[Int]("sh") shouldBe math.max(0, r.getAs[Int]("n") - 2)
      val h = r.getAs[Long]("h")
      h should (be >= 0L and be < (1L << 60))
    }
  }

  test("version gate is prefix-insensitive to a single leading v") {
    val cores = Gen.listOfN(50,
      Gen.listOfN(3, Gen.choose(0, 5)).map(_.mkString("."))).sample.get
    val inputs = cores ++ cores.map("v" + _)
    val got = evalBatch(inputs, Decode.supportedVersion(col("s")))
    val (bare, prefixed) = got.splitAt(cores.length)
    bare.zip(prefixed).zip(cores).foreach { case ((b, p), core) =>
      withClue(s"core '$core': ") { b shouldBe p }
    }
  }
}
