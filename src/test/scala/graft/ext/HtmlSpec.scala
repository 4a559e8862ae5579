package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The real HTML tokenizer behind q_html_extract / q_wet_pipeline
  * (Html.scala): entity decoding, RCDATA title, raw-text script/style,
  * attribute forms, the visible-text collapse contract, HTML5 text-level
  * leniencies, and loud failure on structural damage. No SparkSession \u2014
  * the tokenizer is pure; the Spark plumbing is driver-gated by the two
  * oracle queries.
  */
class HtmlSpec extends AnyFunSuite with Matchers {

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("hostOfHref cuts the authority at '/', '?' and '#'") {
    Html.hostOfHref("https://h.example/path") shouldBe Some("h.example")
    Html.hostOfHref("https://h.example?q=1") shouldBe Some("h.example")
    Html.hostOfHref("https://h.example#frag") shouldBe Some("h.example")
    Html.hostOfHref("https://h.example") shouldBe Some("h.example")
    Html.hostOfHref("relative/path") shouldBe None
    Html.hostOfHref("https://#frag") shouldBe None
  }

  // ---- the render/parse round-trip -------------------------------------------

  test("rendered page extracts exactly: title, blocks, links, tag census") {
    val text = "alpha beta  gamma" // double space: collapse contract
    val ex = Html.parseHtml(7L, Html.renderHtml(7L, "srcX", text, 3))
    ex.title shouldBe "Doc 7 & srcX"
    ex.bodyText shouldBe
      "Doc 7\nalpha beta gamma\n5 < 7 && \"q\" \u2014 ok!\nlink 0 link 1 link 2"
    ex.links.map(_._1) shouldBe Vector(
      "https://h7.example.com/p/7", "https://h0.example.com/p/7",
      "https://h1.example.com/p/7")
    ex.links.map(_._2) shouldBe Vector("link 0", "link 1", "link 2")
    ex.nTags shouldBe 13
  }

  test("body text with markup-significant chars survives the escape round-trip") {
    for (seed <- 1L to 40L) {
      val t = gen(Gen.listOf(Gen.oneOf("a", "&", "<", ">", "&amp;", " ",
        "b<c", "x&y", "<p>", "</p>", "&#65;")).map(_.mkString(" ")), seed)
      val body = t.replaceAll("[ \t\r\n]+", " ").trim
      val ex = Html.parseHtml(seed, Html.renderHtml(seed, "s", t, 1))
      val expected = (Seq(s"Doc $seed") ++ (if (body.isEmpty) Nil else Seq(body)) ++
        Seq("5 < 7 && \"q\" \u2014 ok!", "link 0")).mkString("\n")
      ex.bodyText shouldBe expected
    }
  }

  // ---- character references ----------------------------------------------------

  test("named, decimal and hex references decode; invalid ones follow HTML5") {
    def body(s: String): String =
      Html.parseHtml(0L, s"<body><p>$s</p></body>").bodyText
    body("&amp;&lt;&gt;&quot;&apos;") shouldBe "&<>\"'"
    body("&#65;&#x42;&#x63;") shouldBe "ABc"
    body("&nbsp;x") shouldBe "\u00a0x" // NBSP is not collapse-whitespace
    // HTML5 leniency: unknown names and bare '&' are literal text
    body("&bogus; &amp") shouldBe "&bogus; &amp"
    body("fish & chips") shouldBe "fish & chips"
    // numeric references must be well-formed: loud failures
    val e1 = intercept[IllegalArgumentException](body("&#;"))
    e1.getMessage should include("no digits")
    val e2 = intercept[IllegalArgumentException](body("&#x110000;"))
    e2.getMessage should include("invalid codepoint")
    val e3 = intercept[IllegalArgumentException](body("&#xD800;"))
    e3.getMessage should include("invalid codepoint")
    val e4 = intercept[IllegalArgumentException](body("&#65"))
    e4.getMessage should include("without ';'")
  }

  // ---- raw text / RCDATA --------------------------------------------------------

  test("script/style raw text never terminates early or leaks into visible text") {
    val page = "<body><script>var a = \"</div> <b>x</b>\"; if (1 < 2) {}</script>" +
      "<p>ok</p><style>p { content: '</p>'; }</style></body>"
    val ex = Html.parseHtml(0L, page)
    ex.bodyText shouldBe "ok"
    ex.rawSkipped shouldBe
      "var a = \"</div> <b>x</b>\"; if (1 < 2) {}".length +
      "p { content: '</p>'; }".length
    // end tag match is ASCII case-insensitive, per spec
    Html.parseHtml(0L, "<body><script>x</SCRIPT><p>y</p></body>")
      .bodyText shouldBe "y"
  }

  test("RCDATA title: entities decoded, tags literal, body excluded") {
    val ex = Html.parseHtml(0L,
      "<head><title>A &amp; B <i>not a tag</i></title></head><body><p>t</p></body>")
    ex.title shouldBe "A & B <i>not a tag</i>"
    ex.bodyText shouldBe "t"
  }

  // ---- attribute forms -----------------------------------------------------------

  test("double-quoted, single-quoted, unquoted and bare attributes all parse") {
    val ex = Html.parseHtml(0L,
      """<body><a href="https://a/1">one</a><a href='https://a/2'>two</a>""" +
        "<a href=https://a/3>three</a><a href=\"x&amp;y\" data-k>amp</a></body>")
    ex.links.map(_._1) shouldBe
      Vector("https://a/1", "https://a/2", "https://a/3", "x&y")
    ex.links.map(_._2) shouldBe Vector("one", "two", "three", "amp")
  }

  // ---- HTML5 text-level leniencies ------------------------------------------------

  test("literal '<' before a non-name char is text, not a tag") {
    Html.parseHtml(0L, "<body><p>5 < 7 and 2 <= 3</p></body>")
      .bodyText shouldBe "5 < 7 and 2 <= 3"
  }

  test("unclosed elements at EOF are tolerated (browsers render them)") {
    Html.parseHtml(0L, "<body><p>partial text").bodyText shouldBe "partial text"
  }

  // ---- loud structural failures ----------------------------------------------------

  test("structural damage fails loudly with the char offset") {
    val cases = Seq(
      "<body><p>x</p><!-- never closed" -> "unterminated comment",
      "<body><p" -> "EOF inside <p> tag",
      "<body><p class=\"x>text" -> "unterminated quoted attribute",
      "<body><script>var x = 1;" -> "unterminated <script>",
      "<head><title>no end" -> "unterminated <title>",
      "<body><p>x</p></body" -> "unterminated close tag")
    cases.foreach { case (page, why) =>
      val e = intercept[IllegalArgumentException](Html.parseHtml(9L, page))
      withClue(s"page '$page': ") {
        e.getMessage should include(why)
        e.getMessage should include("at char")
      }
    }
  }

  test("property: truncation either fails loudly or yields a no-longer extraction (80 cuts)") {
    val full = Html.renderHtml(42L, "srcZ", "alpha beta gamma delta", 4)
    val fullEx = Html.parseHtml(42L, full)
    for (seed <- 1L to 80L) {
      val cut = gen(Gen.choose(1, full.length - 1), seed * 7L)
      try {
        val ex = Html.parseHtml(42L, full.substring(0, cut))
        // a cut landing in a text node is legal HTML \u2014 but extraction
        // can never exceed the full page's
        assert(ex.bodyText.length <= fullEx.bodyText.length)
        assert(ex.links.size <= fullEx.links.size)
        assert(ex.nTags <= fullEx.nTags)
      } catch {
        case e: IllegalArgumentException =>
          e.getMessage should include("at char")
      }
    }
  }

  // ---- nesting / structure ---------------------------------------------------------

  test("block boundaries split text; inline tags do not") {
    val ex = Html.parseHtml(0L,
      "<body><div>a <b>bold</b> c</div><ul><li>one</li><li>two</li></ul></body>")
    ex.bodyText shouldBe "a bold c\none\ntwo"
  }

  test("block elements inside <a> keep the anchor text across the block flush") {
    // card links — block content inside an anchor is valid HTML5
    val ex = Html.parseHtml(0L,
      "<body>pre<a href=\"u\">head<p>body text</p>tail</a>post</body>")
    ex.links shouldBe Vector(("u", "head body text tail"))
    ex.bodyText shouldBe "prehead\nbody text\ntailpost"
  }

  test("nested <a> auto-closes the outer link (browser behavior); EOF keeps an open one") {
    val ex = Html.parseHtml(0L,
      "<body><a href=\"https://x\">see <a href=\"https://y\">here</a></body>")
    ex.links shouldBe Vector(("https://x", "see"), ("https://y", "here"))
    Html.parseHtml(0L, "<body><a href=\"u\">dangling")
      .links shouldBe Vector(("u", "dangling"))
  }

  test("a longer end-tag name does not terminate raw text early") {
    val ex = Html.parseHtml(0L,
      "<body><script>var s = \"</scripts> fake\";</script><p>ok</p></body>")
    ex.bodyText shouldBe "ok"
    ex.rawSkipped shouldBe "var s = \"</scripts> fake\";".length
  }

  test("self-closing flag is ignored on script (HTML5 non-foreign rule)") {
    val ex = Html.parseHtml(0L,
      "<body><script src=\"x\"/>var a = \"</div>\";</script><p>ok</p></body>")
    ex.bodyText shouldBe "ok"
    ex.rawSkipped shouldBe "var a = \"</div>\";".length
  }

  test("anchor text collapses internal whitespace and nested inline markup") {
    val ex = Html.parseHtml(0L,
      "<body><a href=\"u\">  spaced <b>inner</b>\n text </a></body>")
    ex.links shouldBe Vector(("u", "spaced inner text"))
  }
}
