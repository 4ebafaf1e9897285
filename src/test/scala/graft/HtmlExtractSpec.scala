package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract
import graft.operators.HtmlExtract.HtmlRules

/** HTML → text extraction: hand-checkable pages exercising every rule
  * (script/style/comment stripping, block segmentation, link density,
  * length + stopword gates, entity decode, edge cases). */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val prose =
    "the quick brown fox jumps over a lazy dog and it runs far away today"

  private def extract(html: String, rules: HtmlRules = HtmlRules())
      : (String, Long, Long) = {
    val r = HtmlExtract.extractHtmlText(
      Seq((1L, html)).toDF("id", "html"), "id", "html", rules).collect()(0)
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("script/style/comment content never leaks into blocks") {
    val (text, nBlocks, nKept) = extract(
      s"<html><head><style>body { color: red }</style>" +
        s"<script>var the = 'a of and to in is it words';</script>" +
        s"</head><body><!-- the a of and --><p>$prose</p></body></html>")
    assert(text === prose)
    assert(nBlocks === 1L && nKept === 1L)
  }

  test("link-dense navigation drops; prose with an inline link survives") {
    val nav = "<nav><a href=\"/\">home</a> <a href=\"/x\">about pages</a>" +
      " <a href=\"/y\">contact the team now</a></nav>"
    // one short link inside a long paragraph: density far below 30%
    val para = s"<p>the quick brown fox <a href=\"/w\">wiki</a> jumps over" +
      " a lazy dog and it runs far away</p>"
    val (text, nBlocks, nKept) = extract(s"<body>$nav$para</body>")
    assert(nBlocks === 2L && nKept === 1L)
    assert(text === "the quick brown fox wiki jumps over a lazy dog and " +
      "it runs far away")
  }

  test("short blocks and stopword-free blocks drop") {
    val (text, nBlocks, nKept) = extract(
      s"<h1>big heading words</h1>" + // < minWords
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu</p>" + // 12 words but ZERO stopwords
        s"<p>$prose</p>")
    assert(nBlocks === 3L && nKept === 1L)
    assert(text === prose)
  }

  test("entities decode; double-escaped stays literal; inline tags strip") {
    val (text, _, nKept) = extract(
      s"<p>the quick <b>brown</b> fox says &quot;hi&quot; &amp; waves " +
        "x &lt; y and &amp;lt; stays as is it goes on today ok</p>")
    assert(nKept === 1L)
    assert(text === "the quick brown fox says \"hi\" & waves x < y and " +
      "&lt; stays as is it goes on today ok")
  }

  test("multiple kept blocks join with newline in document order") {
    val p2 = "a second paragraph of the same prose it keeps going and " +
      "going along nicely"
    val (text, _, nKept) =
      extract(s"<p>$prose</p><div>junk</div><p>$p2</p>")
    assert(nKept === 2L)
    assert(text === s"$prose\n$p2")
  }

  test("empty / all-boilerplate pages extract to empty, never null") {
    val r = HtmlExtract.extractHtmlText(
      Seq((1L, "<nav><a href=\"/\">home</a></nav>"), (2L, ""))
        .toDF("id", "html"), "id", "html").orderBy("id").collect()
    assert(r(0).getString(1) === "" && r(0).getLong(3) === 0L)
    assert(r(1).getString(1) === "" && r(1).getLong(2) === 0L)
  }

  test("htmlBlocks measures link chars and words per block") {
    val rows = HtmlExtract.htmlBlocks(
      Seq((7L, s"<nav><a href=\"/\">home base</a> rest</nav><p>$prose</p>"))
        .toDF("id", "html"), "id", "html").orderBy("block_idx").collect()
    assert(rows.length === 2)
    val nav = rows(0)
    assert(nav.getString(2) === "home base rest")
    assert(nav.getLong(3) === 14L) // total chars
    assert(nav.getLong(4) === 9L) // "home base"
    assert(nav.getLong(5) === 3L && nav.getLong(7) === 0L)
    val p = rows(1)
    assert(p.getLong(7) === 1L && p.getString(2) === prose)
  }

  test("rules are configurable (minWords boundary is >=)") {
    val five = "the fox is in it"
    val strict = extract(s"<p>$five</p>", HtmlRules(minWords = 6))
    val loose = extract(s"<p>$five</p>", HtmlRules(minWords = 5))
    assert(strict._3 === 0L && loose._3 === 1L)
  }

  test("promoteNearGood keeps short prose beside kept blocks, not islands") {
    val p2 = "a second paragraph of the same prose it keeps going and " +
      "going along nicely"
    // "the end is here" (4 words, has stopwords, no links) is NEAR-GOOD:
    // dropped under base rules, promoted when adjacent to a kept block
    val page = s"<p>$prose</p><h2>the end is here</h2>" +
      "<nav><a href=\"/\">all of the links in here</a></nav>" +
      s"<h3>the lone short one</h3><div>junk</div><p>$p2</p>"
    val base = extract(page)
    val promo = extract(page, HtmlRules(promoteNearGood = true))
    assert(base._3 === 2L) // only the two long paragraphs
    // promotion adds "the end is here" (next to a kept paragraph) but
    // NOT "the lone short one" (neighbors: nav-dropped and junk-dropped)
    assert(promo._3 === 3L)
    assert(promo._1 === s"$prose\nthe end is here\n$p2")
    // the nav block passes stopwords but fails LINK DENSITY: never
    // near-good, never promoted even though it sits beside kept blocks
    assert(!promo._1.contains("links in here"))
  }

  test("htmlTitle extracts the decoded title; empty when absent") {
    val r = HtmlExtract.htmlTitle(col("html"))
    val rows = Seq(
      (1L, "<html><head><title>Fish &amp; Chips  menu</title></head>" +
        "<body><p>x</p></body></html>"),
      (2L, "<body><p>no head</p></body>"),
      (3L, "<TITLE>caps <b>bold</b></TITLE>"))
      .toDF("id", "html").select(col("id"), r.as("t")).orderBy("id")
      .collect().map(_.getString(1))
    assert(rows(0) === "Fish & Chips menu")
    assert(rows(1) === "")
    assert(rows(2) === "caps bold")
  }

  test("uppercase tags and self-closing forms segment too") {
    val (text, nBlocks, nKept) = extract(
      s"<P>$prose</P><BR/><DIV class=\"x\">tiny</DIV>")
    assert(nBlocks === 2L && nKept === 1L && text === prose)
  }
}
