package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction + boilerplate removal — the ENTRY stage of a
 * crawl-sourced pretraining pipeline: raw pages come in as HTML, and every
 * downstream quality gate here ([[TextAnalysis.gopherQualityFlags]],
 * lang-id, the LM scorers, dedup) assumes extracted text. The reference
 * engine has no text surface at all (its delta is Iceberg,
 * reference: ballista/Cargo.toml:43-45), so this is beyond-reference
 * LLM-pipeline mandate territory, same family as Gopher/decontamination.
 *
 * Shape: the jusText / trafilatura rule family reduced to the repo's
 * RE2-safe exact-integer idiom —
 *
 *  1. strip non-content subtrees (`<script>`, `<style>`, comments);
 *  2. segment into BLOCKS at block-level tag boundaries (`<p>`, `<div>`,
 *     headings, lists, tables, nav/header/footer, …);
 *  3. per block, measure the text BEFORE stripping inline markup: anchor
 *     (`<a>…</a>`) character mass vs total character mass = link density,
 *     word count, stopword count;
 *  4. keep a block iff it looks like running prose: `n_words >= minWords`,
 *     `link_chars * 1000 <= total_chars * maxLinkMilli` (link-density rule
 *     as a cross-multiplication — no division, no floats) and
 *     `stopwords >= minStopwords`;
 *  5. emit the kept blocks joined with `\n` as the extracted document.
 *
 * Every step is regex + list arithmetic on ONE row — a pure per-row
 * projection with no shuffle, no state and no UDF — so the whole
 * extraction (a) replays bit-for-bit in a second engine (the DuckDB
 * oracle `text_html_extract` rebuilds the same page and re-runs the same
 * RE2 rules) and (b) runs unchanged on an append-mode STREAM
 * ([[graft.streaming.StreamingOps]] lifts [[extractedHtmlText]] as-is).
 * At 100 TB this is the ideal operator class: embarrassingly parallel,
 * codegen'd, zero exchange.
 *
 * Regex discipline (cross-engine): java.util.regex executes the Spark
 * side, RE2 the oracle side — patterns stay inside their common subset
 * (no lookahead/backreferences; inline `(?is)` flags; non-greedy `.*?`;
 * alternations ordered LONGEST-FIRST so first-match semantics agree).
 */
object HtmlExtract {

  /** Extraction rules; defaults follow the jusText "short/near-good"
    * boundary scaled to the synthetic corpus (docs are 20–200 words).
    * `maxLinkMilli` is the link-density ceiling in thousandths: a block
    * whose anchor text exceeds maxLinkMilli/1000 of its characters is
    * navigation/ads, not prose. */
  final case class HtmlRules(
      minWords: Int = 10,
      maxLinkMilli: Long = 300L,
      minStopwords: Int = 1,
      promoteNearGood: Boolean = false)

  /** Block-boundary tags, LONGEST-FIRST (see class doc). `<a>`, `<b>`,
    * `<span>`, … are inline: they stay inside their block so link
    * density can be measured before tags are stripped. */
  val BlockTags: String =
    "blockquote|section|article|aside|header|footer|title|thead|tbody|" +
      "table|form|nav|div|ul|ol|li|dl|dt|dd|pre|tr|td|th|p|h[1-6]|br|hr"

  /** The five non-content patterns + the block-boundary pattern, shared
    * verbatim with the oracle SQL (see [[graft.queries.PipelineQueries]]). */
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"
  val CommentRe = "(?s)<!--.*?-->"
  val BlockRe: String = s"(?i)</?($BlockTags)(\\s[^>]*)?/?>"
  val AnchorRe = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"
  val TagRe = "(?s)<[^>]*>"

  /** Minimal entity decode (the five named entities a rule extractor must
    * get right plus `&#39;`); `&amp;` LAST so double-escaped input
    * (`&amp;lt;`) decodes to the literal text `&lt;`, never to `<`. */
  def decodeEntities(c: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** markup fragment → visible text: strip remaining (inline) tags to a
    * space, decode entities, collapse whitespace, trim. */
  private def visibleText(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, TagRe, " ")),
      "\\s+", " "))

  /** Strip `<script>`/`<style>` subtrees and comments — their CONTENT
    * must never leak into a block's text (a script body is "text" to a
    * naive tag stripper). */
  def stripNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      ScriptRe, " "), StyleRe, " "), CommentRe, " ")

  /** Raw block fragments (markup still inline) split at block-tag
    * boundaries. The sentinel U+0001 cannot collide with content (a
    * control char is not valid HTML text); DuckDB twin `chr(1)`. Empty
    * fragments are filtered downstream. */
  private def rawBlocks(html: Column): Column =
    split(regexp_replace(stripNonContent(html), BlockRe, "\u0001"),
      "\u0001")

  /** Per-block measurements as an array of structs
    * `{clean, total_chars, link_chars, n_words, n_stop, keep}` — the
    * whole jusText rule chain on one row. Blocks that are empty after
    * tag-stripping are dropped (they are tag-boundary artifacts, not
    * content).
    *
    * PERF: Column `val`s inline their whole subtree at every reference —
    * a single-stage struct would re-run the multi-regex [[visibleText]]
    * chain once per referencing field (~6× per block, measured 3-4×
    * wall). The NESTED transforms below bind each regex-heavy value to a
    * lambda variable once (stage 1), derive the cheap word counts from
    * the bound field (stage 2), and the pure-arithmetic keep flag last
    * (stage 3) — each regex executes exactly once per block. */
  def blockStructs(html: Column, rules: HtmlRules = HtmlRules()): Column = {
    val stops = TextAnalysis.stopwords
    // stage 1: the two regex-heavy extractions, once per block each
    val extracted = transform(rawBlocks(html), b => struct(
      visibleText(b).as("clean"),
      length(visibleText(
          array_join(regexp_extract_all(b, lit(AnchorRe), lit(1)), " ")))
        .cast("long").as("link_chars")))
    // stage 2: word-grain measurements off the BOUND clean field
    val measured = transform(extracted, s => {
      val clean = s.getField("clean")
      val words = split(clean, " ")
      struct(
        clean.as("clean"),
        length(clean).cast("long").as("total_chars"),
        s.getField("link_chars").as("link_chars"),
        size(words).cast("long").as("n_words"),
        size(filter(words, w => w.isin(stops.map(lit): _*))).cast("long")
          .as("n_stop"))
    })
    // stage 3: the keep decision as pure arithmetic over bound fields;
    // a NEAR-GOOD block fails ONLY the length rule (link density and
    // stopword presence both pass — short prose, not navigation)
    val flagged = transform(measured, s => {
      val linkOk = s.getField("link_chars") * lit(1000L) <=
        s.getField("total_chars") * lit(rules.maxLinkMilli)
      val stopOk = s.getField("n_stop") >= rules.minStopwords
      val keep = s.getField("n_words") >= rules.minWords && linkOk && stopOk
      struct(
        s.getField("clean").as("clean"),
        s.getField("total_chars").as("total_chars"),
        s.getField("link_chars").as("link_chars"),
        s.getField("n_words").as("n_words"),
        s.getField("n_stop").as("n_stop"),
        keep.as("keep"),
        (!keep && linkOk && stopOk).as("near_good"))
    })
    val nonEmpty = filter(flagged, s => s.getField("clean") =!= "")
    if (!rules.promoteNearGood) dropNearGood(nonEmpty)
    else {
      // jusText's context rule (one-hop form): a near-good block with a
      // KEPT neighbor (at base grain, over the non-empty blocks) is
      // promoted — short prose between paragraphs survives, isolated
      // short boilerplate still drops. The array(...)→transform wrapper
      // BINDS the block array to a lambda variable so neighbor lookups
      // (try_element_at, 1-based) don't re-inline the whole extraction
      // per block (the Column-tree duplication trap, see class doc).
      val promoted = transform(array(nonEmpty), arr =>
        transform(arr, (s, i) => {
          def keptAt(pos: Column) = coalesce(
            try_element_at(arr, pos).getField("keep"), lit(false))
          struct(
            s.getField("clean").as("clean"),
            s.getField("total_chars").as("total_chars"),
            s.getField("link_chars").as("link_chars"),
            s.getField("n_words").as("n_words"),
            s.getField("n_stop").as("n_stop"),
            (s.getField("keep") || (s.getField("near_good") &&
              (keptAt(i) || keptAt(i + lit(2))))).as("keep"),
            s.getField("near_good").as("near_good"))
        }))
      dropNearGood(promoted.getItem(0))
    }
  }

  /** Strip the internal near_good scratch field so the public struct
    * shape is rule-independent. */
  private def dropNearGood(blocks: Column): Column =
    transform(blocks, s => struct(
      s.getField("clean").as("clean"),
      s.getField("total_chars").as("total_chars"),
      s.getField("link_chars").as("link_chars"),
      s.getField("n_words").as("n_words"),
      s.getField("n_stop").as("n_stop"),
      s.getField("keep").as("keep")))

  /** The extracted-document Column — kept blocks joined with `\n`, plus
    * nothing else: the pure per-row form the STREAMING lift uses. */
  def extractedHtmlText(html: Column,
                        rules: HtmlRules = HtmlRules()): Column = {
    val kept = filter(blockStructs(html, rules), s => s.getField("keep"))
    array_join(transform(kept, s => s.getField("clean")), "\n")
  }

  /** Block-grain relation: one row per non-empty block with its
    * measurements and keep flag — the inspection/debugging grain
    * (jusText's per-paragraph classification view). */
  def htmlBlocks(docs: DataFrame, idCol: String, htmlCol: String,
                 rules: HtmlRules = HtmlRules()): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(blockStructs(col(htmlCol), rules)).as(Seq("block_idx", "b")))
      .select(col("id"), col("block_idx").cast("long").as("block_idx"),
        col("b.clean").as("block_text"), col("b.total_chars"),
        col("b.link_chars"), col("b.n_words"), col("b.n_stop"),
        when(col("b.keep"), 1L).otherwise(0L).as("keep"))

  /** Doc-grain extraction: `(id, text, n_blocks, n_kept)` — `text` is the
    * boilerplate-free document the rest of the pipeline consumes. Two
    * projections: the first materializes the block array ONCE per row,
    * the second's three consumers read the materialized column (a
    * single-select form would inline the whole extraction three
    * times — same duplication trap as [[blockStructs]]'s doc). */
  def extractHtmlText(docs: DataFrame, idCol: String, htmlCol: String,
                      rules: HtmlRules = HtmlRules()): DataFrame =
    docs.select(col(idCol).as("id"),
        blockStructs(col(htmlCol), rules).as("__gf_blocks"))
      .select(col("id"),
        array_join(transform(
            filter(col("__gf_blocks"), s => s.getField("keep")),
            s => s.getField("clean")), "\n").as("text"),
        size(col("__gf_blocks")).cast("long").as("n_blocks"),
        size(filter(col("__gf_blocks"), s => s.getField("keep")))
          .cast("long").as("n_kept"))

  /** The page TITLE as visible text (first `<title>` element, entity-
    * decoded, whitespace-collapsed; '' when absent) — the one piece of
    * head metadata a crawl pipeline keeps (dedup keys, display). Pure
    * per-row, stream-safe. */
  def htmlTitle(html: Column): Column =
    visibleText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** The declared page language (`<html lang="…">`, first match; ''
    * when absent) — the crawl-side language hint a pipeline checks
    * against its own lang-id. Pure per-row, stream-safe. */
  def htmlLang(html: Column): Column =
    regexp_extract(html,
      "(?is)<html[^>]*?\\slang\\s*=\\s*[\"']?([A-Za-z-]+)", 1)

  /** Deterministic synthetic page for the fixtures/oracle: the document
    * text wrapped in a realistic page skeleton — head with title, style
    * and script subtrees (must NOT leak), a nav link bar (link density
    * ~1 → dropped), a heading (too short → dropped), the body text as a
    * `<p>` with an entity (`&amp;`) to pin decoding (kept), a short
    * trailing `<p>` (dropped), an ad `<div>` (link-dense → dropped) and
    * a footer (short → dropped). The SQL twin is
    * [[graft.queries.PipelineQueries]]'s `syntheticHtmlSql`. */
  def syntheticHtml(id: Column, text: Column): Column =
    concat(
      lit("<html><head><title>doc "), id, lit("</title>"),
      lit("<style>p { color: #333; }</style>"),
      lit("<script>var x = 1; if (x < 2) { x = 3; }</script>"),
      lit("</head><body>"),
      lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about</a> " +
        "<a href=\"/contact\">contact us</a></nav>"),
      lit("<h1>document "), id, lit("</h1>"),
      lit("<p>"), text, lit(" alpha &amp; beta</p>"),
      lit("<p>short tail</p>"),
      lit("<div><a href=\"/buy\">click here to buy</a> now</div>"),
      lit("<!-- tracking pixel -->"),
      lit("<footer>copyright &amp; terms <a href=\"/tos\">tos</a>" +
        "</footer></body></html>"))
}
