package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the step-1 of every web-crawl corpus
  * (CommonCrawl WET-style): drop script/style/comment subtrees, turn
  * block boundaries into newlines, strip the remaining markup, decode
  * the half-dozen entities that dominate real pages, and collapse
  * whitespace — plus the metadata a quality filter wants alongside
  * (title, link/tag densities).
  *
  * Everything is a chain of codegen'd `regexp_replace` Columns — no UDF,
  * no parser object per row, stays inside whole-stage codegen. The
  * pattern dialect is deliberately the RE2 ∩ java.util.regex subset
  * (inline `(?is)` flags, non-greedy, character classes; NO
  * backreferences — script and style get separate patterns — and no
  * lookaround), so an external engine replays the extraction
  * bit-for-bit.
  *
  * This is a tag-stripper, not a browser: malformed nesting degrades to
  * extra whitespace, never to an exception — the right failure mode at
  * crawl scale, where a quality gate downstream catches garbage pages.
  */
object HtmlText {

  /** The extraction chain on one column, exposed for reuse in streams. */
  def extractText(html: Column): Column = {
    // the whole head subtree is chrome, not content — title text must
    // not leak into the body (it has its own column via extractTitle)
    // \b on the open tag and a whitespace-only close so HTML5 <header>
    // subtrees (real content) match NEITHER side — `</head[^>]*>` would
    // swallow everything up to a `</header>` on pages missing </head>
    var c = regexp_replace(html, "(?is)<head\\b[^>]*>.*?</head[ \t\n]*>", " ")
    c = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    c = regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // block-level boundaries become newlines so paragraphs survive
    c = regexp_replace(c,
      "(?i)</?(p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>", "\n")
    c = regexp_replace(c, "<[^>]*>", " ")
    // entity decode — &amp; LAST so "&amp;lt;" decodes to the literal
    // text "&lt;" (one level), matching how the page displayed it
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    c = regexp_replace(c, "&#39;", "'")
    c = regexp_replace(c, "&nbsp;", " ")
    c = regexp_replace(c, "&amp;", "&")
    // whitespace discipline: spaces/tabs/CR collapse to one space,
    // newline runs (with surrounding spaces) to one newline, then trim.
    // Explicit classes, not \s — \s differs between regex dialects.
    c = regexp_replace(c, "[ \t\r]+", " ")
    c = regexp_replace(c, " ?\n[ \n]*", "\n")
    c = regexp_replace(c, "^[ \n]+", "")
    regexp_replace(c, "[ \n]+$", "")
  }

  /** The title element's inner text (first match), entity-decoded the
    * same way; empty string when absent.
    */
  def extractTitle(html: Column): Column =
    extractText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** (id, title, text, n_links, n_tags, text_chars) per page. Link and
    * tag counts run on the RAW markup (they are structure metrics, and
    * a quality gate uses links-per-char as boilerplate signal).
    */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(
      col(idCol),
      extractTitle(col(htmlCol)).as("title"),
      extractText(col(htmlCol)).as("text"),
      regexp_count(col(htmlCol), lit("(?i)<a[ >]")).as("n_links"),
      regexp_count(col(htmlCol), lit("</?[a-zA-Z][^>]*>")).as("n_tags"))
      .withColumn("text_chars", length(col("text")).cast("long"))
}
