package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl pipelines — the step between raw
  * WARC payloads ([[graft.sources.WarcIngest]]) and the text-quality /
  * dedup operators, which all assume prose. Built as a chain of
  * `regexp_replace` / `replace` Columns (codegen'd, zero-shuffle,
  * scan-parallel at any corpus size) rather than a UDF-hosted DOM
  * parser: crawl-scale extraction wants a linear pass, and the chain is
  * portable to the DuckDB oracle verbatim — the SQL is GENERATED from
  * the same stage lists, so the two engines cannot drift silently.
  *
  * Patterns stay inside the RE2 subset (no backreferences, no
  * lookaround) so the same strings run identically on Java regex
  * (Spark) and RE2 (DuckDB).
  *
  * Decode order matters: named/numeric entities first, `&amp;` LAST —
  * HTML decodes once, so `&amp;lt;` must yield the literal `&lt;`, and
  * replacing `&amp;` early would double-decode it.
  */
object HtmlFunctions {

  /** Tag-strip chain as (pattern, replacement); block-level tags break
    * to newline so paragraph structure survives for the line-based
    * cleaners (C4 rules, line dedup). */
  val stripStages: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> " ",                         // comments
    "(?is)<script[^>]*>.*?</script\\s*>" -> " ",     // script incl. body
    "(?is)<style[^>]*>.*?</style\\s*>" -> " ",       // style incl. body
    "(?is)</?(p|br|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|blockquote|section|article|header|footer)[^>]*>" -> "\n",
    "<[^>]*>" -> " ")                                // every other tag

  /** Literal entity decodes (plain `replace`, not regex). */
  val entityStages: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
    "&amp;" -> "&") // must stay last (single-decode)

  /** Visible text of an HTML document: drop comments/script/style,
    * break block-level tags to newlines, strip remaining tags, decode
    * the core entities, collapse runs of whitespace (newlines survive
    * as single line breaks). */
  def htmlToText(html: Column): Column = {
    val stripped = stripStages.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val decoded = entityStages.foldLeft(stripped) { case (c, (ent, rep)) =>
      replace(c, lit(ent), lit(rep))
    }
    // trim() strips only spaces in both engines — anchor-strip so
    // leading/trailing block-tag newlines go too
    regexp_replace(
      regexp_replace(regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " "),
        "\\s*\\n\\s*", "\n"),
      "^\\s+|\\s+$", "")
  }

  /** `<title>` content (first match), entity-decoded, whitespace
    * collapsed; empty string when absent. */
  def htmlTitle(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)
    val decoded = entityStages.foldLeft(raw) { case (c, (ent, rep)) =>
      replace(c, lit(ent), lit(rep))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Outbound link targets: every double-quoted href value, document
    * order — the input to URL canonicalization / link-graph work. */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  // ---- the same chain as ANSI SQL (the DuckDB oracle) ----

  /** `htmlToText` over a SQL expression. Replacement newlines emit as
    * `chr(10)` so the oracle JSON stays control-character-free (the
    * text_normalize precedent). */
  def htmlToTextSql(expr: String): String = {
    val stripped = stripStages.foldLeft(expr) { case (e, (pat, rep)) =>
      s"regexp_replace($e, '${sqlQuote(pat)}', ${sqlRep(rep)}, 'g')"
    }
    val decoded = entityStages.foldLeft(stripped) { case (e, (ent, rep)) =>
      s"replace($e, '${sqlQuote(ent)}', '${sqlQuote(rep)}')"
    }
    s"regexp_replace(regexp_replace(regexp_replace($decoded, " +
      s"'[ \\t\\x0B\\f\\r]+', ' ', 'g'), '\\s*\\n\\s*', chr(10), 'g'), " +
      s"'^\\s+|\\s+$$', '', 'g')"
  }

  /** `htmlTitle` over a SQL expression. */
  def htmlTitleSql(expr: String): String = {
    val raw = s"regexp_extract($expr, '(?is)<title[^>]*>(.*?)</title\\s*>', 1)"
    val decoded = entityStages.foldLeft(raw) { case (e, (ent, rep)) =>
      s"replace($e, '${sqlQuote(ent)}', '${sqlQuote(rep)}')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  private def sqlRep(rep: String): String =
    if (rep == "\n") "chr(10)" else s"'${sqlQuote(rep)}'"

  // DuckDB standard strings treat backslash literally — only quotes
  // need doubling.
  private def sqlQuote(s: String): String = s.replace("'", "''")
}
