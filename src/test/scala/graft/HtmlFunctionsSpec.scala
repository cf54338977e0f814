package graft

import org.apache.spark.sql.functions._

import graft.functions.HtmlFunctions._

/** HTML → text extraction (`functions/HtmlFunctions.scala`): tag classes,
  * script/style/comment removal (including the bare `<` inside scripts
  * that breaks naive strippers), single-decode entity order, block-tag
  * line structure, title/link extraction. Engine parity with DuckDB is
  * pinned by the text_html_extract oracle (the SQL is generated from the
  * same stage lists); these cases pin the Spark-side semantics.
  */
class HtmlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(htmlToText(col("h"))).as[String].head()

  test("scripts/styles/comments vanish even with bare '<' in the body") {
    val html = "<p>keep</p><script>if (1 < 2) { alert(\"x\") }</script>" +
      "<style>p { color: red }</style><!-- note -->end"
    assert(extract(html) == "keep\nend")
  }

  test("block tags become line breaks; inline tags become plain spaces") {
    assert(extract("<h1>Title</h1><p>one <b>bold</b> two</p><br>three") ==
      "Title\none bold two\nthree")
  }

  test("entities decode once, in the spec'd order") {
    // &amp;lt; is the literal string "&lt;" — NOT a second-round <
    assert(extract("a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &nbsp;f") ==
      "a &lt; b <c> \"d\" 'e' f")
  }

  test("whitespace collapses but single line structure survives") {
    assert(extract("<p>  a   b  </p>\n\n\n<p>c</p>") == "a b\nc")
  }

  test("title: entity-decoded, collapsed; missing title yields empty") {
    val t = Seq("<title> A &amp; B \n C </title>", "<p>no title</p>")
      .toDF("h").select(htmlTitle(col("h"))).as[String].collect()
    assert(t.toSeq == Seq("A & B C", ""))
  }

  test("links: every double-quoted href in document order") {
    val links = Seq(
      """<a href="https://a.example/x">x</a><area HREF="https://b.example/y">""")
      .toDF("h").select(htmlLinks(col("h"))).as[Seq[String]].head()
    assert(links == Seq("https://a.example/x", "https://b.example/y"))
  }

  test("generated SQL embeds every stage in order with chr(10) newlines") {
    val sql = htmlToTextSql("html")
    stripStages.foreach { case (pat, _) =>
      assert(sql.contains(pat.replace("'", "''")), s"missing stage: $pat")
    }
    entityStages.foreach { case (ent, _) => assert(sql.contains(ent)) }
    assert(sql.contains("chr(10)") && !sql.contains("\n"))
    // &amp; must be the LAST entity replace (single-decode order)
    assert(sql.indexOf("'&amp;'") > sql.indexOf("'&lt;'"))
  }
}
