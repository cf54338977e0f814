package graft

import java.nio.file.{Files, Paths}

import graft.embedding.HashEmbedder
import graft.llm.{LlmProvider, Rag, ReactAgent, SimulatedLlm}
import graft.operators.Expansion
import graft.pipeline.Index
import graft.sources.FileIngest

class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  test("walks a tree with extension/size/hidden policy (ref build.rs:414-554)") {
    val root = Files.createTempDirectory("graft-ingest")
    def write(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
      ()
    }
    write("a/readme.md", "hello markdown")
    write("a/code.rs", "fn main() {}")
    write("a/huge.json", "x" * 20000)            // over the 10KB json cap
    write("a/small.json", """{"k":1}""")
    write("a/binary.exe", "skip me")             // extension not allowed
    write(".hidden/secret.md", "hidden file")    // hidden dir
    val bad = root.resolve("a/bad.md")
    Files.write(bad, Array[Byte](0xC3.toByte, 0x28)) // invalid UTF-8

    val docs = FileIngest.readDocuments(spark, root.toString)
      .select("source").as[String].collect().map(p => Paths.get(p).getFileName.toString).toSet
    assert(docs == Set("readme.md", "code.rs", "small.json"))
  }

  test("honors .gitignore/.leannignore and skips build dirs (ref build.rs:492-509)") {
    val root = Files.createTempDirectory("graft-ign")
    def write(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
      ()
    }
    // build/dependency dirs are never walked, gitignored or not
    write("node_modules/lib/index.js", "module.exports = 1")
    write("target/debug/gen.rs", "fn gen() {}")
    write("__pycache__/mod.py", "cached")
    // .gitignore at the root: glob, anchored path, dir pattern, negation
    write(".gitignore",
      """*.log
        |/secrets.md
        |generated/
        |scratch*.py
        |!scratchkeep.py
        |""".stripMargin)
    write("notes.log", "log text")               // *.log -> ignored (wrong ext anyway)
    write("build.md", "keep me: name is a dir rule only when a dir")
    write("secrets.md", "anchored ignore")
    write("sub/secrets.md", "NOT ignored: /secrets.md anchors to root")
    write("generated/out.md", "ignored dir")
    write("scratch1.py", "ignored glob")
    write("scratchkeep.py", "negation wins")
    // nested .gitignore scopes to its own directory
    write("sub/.gitignore", "local.md\n")
    write("sub/local.md", "ignored by nested rule")
    write("other/local.md", "kept: nested rule does not reach here")
    // .leannignore is honored like the reference's custom ignore file
    write(".leannignore", "vendored_thing.md\n")
    write("vendored_thing.md", "ignored by leannignore")
    write("kept.md", "plain keeper")

    val got = FileIngest.readDocuments(spark, root.toString)
      .select("source").as[String].collect()
      .map(p => root.relativize(Paths.get(p)).toString).toSet
    assert(got == Set("build.md", "sub/secrets.md", "scratchkeep.py",
      "other/local.md", "kept.md"))

    // the walk can be bypassed (pure policy scan, pre-round-3 behavior)
    val bypassed = FileIngest.readDocuments(spark, root.toString,
      honorIgnoreFiles = false)
      .select("source").as[String].collect()
      // binaryFile sources are file: URIs; the walk branch yields plain paths
      .map(p => root.relativize(Paths.get(p.stripPrefix("file:"))).toString).toSet
    assert(bypassed.contains("secrets.md") && bypassed.contains("generated/out.md"))
  }

  test("directory symlinks are not followed (cycles, out-of-tree links)") {
    val root = Files.createTempDirectory("graft-link")
    Files.createDirectories(root.resolve("real"))
    Files.writeString(root.resolve("real/doc.md"), "real doc")
    // cycle: sub -> root; out-of-tree: outside -> a dir above root
    val outside = Files.createTempDirectory("graft-outside")
    Files.writeString(outside.resolve("secret.md"), "outside the corpus")
    try {
      Files.createSymbolicLink(root.resolve("real/loop"), root)
      Files.createSymbolicLink(root.resolve("vendored"), outside)
    } catch { case _: UnsupportedOperationException => cancel("no symlinks here") }
    val got = FileIngest.readDocuments(spark, root.toString)
      .select("source").as[String].collect()
      .map(p => root.relativize(Paths.get(p)).toString).toSet
    assert(got == Set("real/doc.md")) // terminates; nothing out-of-tree
  }

  test("maxFiles caps deterministically") {
    val root = Files.createTempDirectory("graft-cap")
    (1 to 5).foreach(i => Files.writeString(root.resolve(s"f$i.txt"), s"doc $i"))
    val docs = FileIngest.readDocuments(spark, root.toString, maxFiles = Some(2))
    assert(docs.count() == 2)
  }

  test("html decoder: tags stripped, entities decoded, structure kept") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><h1>Heading &amp; more</h1>
        |<!-- a comment -->
        |<p>First &lt;paragraph&gt; with a <a href="x">link</a>.</p>
        |<ul><li>one</li><li>two &#65;&#x42;</li></ul>
        |</body></html>""".stripMargin
    val text = FileIngest.HtmlTextDecoder.htmlToText(html)
    // no markup survives (decoded &lt;/&gt; literals are fine)
    assert(!text.contains("<p>") && !text.contains("href") &&
      !text.contains("color") && !text.contains("var x"))
    assert(text.contains("Heading & more"))
    assert(text.contains("First <paragraph> with a link"))
    assert(text.contains("two AB"))
    // block boundaries became newlines (heading separate from paragraph)
    assert(text.linesIterator.toSeq.count(_.nonEmpty) >= 3)
  }

  test("jsonl source: field mapping, malformed lines dropped, source fallback") {
    val root = Files.createTempDirectory("graft-jsonl")
    Files.writeString(root.resolve("corpus.jsonl"),
      """{"text": "first document", "source": "a.md"}
        |{"text": "no source field here"}
        |not json at all {{{
        |{"source": "textless.md"}
        |{"text": "", "source": "empty.md"}
        |{"text": "last document", "source": "z.md"}
        |""".stripMargin)
    val docs = FileIngest.readJsonl(spark, root.resolve("corpus.jsonl").toString)
      .as[(String, String)].collect()
    assert(docs.length == 3)
    val bySource = docs.map(_.swap).toMap
    assert(bySource("a.md") == "first document")
    assert(bySource("z.md") == "last document")
    // the source-less doc got a <file>#<content-fingerprint> fallback,
    // stable across re-reads (a line number would depend on split order)
    val fallback = docs.find(_._1 == "no source field here").get._2
    assert(fallback.contains("corpus.jsonl#"))
    val again = FileIngest.readJsonl(spark, root.resolve("corpus.jsonl").toString)
      .as[(String, String)].collect().find(_._1 == "no source field here").get._2
    assert(again == fallback)
    // and the result feeds the index pipeline directly
    val idx = root.resolve("idx").toString
    val meta = graft.pipeline.Index.build(
      FileIngest.readJsonl(spark, root.resolve("corpus.jsonl").toString),
      idx, new graft.embedding.HashEmbedder(16), strategy = "simple")
    assert(meta.passageCount == 3)
  }

  test("jsonl source reads gzip-compressed corpora transparently") {
    val root = Files.createTempDirectory("graft-jsonlgz")
    val gz = root.resolve("corpus.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write("""{"text": "compressed doc", "source": "c.md"}""".getBytes("UTF-8"))
    out.write('\n')
    out.close()
    val docs = FileIngest.readJsonl(spark, gz.toString)
      .as[(String, String)].collect()
    assert(docs.toSeq == Seq(("compressed doc", "c.md")))
  }

  test("html decoder survives malformed entities (passes them through)") {
    val text = FileIngest.HtmlTextDecoder.htmlToText(
      "<p>bad &#99999999999; hex &#x110000; notdigit &#ab; ok &#65;</p>")
    assert(text.contains("&#99999999999;") && text.contains("&#x110000;"))
    assert(text.contains("&#ab;")) // not a valid numeric entity — verbatim
    assert(text.contains("ok A"))
  }

  test("html decoder ingests .html trees and passes other text through") {
    val root = Files.createTempDirectory("graft-html")
    Files.writeString(root.resolve("page.html"),
      "<html><body><p>spark &amp; parquet</p></body></html>")
    Files.writeString(root.resolve("notes.md"), "plain markdown")
    val docs = FileIngest.readDocuments(spark, root.toString,
        extensions = Seq("html", "md"), decoder = FileIngest.HtmlTextDecoder)
      .as[(String, String)].collect()
      .map { case (t, s) => Paths.get(s).getFileName.toString -> t }.toMap
    assert(docs("page.html") == "spark & parquet")
    assert(docs("notes.md") == "plain markdown")
  }
}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val idx = {
    val dir = Files.createTempDirectory("graft-rag").toString + "/idx"
    Index.build(Seq(
      ("spark shuffles data between executors", "spark.md"),
      ("vector indexes answer similarity queries", "vec.md")).toDF("text", "source"),
      dir, new HashEmbedder(16), strategy = "simple")
    dir
  }

  test("ask assembles numbered context and generates (ref ask.rs:157-198)") {
    val out = Rag.ask(spark, idx, "how does spark shuffle", new HashEmbedder(16),
      new SimulatedLlm("test-model"), topK = 2)
    assert(out.contains("how does spark shuffle"))
    assert(out.contains("test-model"))
    assert(out.contains("context"))
  }

  test("ask REPL: commands, conversation history, persisted command history (ref ask.rs:200-317)") {
    val hist = Files.createTempDirectory("graft-repl").resolve("history.txt")
    def drive(lines: String*): String = {
      val out = new java.io.StringWriter
      new graft.llm.AskRepl(q => s"answer to [$q]", historyFile = Some(hist))
        .run(new java.io.BufferedReader(new java.io.StringReader(lines.mkString("\n"))),
          new java.io.PrintWriter(out, true))
      out.toString
    }
    val t1 = drive("what is spark", "/history", "/clear", "/history",
      "/bogus", "/quit", "never reached")
    assert(t1.contains("answer to [what is spark]"))
    assert(t1.contains("  1. what is spark"))        // /history lists questions
    assert(t1.split("Conversation history:")(2).contains("(empty)")) // after /clear
    assert(t1.contains("Unknown command: /bogus"))
    assert(t1.contains("Goodbye!"))
    assert(!t1.contains("never reached"))
    // command history persisted (commands AND questions)
    val saved = java.nio.file.Files.readAllLines(hist)
    assert(saved.contains("what is spark") && saved.contains("/quit"))
    // a second session loads it and appends; EOF (no /quit) still saves + says goodbye
    val t2 = drive("another question")
    assert(t2.contains("answer to [another question]") && t2.contains("Goodbye!"))
    assert(java.util.Collections.frequency(
      java.nio.file.Files.readAllLines(hist), "what is spark") == 1)
    assert(java.nio.file.Files.readAllLines(hist).contains("another question"))
    // errors from the ask function are reported, not fatal
    val out3 = new java.io.StringWriter
    new graft.llm.AskRepl(_ => throw new RuntimeException("boom"))
      .run(new java.io.BufferedReader(new java.io.StringReader("q1\n/quit")),
        new java.io.PrintWriter(out3, true))
    assert(out3.toString.contains("Error: boom") && out3.toString.contains("Goodbye!"))
  }

  test("react agent executes search then finish (ref react.rs:88-171)") {
    // Scripted LLM: first turn searches, second finishes using the observation
    val scripted = new LlmProvider {
      override val modelName = "scripted"
      private var turn = 0
      override def generate(prompt: String): String = {
        turn += 1
        if (turn == 1) "Thought: need info\nAction: search(\"spark shuffle\")"
        else {
          assert(prompt.contains("Observation:"))
          "Thought: enough\nAction: finish(\"shuffles move data between executors\")"
        }
      }
    }
    val agent = new ReactAgent(spark, idx, new HashEmbedder(16), scripted)
    assert(agent.run("what is a shuffle") == "shuffles move data between executors")
  }

  test("react caps at maxSteps with a non-tool-using llm") {
    val agent = new ReactAgent(spark, idx, new HashEmbedder(16),
      new SimulatedLlm(), maxSteps = 2)
    assert(agent.run("anything").startsWith("Maximum steps reached"))
  }
}

class CodeSymbolsSpec extends SparkSpec {
  import spark.implicits._

  test("extracts and ranks symbols across languages (ref query.rs:34-56)") {
    val df = Seq(
      "pub fn search_index(q: &str) {} pub struct IndexSearcher {}",
      "def search_index(q): pass\nclass Retriever: pass",
      "func NewRetriever() {} type Config struct {}").toDF("text")
    val out = Expansion.codeSymbols(df, "text", 10)
      .as[(String, Long)].collect()
    val m = out.toMap
    assert(m("search_index") == 2) // rust fn + python def
    // "class X" is double-counted by the python and java patterns — the
    // reference does the same (query.rs:20,31 both match)
    assert(m("Retriever") == 2)
    assert(m.contains("IndexSearcher"))
    assert(m.contains("NewRetriever") && m.contains("Config"))
    assert(out.head._2 == 2) // a max-frequency symbol ranks first
  }

  test("filters test_ and underscore names") {
    val df = Seq("fn test_foo() {} fn _private() {} fn ok_name() {}").toDF("text")
    val out = Expansion.codeSymbols(df, "text", 10).as[(String, Long)].collect().map(_._1)
    assert(out.toSet == Set("ok_name"))
  }
}
