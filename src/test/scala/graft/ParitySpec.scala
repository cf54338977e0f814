package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => PropTest}

import graft.functions.TextFunctions
import graft.util.Json

/** Property/parity checks for the pure functions the oracle contract
  * leans on: generated inputs instead of hand-picked ones. */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("Json round-trips arbitrary strings (escapes, control chars, unicode)") {
    check(Prop.forAll { (s: String) => Json.parse(Json.write(s)) == s })
  }

  test("Json round-trips nested objects") {
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.alphaNumStr.map(identity[Any]),
      Gen.choose(Long.MinValue, Long.MaxValue).map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
      Gen.const(null))
    val obj: Gen[Map[String, Any]] = for {
      n <- Gen.choose(0, 6)
      keys <- Gen.listOfN(n, Gen.alphaNumStr)
      vals <- Gen.listOfN(n, Gen.oneOf(scalar, Gen.listOf(scalar).map(identity[Any])))
    } yield scala.collection.immutable.ListMap(keys.zip(vals).toMap.toSeq: _*)
    check(Prop.forAll(obj) { m => Json.parseObject(Json.write(m)) == m })
  }

  test("Json writes non-finite numbers as null (never a bare NaN token)") {
    assert(Json.write(Double.NaN) == "null")
    assert(Json.write(Double.PositiveInfinity) == "null")
    assert(Json.write(Float.NegativeInfinity) == "null")
    assert(Json.write(Map("score" -> Double.NaN)) == """{"score":null}""")
    assert(Json.parse(Json.write(List(1L, Double.NaN))) == List(1L, null))
  }

  test("index_search oracle preconditions hold on the gate datasets") {
    // The DuckDB oracle for index_search treats the simple chunker as
    // the identity (doc fits one 1024-char chunk) and reproduces Java
    // String.hashCode via codepoints (== UTF-16 units only for ASCII).
    // If regenerated testdata ever breaks either assumption, fail HERE
    // with a clear message instead of as an opaque oracle hash mismatch.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")
         if new java.io.File(s"/root/testdata/$sf/documents.parquet").exists()) {
      val bad = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(length(col("text")) > 1024 ||
          col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(bad == 0L,
        s"$sf/documents violates the index_search oracle preconditions " +
        "(>1024 chars or non-ASCII); update the oracle SQL")
    }
  }

  // Seeded random corpus shared by the Spark-side parity checks — one
  // DataFrame pass each instead of a job per scalacheck sample.
  private lazy val samples: Seq[String] = {
    val rnd = new scala.util.Random(42)
    // codepoint-safe building blocks (the emoji stays a whole surrogate
    // pair — char-level sampling would create lone surrogates that
    // UTF-8 round-trips replace, breaking the comparison keys)
    val parts = Seq("a", "b", "c", "X", "Y", "Z", "0", "1", "9", " ",
      ",", ".", "!", "?", "\n", "\t", "ü", "ñ", "中", "文", "🙂", "-", "_", "/")
    (0 until 300).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => parts(rnd.nextInt(parts.length))).mkString
    } :+ "" :+ "ab" :+ "a" :+ "ONLY UPPER" :+ "123 456"
  }

  test("md5Hex15 == conv(substring(md5,1,15),16,10) on generated strings") {
    val fromSpark = samples.toDF("s")
      .select(col("s"), TextFunctions.md5Hash64(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach { s =>
      val viaExpr = {
        // same helper SimHash64/MinHashSig use, exposed through a probe
        val d = java.security.MessageDigest.getInstance("MD5")
        val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
        v >>> 4
      }
      assert(fromSpark(s) == viaExpr, s"md5 divergence for ${s.take(20)}")
    }
  }

  test("SimpleChunker invariants hold on generated text (coverage, progress, ids)") {
    import graft.operators.SimpleChunker
    val chunker = new SimpleChunker(chunkSize = 8, chunkOverlap = 4) // small: many chunks
    val textGen = for {
      n <- Gen.choose(0, 600)
      parts <- Gen.listOfN(n, Gen.oneOf("word", "x", "  ", "\n", "longerword", "a b"))
    } yield parts.mkString
    check(Prop.forAll(textGen) { text =>
      val chunks = chunker.chunk(text, "t.md")
      val substrings = chunks.forall(c => text.contains(c.text))
      val ids = chunks.map(_.id) == chunks.indices.map(i => s"t.md#$i")
      // forward progress: greedy earliest-match start positions never
      // decrease (overlap allows re-covering, but never going backward)
      val progress = {
        val starts = chunks.scanLeft(0) { (from, c) =>
          val at = text.indexOf(c.text, from)
          if (at < 0) Int.MaxValue else at
        }.tail
        starts == starts.sorted && !starts.contains(Int.MaxValue)
      }
      // content anchoring: first and last non-whitespace chars survive
      val trimmed = text.trim
      val anchored = trimmed.isEmpty ||
        (chunks.nonEmpty &&
          chunks.head.text.contains(trimmed.take(1)) &&
          chunks.last.text.contains(trimmed.takeRight(1)))
      substrings && ids && (chunks.isEmpty || progress) && anchored
    })
  }

  test("CodeChunker never crashes or loses content on generated code-ish text") {
    import graft.operators.SmartChunker
    val chunker = new SmartChunker("auto", 8, 4)
    val tokens = Seq("fn main() {", "}", "{", "def f(x):", "class A:", "// comment",
      "\n", "  ", "}", "impl X {", "pub fn g() {", "let a = 1;", "if (a) {",
      "###", "\"str {\"", "')", "func h() {")
    val codeGen = for {
      n <- Gen.choose(0, 120)
      parts <- Gen.listOfN(n, Gen.oneOf(tokens))
      ext <- Gen.oneOf("x.rs", "x.py", "x.go", "x.md", "x.scala", "x.js")
    } yield (parts.mkString("\n"), ext)
    check(Prop.forAll(codeGen) { case (text, source) =>
      val chunks = chunker.chunk(text, source) // must not throw
      val uniqueIds = chunks.map(_.id).distinct.size == chunks.size
      // no content invented: every non-ws character class present in the
      // output existed in the input
      val inChars = text.filterNot(_.isWhitespace).toSet
      val outChars = chunks.flatMap(_.text).filterNot(_.isWhitespace).toSet
      uniqueIds && outChars.subsetOf(inChars)
    })
  }

  test("MetadataFilterDsl never throws on arbitrary filter strings (fail-open contract)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val frag = Gen.oneOf("lang", "=", "en", ",", ">", "n_chars", "300", "OR",
      "not_in", "[", "]", "^", "src", "AND", "!", "  ", "~", "source", "\"", "3.5")
    val dslGen = for {
      n <- Gen.choose(0, 12)
      parts <- Gen.listOfN(n, frag)
    } yield parts.mkString
    check(Prop.forAll(dslGen) { s =>
      // must neither throw at parse time nor produce an unresolvable plan
      graft.filter.MetadataFilterDsl.toColumn(s, docs) match {
        case Some(pred) => docs.filter(pred).queryExecution.analyzed != null
        case None => true
      }
    })
  }

  test("driver-side tokenizeString == the tokens() column on generated strings") {
    val fromSpark = samples.toDF("s")
      .select(col("s"), TextFunctions.tokens(col("s")).as("t"))
      .as[(String, Seq[String])].collect().toMap
    samples.foreach { s =>
      assert(fromSpark(s) == TextFunctions.tokenizeString(s),
        s"tokenizer divergence for ${s.take(20)}")
    }
  }
}
