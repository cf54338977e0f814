package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.BM25

/** Mirrors the reference's BM25 unit tests (`src/index/bm25.rs:172-330`)
  * over DataFrames. */
class BM25Spec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def scoresOf(q: String, texts: String*): Map[Long, Double] =
    BM25.scores(docs(texts: _*), "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap

  test("tokenize: lowercase, alnum runs, single chars dropped") {
    assert(TextFunctions.tokenizeString("Hello, World! This is a test.") ==
      Seq("hello", "world", "this", "is", "test"))
    assert(TextFunctions.tokenizeString("") == Seq.empty)
    assert(TextFunctions.tokenizeString("test123 456abc") == Seq("test123", "456abc"))
  }

  test("term frequency matters (ref test_bm25_term_frequency_matters)") {
    val s = scoresOf("rust", "rust rust rust programming", "rust programming")
    assert(s(0L) > s(1L))
  }

  test("idf selectivity (ref test_bm25_idf_matters)") {
    val s = scoresOf("rare", "common rare", "common", "common")
    assert(s.getOrElse(0L, 0.0) > 0.0)
    assert(!s.contains(1L) && !s.contains(2L)) // zero-score docs absent
  }

  test("empty query scores nothing") {
    assert(scoresOf("", "hello world").isEmpty)
  }

  test("no match yields empty result (ref test_bm25_no_match)") {
    assert(scoresOf("xyz", "hello world").isEmpty)
  }

  test("top-k truncation, tf-heavy doc first (ref test_bm25_search_top_k)") {
    val d = docs("apple banana", "apple cherry", "banana cherry", "apple apple apple")
    val top = BM25.topK(d, "doc_id", "text", "apple", 2).as[(Long, Double)].collect()
    assert(top.length == 2)
    assert(top.head._1 == 3L)
  }

  test("quick brown fox sanity (ref test_bm25_basic_scoring)") {
    val d = docs(
      "the quick brown fox jumps over the lazy dog",
      "a quick brown dog outpaces a swift fox",
      "the dog chases the fox around the yard")
    val top = BM25.topK(d, "doc_id", "text", "quick fox", 3).as[(Long, Double)].collect()
    assert(top.nonEmpty && top.length <= 3)
    assert(top.map(_._1).toSet.contains(0L))
  }

  test("stats tables: df counts docs, dl counts tokens") {
    val tf = BM25.termFrequencies(docs("aa bb aa", "aa cc"), "doc_id", "text")
    val dfm = BM25.docFrequencies(tf).as[(String, Long)].collect().toMap
    assert(dfm("aa") == 2 && dfm("bb") == 1 && dfm("cc") == 1)
    val dl = BM25.docLengths(tf).as[(Long, Long)].collect().toMap
    assert(dl(0L) == 3 && dl(1L) == 2)
  }

  test("manual BM25 formula check (k1=1.2, b=0.75)") {
    // corpus: d0="aa bb", d1="aa" → N=2, avgdl=1.5
    // query "bb": df=1, idf=ln((2-1+0.5)/(1+0.5)+1)=ln(2)
    // d0: tf=1, dl=2 → norm=1-0.75+0.75*(2/1.5)=1.25
    //     score = ln(2)*1*2.2/(1+1.2*1.25) = ln(2)*2.2/2.5
    val s = scoresOf("bb", "aa bb", "aa")
    val expect = math.log(2.0) * 2.2 / 2.5
    assert(math.abs(s(0L) - expect) < 1e-12)
  }
}
