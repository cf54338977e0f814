package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE training checked on the hand-computable example from Sennrich
  * et al. 2016 (§3.2's low/lower/newest/widest corpus), plus the
  * invariants any merge list must satisfy. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // low x5, lower x2, newest x6, widest x3 — as documents
  private lazy val docs = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
    (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("wordFreqs counts the classic corpus") {
    val f = Bpe.wordFreqs(docs, "text").as[(String, Long)].collect().toMap
    assert(f == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("pairStats round 1: (e,s) and (s,t) lead at weight 9") {
    val p = Bpe.pairStats(Bpe.wordFreqs(docs, "text"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, w) => (a, b) -> w }.toMap
    assert(p(("e", "s")) == 9L) // newest 6 + widest 3
    assert(p(("s", "t")) == 9L)
    assert(p(("w", "e")) == 8L) // newest 6 + lower 2
    assert(p(("l", "o")) == 7L) // low 5 + lower 2
  }

  test("trainMerges learns the paper's sequence with lexicographic ties") {
    val merges = Bpe.trainMerges(Bpe.wordFreqs(docs, "text"), numMerges = 4)
    // weight-9 tie (e,s)/(s,t) breaks to (e,s); then (es,t) 9;
    // then the 7-weight tie (l,o)/(o,w) breaks to (l,o); then (lo,w) 7.
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // segmentation under the merges: concatenation invariant + expected splits
    assert(Bpe.segment("newest", merges) == IndexedSeq("n", "e", "w", "est"))
    assert(Bpe.segment("low", merges) == IndexedSeq("low"))
    assert(Bpe.segment("lowest", merges) == IndexedSeq("low", "est"))
    for (w <- Seq("low", "lower", "newest", "widest", "unrelated"))
      assert(Bpe.segment(w, merges).mkString == w)
  }

  test("trainMerges is deterministic and respects minFreq early stop") {
    val f = Bpe.wordFreqs(docs, "text")
    assert(Bpe.trainMerges(f, 4) == Bpe.trainMerges(f, 4))
    // a floor above every pair weight learns nothing
    assert(Bpe.trainMerges(f, 4, minFreq = 100L).isEmpty)
  }

  test("merge list on real testdata: deterministic, round-trip safe") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(real, "text")
    val merges = Bpe.trainMerges(freqs, numMerges = 10)
    assert(merges.length == 10)
    val words = freqs.select("word").as[String].collect().take(50)
    words.foreach { w =>
      assert(Bpe.segment(w, merges).mkString == w)
    }
  }

  test("encodeDocs: per-doc subwords match driver-side segment, in document order") {
    val d = Seq((1L, "newest lowest low"), (2L, "widest newest"))
      .toDF("doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val out = Bpe.encodeDocs(d, "doc_id", "text", merges)
      .select("id", "tokens", "n_tokens")
      .as[(Long, Seq[String], Long)].collect()
      .map { case (k, t, n) => k -> ((t, n)) }.toMap
    assert(out(1L)._1 == Seq("n", "e", "w", "est", "low", "est", "low"))
    assert(out(2L)._1 == Seq("w", "i", "d", "est", "n", "e", "w", "est"))
    assert(out.forall { case (_, (t, n)) => t.size.toLong == n })
  }

  test("vocab/encodeDocsIds: every subword resolvable, ids round-trip through the vocab") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val voc = Bpe.vocab(merges)
    assert(voc.size == 36 + 4)
    assert(voc.take(2) == Seq(("a", 0), ("b", 1)))
    assert(voc.takeRight(2) == Seq(("lo", 38), ("low", 39)))
    val byId = voc.map(_.swap).toMap
    val d = Seq((1L, "newest lowest low"), (2L, "widest newest"))
      .toDF("doc_id", "text")
    val ids = Bpe.encodeDocsIds(d, "doc_id", "text", merges)
      .select("id", "token_ids").as[(Long, Seq[Int])].collect().toMap
    // decode through the vocab reproduces the subword stream
    assert(ids(1L).map(byId) == Seq("n", "e", "w", "est", "low", "est", "low"))
    assert(ids.values.flatten.forall(i => i >= 0 && i < voc.size))
  }

  test("encodeDocs round-trips and shrinks token counts as merges grow") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 100)
    val freqs = Bpe.wordFreqs(real, "text")
    val merges = Bpe.trainMerges(freqs, numMerges = 10)
    val enc = Bpe.encodeDocs(real, "doc_id", "text", merges)
    // concatenating a doc's subwords reproduces its token stream
    val plain = real.select(col("doc_id").as("id"),
        concat_ws("", graft.functions.TextFunctions.tokens(col("text"))).as("s"))
      .as[(Long, String)].collect().toMap
    val got = enc.select(col("id"), concat_ws("", col("tokens")))
      .as[(Long, String)].collect().toMap
    assert(got == plain.filter(_._2.nonEmpty))
    // more merges → no doc's token count grows
    val enc0 = Bpe.encodeDocs(real, "doc_id", "text", merges.take(3))
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    val enc10 = enc.select("id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(enc10.forall { case (id, n) => n <= enc0(id) })
    assert(enc10.values.sum < enc0.values.sum)
  }
}
