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

  test("batched trainMerges ≡ one-merge-per-round on the Sennrich example (r8 VERDICT #3)") {
    val f = Bpe.wordFreqs(docs, "text")
    // batchCap=1 IS classic sequential training; the default batched
    // trainer must learn the identical sequence (the prefix rule only
    // groups provably-safe merges)
    assert(Bpe.trainMerges(f, 4) == Bpe.trainMerges(f, 4, batchCap = 1))
    assert(Bpe.trainMerges(f, 4, batchCap = 1) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("selectBatch: prefix rule stops at conflicts and trims boundary ties") {
    // disjoint prefix, conflict on shared symbol stops the scan
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 9L), ("c", "d", 8L), ("b", "e", 7L), ("f", "g", 6L)), 10)
      == IndexedSeq(("a", "b", 9L), ("c", "d", 8L)))
    // a pair whose symbol equals an earlier CONCATENATION conflicts too
    // (the merge mints new instances of that symbol mid-batch)
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 9L), ("ab", "c", 8L), ("d", "e", 7L)), 10)
      == IndexedSeq(("a", "b", 9L)))
    // boundary weight tie trims back (rivals are only bounded strictly
    // below the first excluded weight)
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 9L), ("c", "d", 7L), ("a", "e", 7L)), 10)
      == IndexedSeq(("a", "b", 9L)))
    // the head pair alone is always a valid (sequential) step
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 9L), ("b", "c", 9L)), 10)
      == IndexedSeq(("a", "b", 9L)))
  }

  test("trainMergesRelaxed: deterministic, documented Sennrich divergence, round-trip safe") {
    val f = Bpe.wordFreqs(docs, "text")
    val relaxed = Bpe.trainMergesRelaxed(f, 4)
    assert(relaxed == Bpe.trainMergesRelaxed(f, 4))
    // the documented divergence: round 1's skip-scan takes the top-3
    // disjoint pairs — (i,d) enters before (es,t) can exist
    assert(relaxed == Seq(("e", "s"), ("l", "o"), ("i", "d"), ("es", "t")))
    // still a valid BPE merge list: segmentation round-trips
    for (w <- Seq("low", "lower", "newest", "widest", "unrelated"))
      assert(Bpe.segment(w, relaxed).mkString == w)
  }

  test("merge list on real testdata: deterministic, round-trip safe, batched ≡ sequential") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(real, "text")
    val (merges, rounds) = Bpe.trainMergesWithRounds(freqs, numMerges = 10)
    assert(merges.length == 10)
    // exactness on the fixture corpus, not just the textbook example
    assert(merges == Bpe.trainMerges(freqs, numMerges = 10, batchCap = 1))
    assert(rounds <= 10)
    val words = freqs.select("word").as[String].collect().take(50)
    words.foreach { w =>
      assert(Bpe.segment(w, merges).mkString == w)
    }
  }

  test("trainMergesRelaxed cuts rounds >= 5x on the fixture corpus") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(real, "text")
    val (merges, rounds) = Bpe.trainMergesWithRounds(freqs, numMerges = 20, relaxed = true)
    // sequential training is one round per merge by construction, so
    // the drop is merges.length / rounds (measured 3 rounds for 20)
    assert(merges.length == 20)
    assert(rounds * 5 <= merges.length,
      s"expected >=5x round reduction, got ${merges.length} merges in $rounds rounds")
    // relaxed output is still round-trip safe on real words
    val words = freqs.select("word").as[String].collect().take(50)
    words.foreach(w => assert(Bpe.segment(w, merges).mkString == w))
  }

  test("relaxed tier contract: deterministic on the fixture corpus (same corpus, same cap → same list)") {
    // The CLI --relaxed tier's documented contract: the learned sequence
    // is a pure function of (corpus, cap). The Sennrich arm above pins a
    // toy corpus; this pins the REAL fixture corpus, where the per-round
    // ranking flows through a distributed agg + orderBy + limit — the
    // path where an under-specified sort would first show nondeterminism
    // (the lex tie-break on (weight, a, b) is what makes it total).
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(real, "text")
    val first = Bpe.trainMergesRelaxed(freqs, numMerges = 20)
    assert(first.length == 20)
    assert(first == Bpe.trainMergesRelaxed(freqs, numMerges = 20))
    // a different cap may batch differently but must be equally stable
    val capped = Bpe.trainMergesRelaxed(freqs, numMerges = 20, batchCap = 4)
    assert(capped == Bpe.trainMergesRelaxed(freqs, numMerges = 20, batchCap = 4))
  }

  test("relaxed tier contract: fertility within 1% of exact at equal merge count, equal at saturation") {
    // The compression side of the relaxation's price, MEASURED rather
    // than assumed: plain supremacy (relaxed ≤ exact) was tested and is
    // FALSE on this corpus — sequential greedy CHAINS its argmax (after
    // (e,s) the freshly-minted (es,t) can top the next round), while the
    // relaxed skip-scan spends the same slots on that round's disjoint
    // pairs, so at equal merge count it compresses slightly WORSE, not
    // better (measured exact/relaxed tokens-per-word: 3.6882/3.7554 at
    // 10 merges, 3.3256/3.3358 at 20, 2.2757/2.2855 at 50, equal at
    // saturation). The tier's real contract is therefore a BOUNDED
    // premium — ≤1% beyond the early-vocab point — bought for the ≥5x
    // round cut the arm above pins; a regression past the bound means
    // the skip-scan stopped taking top-ranked pairs.
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(real, "text")
    val wf = freqs.as[(String, Long)].collect()
    def fertility(merges: Seq[(String, String)]): Double = {
      val toks = wf.map { case (w, f) => f * Bpe.segment(w, merges).length.toLong }.sum
      toks.toDouble / wf.map(_._2).sum
    }
    for (n <- Seq(20, 50)) {
      val exact = Bpe.trainMerges(freqs, numMerges = n)
      val relaxed = Bpe.trainMergesRelaxed(freqs, numMerges = n)
      assert(exact.length == relaxed.length)
      val (fr, fe) = (fertility(relaxed), fertility(exact))
      assert(fr <= fe * 1.01,
        s"relaxed fertility $fr exceeds exact $fe by >1% at $n merges")
      // both must still beat the unmerged baseline — slots aren't wasted
      assert(fr < fertility(Nil) && fe < fertility(Nil))
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
