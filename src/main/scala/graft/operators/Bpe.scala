package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): learn merge
  * rules from corpus word frequencies.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is
  * touched EXACTLY ONCE ([[wordFreqs]], one tokenize + groupBy shuffle
  * with map-side combine). Every merge iteration then runs on the
  * aggregated vocabulary table (|distinct words| rows — millions, not
  * trillions): a map-only re-segmentation plus one pair-count
  * aggregate whose argmax row is the ONLY thing the driver sees per
  * round. This mirrors how single-node BPE trainers operate on word
  * counts, except the vocab table and the per-round passes stay
  * distributed.
  *
  * Determinism: ties on pair weight break lexicographically, so the
  * learned merge sequence is a pure function of the corpus. The
  * round-1 pair statistics are plain relational algebra and are
  * DuckDB-oracle-checked (`bpe_pair_stats`); the iterative trainer is
  * spec-checked against the paper's hand-computable example.
  */
object Bpe {

  /** Corpus-scale word frequency table — the only pass over the data.
    * BM25 tokenizer, so "words" match every other text operator here. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-CHARACTER pair weights over the vocabulary (= the first
    * BPE iteration's merge candidates), weighted by word frequency and
    * counted per occurrence. Declarative, hence oracle-checkable. */
  def pairStats(freqs: DataFrame): DataFrame =
    freqs.select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
        "i -> struct(substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("weight"))

  /** Greedy left-to-right application of one merge rule to a symbol
    * sequence — the standard BPE merge semantics. */
  def applyMerge(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** A word segmented under a merge list, applied in training order. */
  def segment(word: String, merges: Seq[(String, String)]): IndexedSeq[String] =
    merges.foldLeft(word.map(_.toString): IndexedSeq[String]) {
      case (syms, (a, b)) => applyMerge(syms, a, b)
    }

  /** Distributed BPE ENCODE (tokenizer apply): segment every document
    * into subword tokens under a trained merge list — the
    * train→encode→pack completion of the tokenizer pipeline
    * ([[trainMerges]] learns the rules; this applies them; the token
    * counts feed TrainExport.packSequences with real lengths instead
    * of the chars/4 proxy).
    *
    * Scale shape: the iterative merge loop runs once per DISTINCT word
    * (the vocabulary table — millions of rows), never per occurrence
    * (trillions): vocab rows map through [[segment]] with the merge
    * list in the task closure (KBs), and occurrences recover their
    * subwords through a word-keyed join (AQE broadcasts the segmented
    * vocab when it fits). Per-doc reassembly is ONE doc-keyed shuffle;
    * collect_list order is repaired by sorting on position, so the
    * result is deterministic under any partitioning.
    *
    * Returns (id, tokens array<string>, n_tokens). Words are the BM25
    * tokens, consistent with every other text operator here.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "word")))
    val segmented = occ.select("word").distinct()
      .as[String]
      .map(w => (w, segment(w, merges).toArray))
      .toDF("word", "subw")
    occ.join(segmented, "word")
      .groupBy("id")
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("subw")))),
          s => s.getField("subw"))).as("tokens"))
      .select(col("id"), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"))
  }

  /** The 36 single characters the BM25 tokenizer can emit. */
  val BaseAlphabet: IndexedSeq[String] =
    ("abcdefghijklmnopqrstuvwxyz0123456789").map(_.toString)

  /** The vocabulary a merge list induces, as (token, id): ids 0–35 are
    * the base characters, 36+i is merge i's joined symbol. A pure
    * function of the merge list — any engine (or the oracle SQL) can
    * reconstruct it from `_merges.json` alone, and every subword
    * [[segment]] can produce is in it by construction (segmentation
    * only ever yields base chars or merge results). */
  def vocab(merges: Seq[(String, String)]): Seq[(String, Int)] =
    (BaseAlphabet ++ merges.map { case (a, b) => a + b })
      .zipWithIndex.map { case (t, i) => (t, i) }

  /** [[encodeDocs]] + token-ID lookup: the trainer-consumable output
    * (id, token_ids ARRAY<INT>, n_tokens). The vocab ships as a literal
    * map expression (≤ 36 + merges entries — KBs), so the id lookup is
    * a zero-shuffle map over the encoded frame. */
  def encodeDocsIds(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val vmap = map(vocab(merges).flatMap { case (t, i) =>
      Seq(lit(t), lit(i)) }: _*)
    encodeDocs(docs, idCol, textCol, merges)
      .select(col("id"),
        transform(col("tokens"), t => element_at(vmap, t)).as("token_ids"),
        col("n_tokens"))
  }

  /** Learn up to `numMerges` merge rules from a word-frequency table.
    * Stops early when no adjacent pair reaches `minFreq`. EXACT
    * classic-BPE semantics: the learned sequence is identical to
    * one-merge-per-round training (spec-pinned on the Sennrich example
    * and the fixture corpus).
    *
    * Rounds are BATCHED where provably safe (r8 VERDICT #3): each
    * round applies the longest prefix of the ranked pair list whose
    * sequential equivalence is guaranteed (see [[selectBatch]]) in one
    * re-segmentation pass. Exactness caps the win, though: classic BPE
    * on natural text CHAINS — merge i's output symbol is routinely in
    * merge i+1's argmax pair ((t,h) then (th,e)), and a pair that
    * doesn't exist yet cannot be batched by any sound rule. For bulk
    * round reduction accept the standard relaxation:
    * [[trainMergesRelaxed]].
    *
    * Each round: one pair-count aggregate over the vocab (top
    * batchCap+1 rows to the driver — KBs) and one map-only
    * re-segmentation. */
  def trainMerges(freqs: DataFrame, numMerges: Int,
                  minFreq: Long = 2L, batchCap: Int = 64): Seq[(String, String)] =
    trainMergesWithRounds(freqs, numMerges, minFreq, batchCap)._1

  /** Relaxed batched BPE — the distributed-training tradeoff used when
    * the merge ORDER need not replicate classic sequential BPE
    * bit-for-bit (map-reduce BPE trainers batch this way for exactly
    * the round-count reason): each round applies the top `batchCap`
    * pairwise-disjoint pairs of the ranking (skipping past conflicts
    * instead of stopping at the first one). Still deterministic (pure
    * function of the corpus), still round-trip safe, and every merge
    * was a top-ranked pair of its round — but when high-weight pairs
    * interact, the learned sequence can diverge from [[trainMerges]]
    * (e.g. on the Sennrich corpus it learns (i,d) before (es,t):
    * sequential (es,t) only outranks it AFTER (e,s) mints "es", which
    * the batch can't see). Use for vocab-scale training where 32k
    * one-merge rounds are the bottleneck; rounds drop by roughly the
    * average batch size. */
  def trainMergesRelaxed(freqs: DataFrame, numMerges: Int,
                         minFreq: Long = 2L, batchCap: Int = 64): Seq[(String, String)] =
    trainMergesWithRounds(freqs, numMerges, minFreq, batchCap, relaxed = true)._1

  /** The sequential-equivalent batch: the longest prefix of the ranked
    * pair list that is pairwise symbol-disjoint (STOP at the first
    * conflict — skipping past it would let a decreased-weight rival
    * outrank a later selection), then trimmed while the last selected
    * weight ties the first excluded one (a tie across the boundary
    * could let a changed/new pair win the lex tie-break mid-batch).
    * The conflict set also holds each selected pair's CONCATENATION:
    * a later pair one of whose symbols equals an earlier merge's
    * output string would have its weight changed mid-batch (the merge
    * mints new instances of that symbol), voiding the
    * weights-unchanged invariant the equivalence proof rests on.
    * Always yields at least the head pair — the plain sequential step.
    * `ranked` rows are (a, b, weight), already (weight desc, lex)
    * sorted and minFreq-filtered. */
  private[graft] def selectBatch(
      ranked: IndexedSeq[(String, String, Long)], cap: Int): IndexedSeq[(String, String, Long)] = {
    if (ranked.isEmpty) return IndexedSeq.empty
    val used = scala.collection.mutable.HashSet.empty[String]
    var k = 0
    var conflict = false
    while (k < ranked.length && k < cap && !conflict) {
      val (a, b, _) = ranked(k)
      if (used.contains(a) || used.contains(b)) conflict = true
      else { used += a; used += b; used += (a + b); k += 1 }
    }
    // boundary-tie trim: rivals are only bounded STRICTLY below the
    // first excluded weight, so a tie there invalidates steps >= 2
    while (k > 1 && k < ranked.length && ranked(k - 1)._3 == ranked(k)._3) k -= 1
    ranked.take(math.max(k, 1))
  }

  /** [[trainMergesRelaxed]]'s batch: greedy skip-scan — take every
    * pair that is symbol-disjoint from (and not a concatenation of)
    * all previously taken ones, up to `cap`. No equivalence guarantee;
    * see trainMergesRelaxed's scaladoc for what diverges and why. */
  private[graft] def selectBatchRelaxed(
      ranked: IndexedSeq[(String, String, Long)], cap: Int): IndexedSeq[(String, String, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    while (i < ranked.length && out.length < cap) {
      val (a, b, _) = ranked(i)
      if (!used.contains(a) && !used.contains(b)) {
        used += a; used += b; used += (a + b)
        out += ranked(i)
      }
      i += 1
    }
    out.toIndexedSeq
  }

  /** [[trainMerges]]/[[trainMergesRelaxed]] + the number of Spark
    * rounds it took (spec/bench observability for the batching
    * refinement). */
  private[graft] def trainMergesWithRounds(freqs: DataFrame, numMerges: Int,
      minFreq: Long = 2L, batchCap: Int = 64,
      relaxed: Boolean = false): (Seq[(String, String)], Int) = {
    require(batchCap >= 1, s"batchCap must be >= 1: $batchCap")
    val spark = freqs.sparkSession
    import spark.implicits._
    // localCheckpoint (eager), NOT persist: each round derives from the
    // previous round's Dataset, and a persist-only loop accumulates the
    // whole map-chain in the ANALYZED PLAN — at tens of rounds Catalyst
    // re-analysis of that chain OOMs the driver before any job runs
    // (measured at 20 rounds / 2 GB). Checkpointing truncates lineage
    // to the materialized blocks each round; the superseded rounds'
    // blocks (vocab-scale, MBs) are reclaimed by the ContextCleaner
    // once their Dataset references drop out of scope. SERIALIZED
    // storage (r15, the Graph.kCore heap-cliff lesson): the word table
    // is vocab-scale here but distinct-word-scale on a real corpus,
    // and a deserialized checkpoint of (IndexedSeq[String], Long)
    // tuples is many times its serialized bytes.
    var words: Dataset[(IndexedSeq[String], Long)] = freqs
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): IndexedSeq[String], f) }
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var done = false
    while (merges.length < numMerges && !done) {
      val cap = math.min(batchCap, numMerges - merges.length)
      // Exact mode needs cap+1 rows (the first EXCLUDED weight feeds
      // selectBatch's boundary-tie trim); the relaxed skip-scan needs a
      // wider window since skipped pairs consume it. 16x, not 4x: on a
      // small-alphabet corpus the top of the ranking is conflict-dense
      // (every pair shares one of few hot symbols), and a starved
      // window caps the batch far below batchCap — measured 29-wide
      // batches at cap 512 under 4x on the vocab-scale drive; the
      // window rows are (string, string, long) KBs either way.
      val window = if (relaxed) cap * 16 + 1 else cap + 1
      // tuple struct fields are _1/_2; ties break lexicographically
      val ranked = words.flatMap { case (syms, f) =>
        (0 until syms.length - 1).map(i => ((syms(i), syms(i + 1)), f))
      }.toDF("pair", "f")
        .groupBy("pair").agg(sum("f").as("w"))
        .filter(col("w") >= minFreq)
        .orderBy(desc("w"), col("pair._1"), col("pair._2"))
        .limit(window)
        .select(col("pair._1"), col("pair._2"), col("w"))
        .as[(String, String, Long)]
        .collect().toIndexedSeq
      rounds += 1
      val batch = if (relaxed) selectBatchRelaxed(ranked, cap) else selectBatch(ranked, cap)
      if (batch.isEmpty) done = true
      else {
        val rules = batch.map { case (a, b, _) => (a, b) }
        merges ++= rules
        words = words.map { case (syms, f) =>
          (rules.foldLeft(syms) { case (s, (a, b)) => applyMerge(s, a, b) }, f)
        }.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
    }
    (merges.toSeq, rounds)
  }
}
