package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus profiling for a training-data pipeline.
  *
  * Two tiers with the same grouping shape:
  *
  *   - [[exactPercentiles]]: exact interpolated quantiles — per-group
  *     sort, O(group) memory. The correctness oracle, fine at audit
  *     scale.
  *   - [[corpusProfile]]: sketches only — HyperLogLog++ distinct
  *     fingerprints and approximate quantiles. One pass, CONSTANT state
  *     per group, map-side combinable: at 100 TB this profiles the
  *     corpus with a single shuffle of sketch buffers (KBs per group)
  *     instead of shuffling/sorting the rows themselves.
  */
object Profile {

  /** Exact per-language length percentiles (interpolated, matching
    * SQL `quantile_cont`). */
  def exactPercentiles(docs: DataFrame, langCol: String = "lang",
                       charsCol: String = "n_chars"): DataFrame =
    docs.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col(charsCol), lit(0.5)).as("p50_chars"),
        percentile(col(charsCol), lit(0.95)).as("p95_chars"))
      .orderBy(col(langCol))

  /** Sketch-based profile: doc counts, HLL++ distinct content
    * fingerprints (rsd 2%), approximate length quantiles, mean token
    * estimate — the all-constant-state variant of the profile. */
  def corpusProfile(docs: DataFrame, langCol: String = "lang",
                    textCol: String = "text",
                    charsCol: String = "n_chars"): DataFrame =
    docs
      .select(col(langCol), col(charsCol),
        TextFunctions.fingerprint(col(textCol)).as("fp"),
        TextFunctions.approxBpeTokenCount(col(textCol)).as("n_tok"))
      .groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp"), rsd = 0.02).as("approx_distinct"),
        percentile_approx(col(charsCol), lit(0.5), lit(10000)).as("p50_chars"),
        percentile_approx(col(charsCol), lit(0.95), lit(10000)).as("p95_chars"),
        avg(col("n_tok")).as("avg_tokens"))
      .orderBy(col(langCol))

  /** Per-source curation scorecard — the "which sources survive"
    * decision table a corpus owner reads before mixing: one row per
    * source with volume (docs, chars), length (mean words), exact-dup
    * pressure (distinct content fingerprints, dup docs, dup rate), and
    * Gopher quality pass-rate. RefinedWeb/Dolma-style pipelines make
    * exactly this call at the source/domain grain — a source whose dup
    * rate or quality fail-rate is pathological is dropped wholesale
    * before any per-document work is spent on it.
    *
    * Plan shape (the 100 TB posture): the Gopher flags and the content
    * fingerprint are computed in the SAME zero-shuffle projection over
    * the scan (gopherFlags' `keepCols` — no doc_id re-join), then ONE
    * corpus-scale exchange on (source, fp) with map-side combine, then
    * a rollup whose cardinality is the number of sources. Exact-dup
    * counting deliberately avoids `countDistinct(fp)` in the source
    * rollup: two distinct aggregates would trigger Expand (×k the
    * corpus through the shuffle); the two-level agg keys the one big
    * exchange by (source, fp) — 16-byte-ish rows — and counts distinct
    * fingerprints as plain `count(1)` in the tiny second stage.
    *
    * All ratios round to 6 decimals; `dup_docs` is kept as the
    * integer-exact companion of `dup_rate` (no FP boundary to argue
    * about). Fingerprint = [[TextFunctions.fingerprint]], the
    * whitespace-normalized md5 every exact-dedup tier uses. */
  def sourceScorecard(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      sourceCol: String = "source",
                      charsCol: String = "n_chars",
                      minWords: Int = 50): DataFrame = {
    val flagged = graft.operators.CorpusClean.gopherFlags(
        docs.withColumn("fp", TextFunctions.fingerprint(col(textCol))),
        idCol, textCol, minWords = minWords,
        keepCols = Seq(sourceCol, charsCol, "fp"))
      .select(col(sourceCol).as("source"), col("fp"),
        col(charsCol).cast("long").as("chars"),
        col("n_words"), col("passes").cast("long").as("pass"))
    val perFp = flagged.groupBy("source", "fp")
      .agg(count(lit(1)).as("copies"), sum("chars").as("chars"),
        sum("n_words").as("words"), sum("pass").as("passed"))
    perFp.groupBy("source")
      .agg(
        sum("copies").as("docs"),
        sum("chars").as("total_chars"),
        round(sum("words").cast("double") / sum("copies"), 6)
          .as("mean_words"),
        count(lit(1)).as("distinct_texts"),
        (sum("copies") - count(lit(1))).as("dup_docs"),
        round((sum("copies") - count(lit(1))).cast("double") /
          sum("copies"), 6).as("dup_rate"),
        round(sum("passed").cast("double") / sum("copies"), 6)
          .as("gopher_pass_rate"))
      .orderBy("source")
  }

  /** Per-slice token-distribution divergence: KL(slice ‖ corpus) over
    * the unigram term distributions, the standard drift/mixture monitor
    * for a training corpus (which sources are skewing the token mix,
    * did this month's crawl shift vocabulary). KL is finite by
    * construction — every slice term is a corpus term, so the corpus
    * probability in the denominator is never zero.
    *
    * Plan shape: ONE corpus-scale shuffle (the (slice, term) count,
    * map-side combined — the same bound as BM25's tf build); everything
    * after runs on the aggregated term tables (slice totals, corpus
    * marginals, a term-keyed join of aggregates, the final per-slice
    * rollup). Nothing is ever keyed by document, and the corpus total
    * broadcasts as a 1-row product. Per-term contributions round to 6
    * AFTER the per-slice sum. */
  /** Per-slice embedding drift: each slice's centroid compared to the
    * corpus centroid (L2 and cosine) — [[tokenDivergence]]'s
    * counterpart for the embedding modality (did this source's/batch's
    * representation shift; is an ingest slice degenerate). The corpus
    * centroid derives from the per-slice sums — aggregate tables, never
    * a second pass over the vectors.
    *
    * Plan shape: ONE corpus-scale (slice, dim) aggregate over the
    * exploded vectors (map-side combined — state per task ≤ slices ×
    * dims cells); everything downstream runs on slices × dims rows,
    * with the dims-row corpus centroid broadcast. Distances round to 6
    * AFTER the dim sums (house float-parity style).
    */
  def embeddingDrift(emb: DataFrame, sliceCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions
    val dims = emb.select(col(sliceCol).as("slice"),
      posexplode(VectorFunctions.asDouble(col(vecCol))).as(Seq("dim", "x")))
    // Persisted: the corpus centroid and the slice centroids both read
    // this aggregate; without it the corpus-scale explode+agg runs
    // twice. slices x dims rows — tiny.
    val sd = dims.groupBy("slice", "dim")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cd = sd.groupBy("dim")
      .agg((sum("s") / sum("n")).as("m_c"))
    val ms = col("s") / col("n")
    sd.join(broadcast(cd), "dim")
      .groupBy("slice")
      .agg(max("n").as("n_vecs"),
        round(sqrt(sum((ms - col("m_c")) * (ms - col("m_c")))), 6).as("l2_dist"),
        round(sum(ms * col("m_c")) /
          (sqrt(sum(ms * ms)) * sqrt(sum(col("m_c") * col("m_c")))), 6)
          .as("cosine"))
      .orderBy("slice")
  }

  def tokenDivergence(docs: DataFrame, sliceCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    // Persisted: four consumers (slice totals, corpus marginals, the
    // corpus total, the contribution join) would otherwise each re-run
    // the corpus-scale tokenize + shuffle (the BM25-tf persist stance).
    val st = docs
      .select(col(sliceCol).as("slice"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 1)
      .groupBy("slice", "term").agg(count(lit(1)).as("c_st"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sliceTot = st.groupBy("slice").agg(sum("c_st").as("n_s"))
    val corpus = st.groupBy("term").agg(sum("c_st").as("c_t"))
    val corpusTot = st.agg(sum("c_st").as("n_c"))
    st.join(corpus, "term")
      .join(sliceTot, "slice")
      .crossJoin(broadcast(corpusTot))
      .select(col("slice"), col("term"), col("c_st"),
        ((col("c_st").cast("double") / col("n_s")) *
          log((col("c_st").cast("double") / col("n_s")) /
              (col("c_t").cast("double") / col("n_c")))).as("contrib"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_terms"),
        sum("c_st").as("n_tokens"),
        round(sum("contrib"), 6).as("kl_vs_corpus"))
      .orderBy("slice")
  }
}
