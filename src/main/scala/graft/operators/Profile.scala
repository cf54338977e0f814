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
}
