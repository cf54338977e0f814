package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes over BM25-tokenized text — the trainable
  * document classifier a pretraining pipeline runs at corpus scale
  * (GPT-3's quality classifier, CCNet's language/domain gates): train
  * on a labeled reference set, score and route everything else.
  *
  * Naive Bayes rather than logistic regression because training is
  * CLOSED-FORM COUNTING: one (class, term) aggregation plus class
  * totals — no iterative optimizer, no gradient state — so training
  * parallelizes like any groupBy, the model is a plain DataFrame pair,
  * and both train and apply are engine-portable arithmetic (the whole
  * path is DuckDB-oracle-checked, same stance as
  * [[CorpusClean.lmModel]]/`lmScoreWith`).
  *
  * Model: Laplace-smoothed token likelihoods with V+1 slots — the +1
  * reserves probability mass for tokens unseen in training, and a
  * (term, class) pair with no row smooths to the SAME value as the
  * unseen slot ((0+α)/(N_c+α(V+1))), so scoring never needs to know
  * whether a missing join row meant "not in vocab" or "not in this
  * class".
  *
  * Scale: training shuffles once on (class, term) with map-side
  * combine (per-task state bounded by distinct terms per class);
  * scoring shuffles once on (doc, term) — the BM25-tf bound — joins
  * the model by term (broadcast-able: V×C rows of three columns; AQE
  * picks the join side otherwise), and rolls up per (doc, class).
  * Nothing is ever keyed by the corpus pair-wise, and no optimizer
  * state crosses tasks. Scores round to 6 before the argmax so
  * predictions are engine-deterministic; argmax ties break to the
  * lexicographically smallest class.
  */
object TextClassifier {

  /** Trained model: `termLogProb(cls, term, log_theta)` +
    * `classStats(cls, log_prior, log_zero)`. Both lazy plans over the
    * training frame — persist them (or write to parquet) before
    * scoring a large corpus so training runs once. */
  final case class NbModel(termLogProb: DataFrame, classStats: DataFrame)

  /** Train on `docs(labelCol, textCol)`: token counts per (class,
    * term), Laplace-smoothed with `alpha` over V+1 slots, plus
    * log document-frequency priors. */
  def train(docs: DataFrame, labelCol: String, textCol: String,
            alpha: Double = 1.0): NbModel = {
    val toks = docs.select(col(labelCol).cast("string").as("cls"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 1)
    // Persisted: vocab size, class totals, and the likelihood table all
    // derive from this count — unpersisted, each would re-tokenize the
    // training corpus (the BM25-tf persist stance).
    val nct = toks.groupBy("cls", "term").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = nct.agg(countDistinct("term").as("v"))
    val nc = nct.groupBy("cls").agg(sum("n").as("n_tot"))
      .crossJoin(broadcast(vocab))
    val termLogProb = nct.join(nc, "cls")
      .select(col("cls"), col("term"),
        log((col("n") + lit(alpha)) /
            (col("n_tot") + lit(alpha) * (col("v") + 1))).as("log_theta"))
    val docCounts = docs.groupBy(col(labelCol).cast("string").as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val totalDocs = docCounts.agg(sum("n_docs").as("total"))
    val classStats = docCounts.crossJoin(broadcast(totalDocs))
      .join(nc, "cls")
      .select(col("cls"),
        log(col("n_docs").cast("double") / col("total")).as("log_prior"),
        log(lit(alpha) /
            (col("n_tot") + lit(alpha) * (col("v") + 1))).as("log_zero"))
    NbModel(termLogProb, classStats)
  }

  /** Per-(doc, class) log-posterior scores (rounded to 6):
    * `log_prior + Σ tf·log_theta + unseen_tf·log_zero`. Token-less
    * docs are absent (they carry no evidence to score). */
  def scores(docs: DataFrame, model: NbModel, idCol: String,
             textCol: String): DataFrame = {
    // Persisted: both the per-doc totals and the model join consume it;
    // it is the BM25-tf shape (doc × term rows) at the BM25-tf storage
    // level.
    val docTf = docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 1)
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docTot = docTf.groupBy("id").agg(sum("tf").as("ttf"))
    val matched = docTf.join(model.termLogProb, "term")
      .groupBy("id", "cls")
      .agg(sum(col("tf") * col("log_theta")).as("s"), sum("tf").as("mtf"))
    docTot.crossJoin(model.classStats)
      .join(matched, Seq("id", "cls"), "left")
      .select(col("id"), col("cls"),
        round(col("log_prior") + coalesce(col("s"), lit(0.0)) +
          (col("ttf") - coalesce(col("mtf"), lit(0L))) * col("log_zero"),
          6).as("score"))
  }

  /** Argmax over [[scores]]: one (id, pred, score) row per doc, ties
    * to the lexicographically smallest class. */
  def predict(docs: DataFrame, model: NbModel, idCol: String,
              textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(desc("score"), col("cls"))
    scores(docs, model, idCol, textCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("cls").as("pred"), col("score"))
  }
}
