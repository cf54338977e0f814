package graft

import org.apache.spark.sql.functions._

import graft.operators.TextClassifier

/** Closed-form NB: scores hand-checked against the smoothing formula,
  * separable classes recovered on held-out docs, deterministic ties. */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("scores match the hand-computed Laplace-smoothed posterior") {
    // V=2, alpha=1: theta(aa|pos)=(2+1)/(2+3), zero(pos)=1/5;
    // theta(bb|neg)=(1+1)/(1+4)... n_tot(neg)=1 -> (1+1)/(1+3), zero(neg)=1/4.
    val train = Seq(("aa aa", "pos"), ("bb", "neg")).toDF("text", "label")
    val model = TextClassifier.train(train, "label", "text")
    val got = TextClassifier.scores(
        Seq((1L, "aa")).toDF("id", "text"), model, "id", "text")
      .as[(Long, String, Double)].collect().map(r => r._2 -> r._3).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got("pos") == r6(math.log(0.5) + math.log(3.0 / 5)))
    assert(got("neg") == r6(math.log(0.5) + math.log(1.0 / 4)))
    val pred = TextClassifier.predict(
        Seq((1L, "aa")).toDF("id", "text"), model, "id", "text")
      .as[(Long, String, Double)].collect()
    assert(pred.length == 1 && pred.head._2 == "pos")
  }

  test("separable vocabulary is recovered on held-out docs") {
    val docs = (0 until 200).map { i =>
      val cls = if (i % 2 == 0) "spark" else "flink"
      val text = if (cls == "spark") s"shuffle stage executor task $i common word"
                 else s"operator checkpoint barrier slot $i common word"
      (i.toLong, text, cls)
    }.toDF("id", "text", "label")
    val model = TextClassifier.train(docs.filter($"id" < 100), "label", "text")
    val pred = TextClassifier.predict(docs.filter($"id" >= 100), model, "id", "text")
      .join(docs.select($"id", $"label"), "id")
      .select($"pred" === $"label").as[Boolean].collect()
    assert(pred.length == 100 && pred.forall(identity))
  }

  test("unseen-only docs fall back to priors; token-less docs are absent") {
    val train = Seq(("aa aa aa", "pos"), ("bb", "neg"), ("bb cc", "neg"))
      .toDF("text", "label")
    val model = TextClassifier.train(train, "label", "text")
    // all-unseen tokens: evidence is log_zero per class — neg has the
    // larger n_tot... pos n_tot=3, neg n_tot=3; equal log_zero, prior
    // decides: neg (2 docs of 3) wins.
    val p = TextClassifier.predict(
        Seq((1L, "zz yy"), (2L, "")).toDF("id", "text"), model, "id", "text")
      .as[(Long, String, Double)].collect()
    assert(p.length == 1 && p.head._1 == 1L && p.head._2 == "neg")
  }
}
