package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TrainExport

/** The scalable two-pass formulations must agree row-for-row with the
  * single-partition window formulations they replace — pinned here on
  * data small enough for the naive plan, across partition counts (a
  * global cumsum must not depend on partition boundaries). */
class TrainExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % 100 + 1).toLong,
        if (i % 7 == 0) "rare" else if (i % 2 == 0) "en" else "de"))
      .toDF("id", "toks", "lang")

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "available", "allocated", "rate", "capped")
      .as[(String, Long, Double, Double, Int)].collect()
      .map(t => t._1 -> t).toMap

  test("mixturePlan: hand water-filling — capped source spills to the rest") {
    // availabilities (10, 20, 100), equal weights, budget 40:
    // lambda = 40/3 caps the 10; the respill lambda = (40-10)/2 = 15
    // caps nothing else -> alloc (10, 15, 15)
    val d = Seq(("a", 10L), ("b", 20L), ("c", 100L))
      .flatMap { case (s, n) => (1L to n).map(i => (s, 1L)) }
      .toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), budget = 40L))
    assert(plan("a") == ("a", 10L, 10.0, 1.0, 1))
    assert(plan("b") == ("b", 20L, 15.0, 0.75, 0))
    assert(plan("c") == ("c", 100L, 15.0, 0.15, 0))
  }

  test("mixturePlan: cascading caps resolve in one closed-form pass") {
    // budget 90, equal weights: first water level 30 caps a(10);
    // respill (90-10)/2 = 40 caps b(20); final lambda = (90-30)/1 = 60
    val d = Seq(("a", 10L), ("b", 20L), ("c", 100L))
      .map { case (s, n) => (s, n) }.toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), budget = 90L))
    assert(plan("a")._3 == 10.0 && plan("a")._5 == 1)
    assert(plan("b")._3 == 20.0 && plan("b")._5 == 1)
    assert(plan("c")._3 == 60.0 && plan("c")._5 == 0)
    assert(plan.values.map(_._3).sum == 90.0, "allocations must sum to budget")
  }

  test("mixturePlan: under-budget corpus caps everything at its supply") {
    val d = Seq(("a", 10L), ("b", 20L)).toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 3.0, "b" -> 1.0), budget = 1000L))
    assert(plan("a") == ("a", 10L, 10.0, 1.0, 1))
    assert(plan("b") == ("b", 20L, 20.0, 1.0, 1))
  }

  test("mixturePlan: unweighted sources surface with allocation 0") {
    val d = Seq(("a", 50L), ("ghost", 50L)).toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 1.0), budget = 30L))
    assert(plan("ghost") == ("ghost", 50L, 0.0, 0.0, 0))
    assert(plan("a")._3 == 30.0)
  }

  test("mixturePlan: weights skew allocations proportionally") {
    // plenty of supply everywhere -> alloc_i = budget * w_i exactly
    val d = Seq(("a", 1000L), ("b", 1000L)).toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 3.0, "b" -> 1.0), budget = 100L))
    assert(plan("a")._3 == 75.0 && plan("b")._3 == 25.0)
    assert(plan("a")._5 == 0 && plan("b")._5 == 0)
  }

  test("mixturePlan property: water-filling invariants under generated inputs") {
    // the closed-form pivot scan has subtle edge surface (rounded sort
    // keys, ties, all-capped, zero budget): fuzz it and assert the
    // invariants the proof promises — no allocation exceeds its
    // capacity, capped rows take exactly their capacity, and the total
    // lands on min(budget, total capacity) up to 6-decimal rounding
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val srcGen = for {
      s <- Gen.choose(1, 7)
      avails <- Gen.listOfN(s, Gen.choose(1L, 10000L))
      ws <- Gen.listOfN(s, Gen.oneOf(1.0, 2.0, 4.0, 8.0))
    } yield avails.zip(ws).zipWithIndex.map { case ((a, w), i) => (s"s$i", a, w) }
    val gen = for {
      rows <- srcGen
      budget <- Gen.choose(0L, rows.map(_._2).sum * 3)
      maxRate <- Gen.oneOf(1.0, 2.0, 2.5)
    } yield (rows, budget, maxRate)
    val p = Prop.forAll(gen) { case (rows, budget, maxRate) =>
      val docs = rows.map { case (s, a, _) => (s, a) }.toDF("source", "n_tok")
      val weights = rows.map { case (s, _, w) => s -> w }.toMap
      val plan = TrainExport.mixturePlan(docs, "source", "n_tok",
          weights, budget, maxRate = maxRate)
        .as[(String, Long, Double, Double, Double, Int)].collect()
      val totalCap = rows.map { case (_, a, _) => a * maxRate }.sum
      val eps = 1e-4 * (rows.size + 1)
      plan.forall { case (_, avail, _, alloc, rate, capped) =>
        alloc <= avail * maxRate + 1e-6 &&
        rate <= maxRate + 1e-6 &&
        (capped == 0 || math.abs(alloc - BigDecimal(avail * maxRate)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      } && math.abs(plan.map(_._4).sum - math.min(budget.toDouble, totalCap)) < eps
    }
    val r = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  test("mixturePlan: a weighted source absent from the corpus doesn't shrink the plan") {
    // weights name a typo'd/absent source: its share must NOT stay in
    // the water level's denominator (that silently under-filled the
    // budget by the share) — the plan equals the one with the absent
    // entry removed
    val d = Seq(("a", 1000L), ("b", 1000L)).toDF("source", "n_tok")
    val withGhost = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 3.0, "b" -> 1.0, "tpyo" -> 4.0), budget = 100L))
    val without = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 3.0, "b" -> 1.0), budget = 100L))
    assert(withGhost == without, s"ghost source changed the plan: $withGhost")
    assert(withGhost("a")._3 + withGhost("b")._3 == 100.0,
      "budget must fill despite the absent weighted source")
  }

  test("mixturePlan: no weighted source present fails loudly") {
    val d = Seq(("a", 1000L)).toDF("source", "n_tok")
    intercept[IllegalArgumentException] {
      TrainExport.mixturePlan(d, "source", "n_tok",
        Map("nope" -> 1.0), budget = 100L)
    }
  }

  test("mixturePlan maxRate: an under-supplied source upsamples to its epoch cap") {
    // avail (10, 100), equal weights, budget 60, maxRate 3: capacities
    // (30, 300); the scarce source caps at 3 epochs (alloc 30, rate 3),
    // the spill leaves the big source thinned at 0.3
    val d = Seq(("a", 10L), ("b", 100L)).toDF("source", "n_tok")
    val plan = planOf(TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 1.0, "b" -> 1.0), budget = 60L, maxRate = 3.0))
    assert(plan("a") == ("a", 10L, 30.0, 3.0, 1), s"got ${plan("a")}")
    assert(plan("b") == ("b", 100L, 30.0, 0.3, 0), s"got ${plan("b")}")
  }

  test("rateSampleEpochs: integer rates copy exactly, fractional rates draw, absent emit nothing") {
    val d = (1L to 20L).map(i =>
      (i, if (i <= 10) "a" else if (i <= 18) "b" else "c"))
      .toDF("id", "source")
    val rates = Seq(("a", 2.0), ("b", 0.5)).toDF("source", "rate")
    val out = TrainExport.rateSampleEpochs(d, "id", "source", rates, "e1")
    val byId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert((1L to 10L).forall(byId.get(_).contains(2L)),
      s"rate 2.0 must copy every doc exactly twice: $byId")
    assert((11L to 18L).forall(i => byId.getOrElse(i, 0L) <= 1L),
      s"rate 0.5 emits at most one copy: $byId")
    assert(!byId.keySet.exists(_ > 18L), s"absent source must emit nothing: $byId")
    val epochs = out.filter(col("id") === 1L)
      .select("epoch").as[Int].collect().sorted.toSeq
    assert(epochs == Seq(0, 1), s"epochs must be 0-based copy indexes: $epochs")
    val again = TrainExport.rateSampleEpochs(d, "id", "source", rates, "e1")
      .select("id", "epoch").as[(Long, Int)].collect().toSet
    assert(again == out.select("id", "epoch").as[(Long, Int)].collect().toSet,
      "the epoch draw must be deterministic")
  }

  test("rateSample: draws a plan — capped whole, rate-0 empty, deterministic") {
    val d = (Seq(("a", 10L), ("b", 20L), ("c", 100L))
      .flatMap { case (s, n) => (1L to n).map(i => (s"$s$i", s, 1L)) })
      .toDF("id", "source", "n_tok")
    val plan = TrainExport.mixturePlan(d, "source", "n_tok",
      Map("a" -> 1.0, "b" -> 1.0), budget = 25L) // c unweighted -> rate 0
    val kept = TrainExport.rateSample(d, "id", "source", plan, "s1")
    val bySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("a", 0L) == 10L,
      s"capped source must survive whole: $bySrc") // a: 10 <= 25/2 -> rate 1
    assert(!bySrc.contains("c"), s"rate-0 source must draw nothing: $bySrc")
    assert(bySrc.getOrElse("b", 0L) < 20L,
      s"thinned source must actually thin: $bySrc")
    val again = TrainExport.rateSample(d, "id", "source", plan, "s1")
      .select("id").as[String].collect().toSet
    assert(again == kept.select("id").as[String].collect().toSet,
      "the draw must be a pure function of (corpus, rates, seed)")
    val other = TrainExport.rateSample(d, "id", "source", plan, "s2")
      .select("id").as[String].collect().toSet
    assert(other != again, "a different seed must draw a different set")
  }

  test("global prefix sum matches the naive window across partition counts") {
    val d = docs(500)
    val naive = d.withColumn("cum",
        sum("toks").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 32)) {
      val got = TrainExport.withGlobalPrefixSum(d, "id", "toks", "cum", parts)
        .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == naive, s"at $parts partitions")
    }
  }

  test("packSequences: contiguous layout, budget-sized cuts, straddling allowed") {
    val d = docs(300)
    val packed = TrainExport.packSequences(d, "id", "toks", budget = 128)
      .orderBy("id")
      .select("id", "toks", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // reconstruct the global token stream: each doc starts exactly where
    // the previous ended
    var offset = 0L
    packed.foreach { case (_, toks, seqId, seqOff) =>
      assert(seqId == offset / 128)
      assert(seqOff == offset % 128)
      offset += toks
    }
    // budget must be respected: no start offset at or past the cut
    assert(packed.forall(_._4 < 128))
  }

  test("mixtureSample keeps all of the rarest class and is deterministic") {
    val d = docs(700)
    val kept = TrainExport.mixtureSample(d, "id", "lang", "seed1")
    val keptCounts = kept.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val rareTotal = d.filter($"lang" === "rare").count()
    assert(keptCounts("rare") == rareTotal) // rarest class never sampled
    // others land near the rare count (md5-uniform: expect ±40% at n=100)
    Seq("en", "de").foreach { l =>
      assert(keptCounts(l) > rareTotal * 0.6 && keptCounts(l) < rareTotal * 1.4,
        s"$l kept ${keptCounts(l)} vs target $rareTotal")
    }
    // byte-deterministic across runs; different seed → different set
    val again = TrainExport.mixtureSample(d, "id", "lang", "seed1")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
    val other = TrainExport.mixtureSample(d, "id", "lang", "seed2")
      .select("id").as[Long].collect().sorted.toSeq
    assert(other != again)
  }

  test("writeTrainingShards: balanced partitioned layout, manifest, byte-deterministic re-export") {
    val d = docs(200).withColumn("text",
      concat_ws(" ", lit("body of document"), $"id"))
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/exp"
    val perShard = TrainExport.writeTrainingShards(
      d, out, "id", seed = "s1", nShards = 4, packBudget = Some(64))
    assert(perShard.values.sum == 200L)
    assert(perShard.values.max - perShard.values.min <= 1)
    // physical layout: one shard=N directory per shard
    val back = spark.read.parquet(out)
    assert(back.select("shard").distinct().count() == 4)
    assert(back.columns.toSet ==
      Set("id", "toks", "lang", "text", "pos", "shard", "seq_id", "seq_offset"))
    val manifest = graft.util.Json.parseObject(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "_manifest.json"))))
    assert(manifest("seed") == "s1")
    assert(manifest("rows") == 200L)
    // re-export = byte-identical content (reproducibility contract)
    val snapshot = back.orderBy("pos").collect().map(_.toString).toSeq
    TrainExport.writeTrainingShards(d, out, "id", "s1", 4, Some(64))
    val again = spark.read.parquet(out).orderBy("pos").collect().map(_.toString).toSeq
    assert(again == snapshot)
  }

  test("deterministicShuffle: a permutation, balanced shards, stable across partitionings") {
    val d = docs(333)
    val shuf = TrainExport.deterministicShuffle(d, "id", "s7", nShards = 8)
    val rows = shuf.select("id", "pos", "shard")
      .as[(Long, Long, Int)].collect().toSeq
    assert(rows.map(_._2).sorted == (1L to 333L)) // pos is a permutation
    val sizes = rows.groupBy(_._3).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1) // round-robin: ±1 row
    // same order regardless of input partitioning
    val rows2 = TrainExport.deterministicShuffle(d.repartition(13), "id", "s7", 8)
      .select("id", "pos").as[(Long, Long)].collect().toSeq.sorted
    assert(rows2 == rows.map(r => (r._1, r._2)).sorted)
    // the permutation actually shuffles (not identity order)
    assert(rows.sortBy(_._2).map(_._1) != (1L to 333L).toSeq)
  }

  test("mixtureSampleTemperature: alpha=0 == uniform mixture, alpha=1 keeps all, monotone") {
    val d = docs(500)
    val uniform = TrainExport.mixtureSample(d, "id", "lang", "sA")
      .select("id").as[Long].collect().toSet
    val t0 = TrainExport.mixtureSampleTemperature(d, "id", "lang", 0.0, "sA")
      .select("id").as[Long].collect().toSet
    assert(t0 == uniform)
    val t1 = TrainExport.mixtureSampleTemperature(d, "id", "lang", 1.0, "sA")
      .select("id").as[Long].collect().toSet
    assert(t1 == (1L to 500L).toSet)
    // a warmer temperature keeps a superset (same keys, higher thresholds)
    val tHalf = TrainExport.mixtureSampleTemperature(d, "id", "lang", 0.5, "sA")
      .select("id").as[Long].collect().toSet
    assert(t0.subsetOf(tHalf) && tHalf.subsetOf(t1))
    // rarest class always survives whole
    val rare = d.filter($"lang" === "rare").select("id").as[Long].collect().toSet
    assert(rare.subsetOf(tHalf))
  }

  test("stratifiedSample: exactly n per class, window parity, whole class when small") {
    val d = docs(500) // en 250, de 179, rare 71
    val got = TrainExport.stratifiedSample(d, "id", "lang", n = 25, seed = "s1")
      .select("id", "lang").as[(Long, String)].collect().toSeq
    val perClass = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perClass == Map("en" -> 25, "de" -> 25, "rare" -> 25))
    // parity with the row_number window formulation it replaces
    val w = Window.partitionBy("lang").orderBy(
      lower(substring(md5(concat(lit("s1:"), col("id").cast("string"))), 1, 8)),
      col("id"))
    val naive = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 25).select("id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == naive)
    // deterministic: same seed → same draw
    val again = TrainExport.stratifiedSample(d, "id", "lang", 25, "s1")
      .select("id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
    // n beyond the class size returns the whole class, no more
    val all = TrainExport.stratifiedSample(d, "id", "lang", 100, "s1")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(all == Map("en" -> 100L, "de" -> 100L, "rare" -> 71L))
  }

  test("stratifiedSample: non-numeric string ids fail loudly, never an empty sample (r6 ADVICE fix)") {
    val d = Seq(("a.md#0", "en"), ("b.md#1", "en"), ("c.md#2", "de"))
      .toDF("id", "lang")
    val e = intercept[Exception] {
      TrainExport.stratifiedSample(d, "id", "lang", n = 1, seed = "s").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // ANSI mode (the Spark 4 default) rejects the cast itself
    // (CAST_INVALID_INPUT); with ANSI off the cast yields NULL and the
    // raise_error guard fires. Either way: loud, never empty.
    assert(messages(e).exists(m =>
      m.contains("not castable to long") || m.contains("CAST_INVALID_INPUT")))
    // numeric STRING ids still work (cast succeeds)
    val ok = TrainExport.stratifiedSample(
        Seq(("10", "en"), ("11", "en"), ("12", "de")).toDF("id", "lang"),
        "id", "lang", n = 1, seed = "s")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(ok == Map("en" -> 1L, "de" -> 1L))
  }

  private def textDocs(rows: (Long, String)*) = rows.toDF("id", "text")

  test("dsirLogWeights: target == raw gives exactly zero; target-like docs outrank others") {
    val d = textDocs(
      1L -> "spark shuffle partition spark shuffle codegen",
      2L -> "spark partition codegen shuffle spark plan",
      3L -> "violin sonata allegro violin adagio tempo",
      4L -> "sonata tempo violin allegro crescendo forte")
    // identical corpora: every bucket count matches, so every lambda —
    // hence every log weight — is exactly 0.0, not just approximately
    val self = TrainExport.dsirLogWeights(d, "id", "text", d, "text")
      .select("id", "log_w").as[(Long, Double)].collect().toMap
    assert(self == Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0))
    // target = the spark-flavored half: spark docs must outweigh music docs
    val w = TrainExport.dsirLogWeights(d, "id", "text",
        d.filter($"id" <= 2), "text")
      .select("id", "log_w").as[(Long, Double)].collect().toMap
    assert(Seq(1L, 2L).map(w).min > Seq(3L, 4L).map(w).max)
    // zero-token docs carry no features and are absent, not zero-scored
    val withEmpty = TrainExport.dsirLogWeights(
        textDocs(1L -> "spark shuffle", 2L -> "???"), "id", "text",
        textDocs(10L -> "spark"), "text")
      .select("id").as[Long].collect().toSet
    assert(withEmpty == Set(1L))
  }

  test("dsirSample: k rows, deterministic, target-shifted vs uniform") {
    val d = (1L to 200L).map { i =>
      val text = if (i % 4 == 0) "spark shuffle partition codegen plan"
                 else "violin sonata allegro adagio tempo"
      (i, text)
    }.toDF("id", "text")
    val target = d.filter($"id" % 4 === 0) // the spark quarter
    val got = TrainExport.dsirSample(d, "id", "text", target, "text",
        k = 40, seed = "g1")
      .select("id").as[Long].collect().toSeq
    assert(got.size == 40 && got.distinct.size == 40)
    // Gumbel resampling ∝ exp(log_w) must over-represent the target
    // flavor relative to its 25% base rate (the weights separate the
    // two flavors by a wide margin, so this is not a flaky margin)
    val sparkShare = got.count(_ % 4 == 0).toDouble / got.size
    assert(sparkShare > 0.5, s"spark-flavored share $sparkShare")
    // pure function of (corpora, seed, k)
    val again = TrainExport.dsirSample(d, "id", "text", target, "text",
        40, "g1").select("id").as[Long].collect().toSeq
    assert(again == got)
  }

  test("curriculumOrder: strata by score quantiles, shuffled within, total order") {
    val d = (1L to 9L).map(i => (i, i * 10L)).toDF("id", "score")
    val out = TrainExport.curriculumOrder(d, "id", "score", buckets = 3,
        seed = "t1")
      .select("id", "bucket", "pos").as[(Long, Int, Long)].collect()
      .sortBy(_._3)
    // thresholds are interpolated terciles of 10..90: 36.67 / 63.33
    val bucketOf = out.map(r => r._1 -> r._2).toMap
    assert(Seq(1L, 2L, 3L).forall(bucketOf(_) == 0))
    assert(Seq(4L, 5L, 6L).forall(bucketOf(_) == 1))
    assert(Seq(7L, 8L, 9L).forall(bucketOf(_) == 2))
    // pos is 1..n and strictly stratified: every bucket-b row precedes
    // every bucket-(b+1) row
    assert(out.map(_._3).toSeq == (1L to 9L))
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted)
    // deterministic, and intra-bucket order is the md5 shuffle (id
    // order would only coincide if md5 sorted ids — it doesn't here)
    val again = TrainExport.curriculumOrder(d, "id", "score", 3, "t1")
      .select("id", "bucket", "pos").as[(Long, Int, Long)].collect().sortBy(_._3)
    assert(again.toSeq == out.toSeq)
    assert(out.filter(_._2 == 0).map(_._1).toSeq != Seq(1L, 2L, 3L) ||
      out.filter(_._2 == 1).map(_._1).toSeq != Seq(4L, 5L, 6L))
  }
}
