package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data export operators: the last mile between a cleaned
  * corpus and a training run — deterministic global shuffle + sharding,
  * mixture-balanced sampling, and fixed-token-budget sequence packing.
  *
  * These extend the reference's pipeline (whose export surface stops at
  * per-index Parquet/JSONL tables) with the standard published export
  * passes a pretraining corpus needs: domain/language mixture balancing
  * (Du et al. 2022 GLaM §3; Touvron et al. 2023 LLaMA table 1),
  * deterministic shuffling into training shards, and GPT-style
  * concatenate-and-cut sequence packing (Brown et al. 2020, §2.2 —
  * documents are concatenated in order and cut every `budget` tokens).
  *
  * Scale design — the common primitive is a GLOBAL running total, which
  * naive SQL expresses as a window over `ORDER BY` with no PARTITION BY:
  * on Spark that plan collapses onto ONE task holding the whole corpus.
  * [[withGlobalPrefixSum]] instead does the classic two-pass distributed
  * prefix sum: range-partition + sort (the scalable total sort), take
  * ONE tiny per-partition aggregate to the driver (numPartitions rows,
  * never data), broadcast the partition base offsets back, and finish
  * with a per-partition running sum — every pass parallel, nothing
  * quadratic, driver state O(partitions). Sampling is a map-side filter
  * against md5-uniform keys (no shuffle beyond one tiny count agg), so
  * the only full shuffle in any of these operators is the range
  * partition that a total order fundamentally requires.
  *
  * Everything is deterministic (md5-keyed, not rand()-keyed): re-running
  * the export on the same corpus yields byte-identical shards — which is
  * also what makes every operator DuckDB-oracle-checkable.
  */
object TrainExport {

  /** 32-bit md5-uniform key in [0,1) as 8 lowercase hex chars —
    * deterministic per (seed, id), identically computable by any engine
    * with md5 (the property the sampling oracle leans on). Comparing the
    * fixed-width lowercase hex lexicographically IS the numeric compare.
    */
  def uniformHexKey(seed: String, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8))

  /** Appends `outCol` = running sum of `valueCol` over the global
    * `orderCol` order (inclusive of the current row), without a
    * single-partition window.
    *
    * Two-pass distributed prefix sum:
    *   1. range-partition by `orderCol` + sort within partitions — the
    *      same plan shape as Spark's total sort, so it scales exactly as
    *      far as `ORDER BY` does;
    *   2. per-partition sums (one tiny `groupBy(partition_id)` — at most
    *      `numParts` rows) collected to the driver, prefix-summed there,
    *      and broadcast back as each partition's base offset;
    *   3. one per-partition pass adds the running total on top of the
    *      base offset — imperative per-partition logic, the documented
    *      last-resort case (a running sum over a sorted iterator has no
    *      declarative equivalent that doesn't serialize the cluster).
    *
    * The result is independent of partition boundaries (a global cumsum
    * only depends on the total order), so AQE/partition-count changes
    * can't change answers. `orderCol` must be globally unique — ties
    * would make the within-tie order (hence their cumsums) arbitrary.
    * The partitioned+sorted frame is persisted for the duration of the
    * two passes so both jobs see the same partitioning.
    */
  def withGlobalPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                          outCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
            else spark.sessionState.conf.numShufflePartitions
    // Persisted so pass 1's collect and the caller's eventual action
    // share one scan+shuffle — scoped to the query per this repo's
    // convention (Bench/Verify clear the SQL cache between queries).
    // Correctness does NOT depend on the cache: range-partitioner
    // sampling is deterministic for deterministic input, so a
    // recomputed pass 2 sees the same boundaries pass 1 summed.
    val sorted = df
      .withColumn("_psval", col(valueCol).cast("long"))
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist()
    // Pass 1: per-partition totals — numParts rows, never row data.
    val sums = sorted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum("_psval").as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Exclusive prefix: partition p's base = sum of partitions < p.
    val bases: Map[Int, Long] = {
      var acc = 0L
      (0 until n).map { p =>
        val b = p -> acc; acc += sums.getOrElse(p, 0L); b
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(bases)
    val outSchema = sorted.schema
      .add(outCol, LongType, nullable = false)
    // Pass 2: running sum per sorted partition on top of the base.
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value.getOrElse(pid, 0L)
      it.map { r =>
        acc += r.getAs[Long]("_psval")
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(rdd, outSchema).drop("_psval")
  }

  /** GPT-style sequence packing (concatenate-and-cut): documents are
    * laid out in `idCol` order and cut every `budget` tokens; a document
    * starting at global token offset `t` belongs to sequence
    * `floor(t / budget)` at in-sequence offset `t % budget` (it may
    * straddle into the next sequence — the standard pretraining layout,
    * where an EOS token separates documents within a sequence).
    *
    * Returns (id, n_tokens, seq_id, seq_offset). One range-partition
    * shuffle total (see [[withGlobalPrefixSum]]).
    */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // Passenger columns ride through (the prefix sum preserves the full
    // row), so composed pipelines — curriculum_pack, writeTrainingShards
    // — never need a join back on the order key, which would recompute
    // the upstream lineage a second time.
    withGlobalPrefixSum(docs, idCol, tokCol, "_cum")
      .withColumn("_start", col("_cum") - col(tokCol))
      .withColumn("seq_id", floor(col("_start") / lit(budget.toDouble)))
      .withColumn("seq_offset", col("_start") % budget)
      .drop("_cum", "_start")
  }

  /** Mixture-balanced downsampling: keep every document of the rarest
    * `labelCol` class and an md5-uniform-keyed fraction of the others,
    * so each class contributes (in expectation) the rarest class's
    * count — the uniform-mixture special case of trained-mixture
    * weighting (GLaM/LLaMA-style domain reweighting).
    *
    * Deterministic per (seed, id): the kept set is a pure function of
    * the corpus, not of run order. Plan: one tiny class-count aggregate
    * (broadcast both ways), then a map-side filter — no full shuffle at
    * any scale. Keep-threshold compare happens in fixed-width lowercase
    * hex so any md5-capable engine reproduces it bit-for-bit.
    */
  def mixtureSample(docs: DataFrame, idCol: String, labelCol: String,
                    seed: String): DataFrame = {
    val counts = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("_cnt"))
    val minCnt = counts.agg(min("_cnt").as("_min_cnt"))
    // floor(min*2^32/cnt) as 8 lowercase hex digits; rate==1 (the rarest
    // class itself) is handled by the _cnt = _min_cnt arm, so the hex
    // threshold never needs to represent 2^32 (9 digits).
    val threshold = lower(lpad(hex(
      floor(col("_min_cnt") * lit(4294967296.0) / col("_cnt"))
        .cast("long")), 8, "0"))
    docs
      .join(broadcast(counts), Seq(labelCol))
      .crossJoin(broadcast(minCnt))
      .filter(col("_cnt") === col("_min_cnt") ||
        uniformHexKey(seed, col(idCol)) < threshold)
      .drop("_cnt", "_min_cnt")
  }

  /** Temperature-reweighted mixture sampling (the GLaM/LLaMA domain
    * balancing knob, target class mass ∝ n_c^alpha): per-class keep
    * rate `(n_min / n_c)^(1-alpha)`, so `alpha = 0` reproduces
    * [[mixtureSample]]'s uniform mixture exactly and `alpha = 1` keeps
    * the natural distribution (everything). Rates round to 6 decimals
    * BEFORE the hex-threshold conversion so the keep set is immune to
    * cross-engine `pow` ulp differences (the one new numeric hazard vs
    * the uniform case). Plan is identical to [[mixtureSample]]: one
    * tiny class-count aggregate broadcast back, then a map-side
    * md5-threshold filter — no full shuffle at any corpus size, and
    * the kept set is a pure function of (corpus, alpha, seed). */
  def mixtureSampleTemperature(docs: DataFrame, idCol: String,
                               labelCol: String, alpha: Double,
                               seed: String): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("_cnt"))
    val minCnt = counts.agg(min("_cnt").as("_min_cnt"))
    val rate = round(
      pow(col("_min_cnt").cast("double") / col("_cnt"), 1.0 - alpha), 6)
    val threshold = lower(lpad(hex(
      floor(rate * lit(4294967296.0)).cast("long")), 8, "0"))
    docs
      .join(broadcast(counts), Seq(labelCol))
      .crossJoin(broadcast(minCnt))
      // rate == 1 (the rarest class; every class at alpha = 1) keeps
      // everything — and keeps the threshold under 9 hex digits.
      .filter(rate >= 1.0 || uniformHexKey(seed, col(idCol)) < threshold)
      .drop("_cnt", "_min_cnt")
  }

  /** Deterministic stratified sample: EXACTLY `n` rows per class (fewer
    * only when the class itself is smaller) — the fixed-size per-class
    * draw ([[mixtureSample]] is the fixed-RATE counterpart; this is what
    * "take 10k docs per language for the eval set" needs). The sample is
    * the n smallest md5-uniform keys per class, ties broken by id, so it
    * is a pure function of (corpus, seed, n): reproducible, resumable,
    * engine-portable.
    *
    * Scale: a `row_number` window would shuffle and sort EVERY row by
    * class; this goes through the bounded [[graft.functions.expressions.TopKScored]]
    * aggregator instead, so map tasks forward at most n (id, key) pairs
    * per class into the exchange — O(tasks x classes x n), independent
    * of corpus size — and the winners (classes x n ids, KBs) broadcast
    * back as a semi-join to fetch the full rows. */
  def stratifiedSample(docs: DataFrame, idCol: String, labelCol: String,
                       n: Int, seed: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // 8 hex chars -> integer in [0, 2^32): numeric order == the hex
    // key's lexicographic order, exactly what the window oracle sorts by.
    // The long cast must be guarded: a non-numeric string id casts to
    // NULL, and an unguarded plan would silently return an EMPTY sample
    // (every ScoredId row dropped by the encoder) instead of failing.
    val castId = col(idCol).cast("long")
    val keyed = docs.select(col(labelCol).cast("string").as("lbl"),
        when(castId.isNull, raise_error(concat(
            lit(s"stratifiedSample: id column '$idCol' value '"),
            col(idCol).cast("string"),
            lit("' is not castable to long (string ids are not supported)"))))
          .otherwise(castId).as("id"),
        conv(uniformHexKey(seed, col(idCol)), 16, 10).cast("double").as("key"))
    // native TopKScored (r16; see Graph.topKPerNode): keeps score DESC,
    // so negate the key — "top n" = n smallest keys
    val winners = keyed
      .groupBy(col("lbl"))
      .agg(graft.functions.expressions.TopKScored
        .topk(-col("key"), col("id"), n).as("top"))
      .select(explode(col("top.id")).as("_sid"))
    docs.join(broadcast(winners),
      col(idCol).cast("long") === col("_sid"), "left_semi")
  }

  /** Write the deterministic training-shard layout for `docs`: global
    * md5-keyed shuffle + round-robin shards via
    * [[deterministicShuffle]], optional GPT-style packing columns over
    * the shuffled order ([[packSequences]] on `pos`, chars/4 token
    * proxy), `partitionBy(shard)` parquet, and a `_manifest.json`
    * (underscore-prefixed so Spark's file index ignores it in the dir)
    * recording the export config + per-shard row counts. Everything is
    * a pure function of (input, seed, nShards, packBudget): re-running
    * yields byte-identical shards and manifest — the reproducibility
    * contract a training run pins. Per-shard counts are computed from a
    * RE-READ of the written files (verifying the write, not the plan)
    * and returned. */
  def writeTrainingShards(docs: DataFrame, out: String, idCol: String,
      seed: String, nShards: Int, packBudget: Option[Int] = None,
      textCol: String = "text"): Map[String, Long] = {
    val shuffled = deterministicShuffle(docs, idCol, seed, nShards)
    val laid = packBudget match {
      case None => shuffled
      case Some(b) =>
        // passenger columns ride through packSequences — no join back
        val toks = ceil(length(col(textCol)) / lit(4.0)).cast("long")
        packSequences(shuffled.withColumn("n_tokens", toks),
          "pos", "n_tokens", b).drop("n_tokens")
    }
    laid.write.mode("overwrite").partitionBy("shard").parquet(out)
    val perShard = docs.sparkSession.read.parquet(out)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
      .sortBy(_._1).toMap
    val manifest = scala.collection.immutable.ListMap(
      "seed" -> seed, "shards" -> nShards,
      "pack_budget" -> packBudget.getOrElse(0),
      "rows" -> perShard.values.sum, "per_shard" -> perShard)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "_manifest.json"),
      graft.util.Json.write(manifest)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    perShard
  }

  /** Deterministic global shuffle + round-robin sharding for training
    * export: order by an md5 key of (seed, id) — a reproducible random
    * permutation — assign the global position scalably (prefix sum of
    * 1s, i.e. a distributed row_number), and deal rows into `nShards`
    * output shards round-robin, which equalizes shard sizes to ±1 row
    * regardless of key distribution.
    *
    * Returns the input columns + (pos, shard), pos 1-based in shuffle
    * order. Writing `partitionBy(shard)` after this yields the
    * fixed-count training files a data loader expects.
    */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: String,
                           nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val keyed = docs.withColumn("_shufkey",
      // md5 of the id is unique iff id is; suffix the id to make the
      // order key unconditionally unique (prefix-sum requirement)
      concat(uniformHexKey(seed, col(idCol)), lit(":"), col(idCol).cast("string")))
    withGlobalPrefixSum(keyed.withColumn("_one", lit(1L)),
        "_shufkey", "_one", "pos")
      .withColumn("shard", ((col("pos") - 1) % nShards).cast("int"))
      .drop("_one", "_shufkey")
  }

  /** Curriculum ordering (Bengio et al. 2009's easy-to-hard schedule,
    * as LLM pipelines apply it to data: train on the "easy" stratum
    * first, harden over time): documents are cut into `buckets` score
    * quantile strata (exact interpolated percentiles — one tiny agg,
    * thresholds broadcast; scores and cuts round to 6 before compare,
    * the perplexityBuckets stance) and laid out bucket-by-ascending-
    * score with a deterministic md5 shuffle WITHIN each bucket (the
    * schedule orders strata, not documents — intra-stratum order must
    * still be an unbiased shuffle, and a resumable/reproducible one).
    *
    * Score polarity is the caller's: pass length for a short-to-long
    * curriculum, negated LM score for clean-to-noisy.
    *
    * Plan: threshold agg (broadcast back) + the ONE range-partition
    * shuffle of the distributed prefix sum — same total cost as
    * [[deterministicShuffle]]. Returns input + (bucket, pos), pos
    * 1-based over the (bucket, shuffle-key) total order. */
  def curriculumOrder(docs: DataFrame, idCol: String, scoreCol: String,
                      buckets: Int = 3, seed: String = "curriculum"): DataFrame = {
    require(buckets > 1, s"need >= 2 buckets, got $buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val ths = broadcast(docs.agg(
      array(qs.map(q => round(percentile(col(scoreCol), lit(q)), 6)): _*).as("_ths")))
    val keyed = docs.crossJoin(ths)
      .withColumn("_r", round(col(scoreCol).cast("double"), 6))
      .withColumn("bucket",
        size(filter(col("_ths"), t => col("_r") > t)).cast("int"))
      .withColumn("_ck", concat(
        lpad(col("bucket").cast("string"), 4, "0"), lit(":"),
        uniformHexKey(seed, col(idCol)), lit(":"), col(idCol).cast("string")))
    withGlobalPrefixSum(keyed.withColumn("_one", lit(1L)), "_ck", "_one", "pos")
      .drop("_one", "_ck", "_ths", "_r")
  }

  /** Token-budget mixture plan — the allocation step every LLM data
    * recipe runs between "what do I have" ([[graft.operators.Profile
    * .sourceScorecard]]) and "draw the sample" ([[mixtureSample]]/
    * [[writeTrainingShards]]): given per-source available tokens,
    * target weights, and a total budget, allocate `alloc_i =
    * min(available_i, lambda * w_i)` with the water level `lambda`
    * chosen so allocations sum to the budget — sources that run dry
    * (capped) spill their unfilled quota to the rest in proportion to
    * weight, the standard water-filling allocation.
    *
    * CLOSED FORM, no iteration: sort sources by `r_i = available_i /
    * w_i` ascending; the capped set is a prefix of that order, and a
    * row is capped iff `r_i <= lambda_before_it`, tested CROSS-
    * MULTIPLIED (`available * (1 - prefixW) <= (budget - prefixC) *
    * w`) so no division enters the decision. (Proof sketch, for the
    * replayer: if row j is uncapped then lambda_j < lambda_{j-1} while
    * r_{j+1} >= r_j > lambda_{j-1}, so every later row is uncapped
    * too — raw prefix sums therefore agree with capped-only prefix
    * sums everywhere the test matters.) One corpus-scale exchange (the
    * per-source token sum, map-side combinable); everything after runs
    * on the <= S-row aggregate — the windows are single-partition BY
    * DESIGN and guarded loudly by `maxSources` (the sourceOverlap
    * stance: a per-URL source column would silently make "S rows"
    * corpus-scale).
    *
    * Determinism / engine parity: weights normalize by their sum over
    * the sources actually PRESENT in the corpus — a weighted source
    * the scan never saw (typo'd name, empty split) does not reserve
    * its share of the water level (it would silently under-fill the
    * budget by exactly that share), and a corpus containing NO
    * weighted source fails loudly. (Exact when raw weights are small
    * integers — integer sums are order-independent in doubles.) The
    * scan order key is
    * `round(r, 6)` with a source tie-break, so both engines sort
    * identically; allocations and rates round to 6 decimals. Sources
    * present in the corpus but absent from `weights` (or weighted 0)
    * get allocation 0 and `capped = 0` — visible in the output, never
    * silently dropped. When total available <= budget every source
    * caps at its own supply (the scan yields this without a special
    * case) and the plan simply cannot fill the budget.
    *
    * Output: (source, available, weight, allocated, rate, capped)
    * ordered by source; `rate` is the sampling rate `allocated /
    * available` ready for a hex-threshold draw, `capped` is 1 where
    * the source's full supply is taken. */
  def mixturePlan(docs: DataFrame, sourceCol: String, tokensCol: String,
                  weights: Map[String, Double], budget: Long,
                  maxSources: Int = 10000,
                  maxRate: Double = 1.0): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(maxRate > 0.0, s"maxRate must be > 0, got $maxRate")
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0) &&
      weights.values.sum > 0.0,
      "weights must be non-empty, non-negative, with a positive sum")
    val spark = docs.sparkSession
    import spark.implicits._
    // RAW weights ride into the plan; normalization happens ONCE below,
    // against the present-source raw sum — a pre-normalized w/wSum
    // followed by a renormalizing division would compound two double
    // roundings (three equal weights: 1/3 * 3 != 1) and nudge
    // allocations across their round-6 boundary even when every
    // weighted source is present.
    val wDf = weights.toSeq.sortBy(_._1).toDF("source", "wraw")
    // Eager checkpoint: the per-source availability scan is the only
    // corpus-scale cost here, and the S-row result feeds three driver
    // actions (the guard count, the present-weight probe, the plan
    // itself) — materialize it once instead of re-scanning per action.
    val avail = docs
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(col(tokensCol)).cast("long").as("available"))
      .localCheckpoint()
    val nSrc = avail.count()
    require(nSrc <= maxSources,
      s"mixturePlan plans over an S-row source table (single-partition " +
        s"windows by design): got $nSrc distinct '$sourceCol' values > " +
        s"$maxSources. Aggregate sources first (e.g. path -> domain) " +
        "or raise maxSources deliberately.")
    val joined0 = avail.join(broadcast(wDf), Seq("source"), "left")
      .na.fill(Map("wraw" -> 0.0))
    // Normalize over the weight mass actually PRESENT in the corpus: a
    // weighted source the scan never saw (typo'd --weights name, an
    // empty split) must not keep reserving its share of the water
    // level — with the full-map denominator, (1 - cw) still counted
    // the absent share and every allocation silently shrank by it,
    // under-filling the budget. The denominator is the sum of RAW
    // weights of present sources, computed on the DRIVER in sorted-name
    // order over the S-row table: deterministic regardless of plan
    // order, exact for small-integer weights, and — when every weighted
    // source is present — identical to the plain w/sum(w) the oracle
    // replays (one division, no compounding). Weights are relative
    // proportions over what exists; a corpus with NO weighted source
    // present is a mistake, not an empty plan, so it fails loudly.
    val presentSources = joined0.filter(col("wraw") > 0.0)
      .select("source").as[String].collect().toSet
    val presentW = weights.toSeq.sortBy(_._1)
      .collect { case (s, w) if w > 0.0 && presentSources.contains(s) => w }
      .sum
    require(presentW > 0.0,
      s"mixturePlan: none of the weighted sources (${weights.keys.toSeq.sorted.take(5).mkString(", ")}" +
        s"${if (weights.size > 5) ", ..." else ""}) appear in '$sourceCol' — " +
        "check the weight names against the corpus")
    val joined = joined0.withColumn("w", col("wraw") / lit(presentW)).drop("wraw")
    // zero-weight sources are excluded from the water-filling but kept
    // in the output (allocation 0) — an unweighted source must be a
    // visible decision, not a silent drop
    val zero = joined.filter(col("w") <= 0.0)
      .select(col("source"), col("available"),
        lit(0.0).as("weight"), lit(0.0).as("allocated"),
        lit(0.0).as("rate"), lit(0).as("capped"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("r"), col("source"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // the water-filling capacity is `available * maxRate`: at the
    // default 1.0 a source caps at its own supply; above it a capped
    // source UPSAMPLES — its docs repeat up to maxRate epochs (the
    // Wikipedia-times-3 recipe knob). maxRate scales every capacity
    // uniformly, so the pivot scan is unchanged in structure; at 1.0
    // every cap expression is exactly the integer supply, so the
    // default plan is bit-identical to the capless formulation (the
    // existing oracle replays it unchanged).
    val scanned = joined.filter(col("w") > 0.0)
      .withColumn("cap", col("available") * lit(maxRate))
      .withColumn("r", round(col("cap") / col("w"), 6))
      .withColumn("pc", coalesce(sum("cap").over(ord), lit(0.0)))
      .withColumn("pw", coalesce(sum("w").over(ord), lit(0.0)))
      .withColumn("is_capped",
        col("cap") * (lit(1.0) - col("pw")) <=
          (lit(budget.toDouble) - col("pc")) * col("w"))
    val caps = scanned.agg(
      sum(when(col("is_capped"), col("cap")).otherwise(lit(0.0))).as("cc"),
      sum(when(col("is_capped"), col("w")).otherwise(lit(0.0))).as("cw"))
    val planned = scanned.crossJoin(broadcast(caps))
      .withColumn("lambda",
        when(col("cw") >= lit(1.0), lit(0.0))
          .otherwise((lit(budget.toDouble) - col("cc")) / (lit(1.0) - col("cw"))))
      .withColumn("allocated",
        when(col("is_capped"), round(col("cap"), 6))
          .otherwise(round(col("lambda") * col("w"), 6)))
      .select(col("source"), col("available"),
        round(col("w"), 9).as("weight"), col("allocated"),
        round(col("allocated") / col("available"), 6).as("rate"),
        when(col("is_capped"), lit(1)).otherwise(lit(0)).as("capped"))
    planned.unionByName(zero).orderBy("source")
  }

  /** Draw a [[mixturePlan]] (or any per-source rate table): keep each
    * doc of source s with probability rate_s via the md5-hex-threshold
    * draw — [[mixtureSampleTemperature]]'s mechanism with the rates
    * supplied by a table instead of a formula, so plan → draw composes
    * end to end. `rates` needs (source, rate) columns; rates are
    * re-rounded to 6 decimals before the threshold (a no-op on
    * mixturePlan output, a guard on hand-built tables), rate >= 1
    * keeps everything, and sources ABSENT from the table are dropped —
    * the same stance as the plan's zero-allocation rows, which arrive
    * here as rate 0 and keep nothing. The rate table broadcasts (<= S
    * rows); the keep decision is a map-side filter — no shuffle at any
    * corpus size, and the kept set is a pure function of
    * (corpus, rates, seed). */
  def rateSample(docs: DataFrame, idCol: String, sourceCol: String,
                 rates: DataFrame, seed: String): DataFrame = {
    val r6 = round(col("_rate").cast("double"), 6)
    val threshold = lower(lpad(hex(
      floor(r6 * lit(4294967296.0)).cast("long")), 8, "0"))
    docs
      .join(broadcast(rates.select(col("source").as("_rs"),
        col("rate").as("_rate"))),
        docs(sourceCol) === col("_rs"))
      .filter(r6 >= 1.0 || uniformHexKey(seed, col(idCol)) < threshold)
      .drop("_rs", "_rate")
  }

  /** Epoch-aware draw of a [[mixturePlan]] with `maxRate > 1`: a doc
    * whose source plans rate r materializes `floor(r)` full copies plus
    * one more with probability `r - floor(r)` (the md5-hex draw on the
    * fractional part) — in expectation exactly r copies per doc, the
    * standard repeat-high-quality-sources-N-epochs recipe move
    * (Wikipedia ×3). Output = the doc columns plus `epoch` (0-based
    * copy index); rate <= 1 degenerates to [[rateSample]] with a
    * constant epoch 0 column, and sources absent from `rates` emit
    * nothing. Deterministic per (corpus, rates, seed); the copy
    * expansion is a map-side `explode(sequence(...))` over the
    * broadcast-rate join — no shuffle, and the blow-up factor is the
    * plan's own maxRate bound. */
  def rateSampleEpochs(docs: DataFrame, idCol: String, sourceCol: String,
                       rates: DataFrame, seed: String): DataFrame = {
    val r6 = round(col("_rate").cast("double"), 6)
    val full = floor(r6).cast("int")
    val frac = r6 - floor(r6)
    val threshold = lower(lpad(hex(
      floor(frac * lit(4294967296.0)).cast("long")), 8, "0"))
    val copies = (full +
      when(uniformHexKey(seed, col(idCol)) < threshold, 1).otherwise(0))
      .as("_copies")
    docs
      .join(broadcast(rates.select(col("source").as("_rs"),
        col("rate").as("_rate"))),
        docs(sourceCol) === col("_rs"))
      .withColumn("_copies", copies)
      .filter(col("_copies") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_rs", "_rate", "_copies")
  }

  /** Hashed n-gram feature occurrences for DSIR: one row per unigram
    * AND word-bigram occurrence (multiset — importance weights count
    * repetitions), bucketed by md5 mod `buckets`. Token array
    * materialized behind a projection boundary (the shingleTable
    * stance — inlining the regex split into the bigram lambda would
    * re-run it per element_at). */
  private def hashedGramBuckets(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.tokens
    // id keeps its natural type: long doc ids and string source ids
    // both hash identically through uniformHexKey's string cast.
    val toksDf = docs.select(col(idCol).as("id"),
      tokens(col(textCol)).as("toks"))
    val nBi = size(col("toks")) - 1
    val bigrams = when(nBi >= 1,
      transform(sequence(lit(1), greatest(nBi, lit(1))),
        i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1)))
    ).otherwise(array().cast("array<string>"))
    toksDf
      .select(col("id"), explode(concat(col("toks"), bigrams)).as("gram"))
      .select(col("id"),
        pmod(conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bkt"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw
    * document by how much likelier its hashed n-gram features are under
    * a TARGET corpus (the domain you want more of) than under the raw
    * corpus itself —
    * `log_w(z) = Σ_buckets n_b(z) · (ln p_target(b) − ln p_raw(b))`,
    * with unigram+bigram features hashed into `buckets` slots (the
    * paper's 10k-bucket bag-of-hashed-ngrams model) and Laplace-smoothed
    * bucket probabilities `(c_b + 1) / (n + buckets)`.
    *
    * Returns (id, n_grams, log_w); documents with zero tokens carry no
    * features and are absent (they can't be scored — route them through
    * a length rule instead). log_w rounds to 6 AFTER the per-doc sum
    * (house float-parity style).
    *
    * Scale: the two bucket-count tables aggregate corpus-scale gram
    * streams onto `buckets`-bounded keys (map-side combined, exchange
    * carries ≤ buckets rows per task); the model join is a broadcast of
    * `buckets` rows; the per-doc rollup is the one doc-keyed shuffle —
    * the same (doc, feature) → model-join → rollup shape as NB scoring.
    * The raw counts derive from the per-doc rollup (exact long sums),
    * so both consumers share one corpus pass via exchange reuse — no
    * corpus-scale cache (r17). */
  def dsirLogWeights(raw: DataFrame, idCol: String, textCol: String,
                     target: DataFrame, targetTextCol: String,
                     buckets: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    // The shared raw-side frame is the per-(doc, bucket) ROLLUP, not the
    // raw occurrence stream (r17): c_r per bucket = Σ_docs n_b exactly
    // (long sums), so both consumers — the model's raw counts and the
    // per-doc score join — read the identical groupBy(id, bkt) subtree,
    // and exchange reuse shares its one corpus pass at runtime. The old
    // shape persisted the corpus-scale (id, bkt) occurrence table
    // instead: a cache build over one row PER GRAM OCCURRENCE, the same
    // geometry the r16 LM bigram-cache test measured as costing more
    // than the pass it saves (and it stayed pinned until clearCache).
    val perDoc = hashedGramBuckets(raw, idCol, textCol, buckets)
      .groupBy("id", "bkt").agg(count(lit(1)).as("n_b"))
    val tCnt = hashedGramBuckets(target, idCol, targetTextCol, buckets)
      .groupBy("bkt").agg(count(lit(1)).as("c_t"))
    val rCnt = perDoc.groupBy("bkt").agg(sum("n_b").as("c_r"))
    val tTot = tCnt.agg(sum("c_t").as("n_t"))
    val rTot = rCnt.agg(sum("c_r").as("n_r"))
    // Every raw gram's bucket is present in rCnt by construction, so a
    // left join from rCnt covers every bucket a document can hit;
    // target-absent buckets smooth to the 1/(n_t + buckets) floor.
    val model = rCnt.join(tCnt, Seq("bkt"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bkt"),
        (log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
             (col("n_t") + lit(buckets.toDouble))) -
         log((col("c_r") + lit(1.0)) /
             (col("n_r") + lit(buckets.toDouble)))).as("lambda"))
    perDoc
      .join(broadcast(model), "bkt")
      .groupBy("id")
      .agg(sum("n_b").as("n_grams"),
        round(sum(col("n_b") * col("lambda")), 6).as("log_w"))
  }

  /** DSIR selection: draw `k` documents without replacement with
    * probability ∝ exp(log_w) via the Gumbel-top-k trick — rank by
    * `log_w − ln(−ln(u))` with `u` the md5-uniform key in (0,1), take
    * the k largest. Resampling (not arg-top-k by weight, which the
    * paper shows collapses onto near-duplicate high-weight docs) keeps
    * diversity while shifting the sample toward the target domain; the
    * draw is a pure function of (corpora, seed, k). Keys round to 6
    * before ranking, ties to smallest id; the rank itself is
    * TakeOrderedAndProject — k rows per partition to the driver, no
    * full sort. */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String, k: Int,
                 seed: String, buckets: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = dsirLogWeights(raw, idCol, textCol, target, targetTextCol, buckets)
    // (v + 0.5) / 2^32 keeps u strictly inside (0,1): ln(-ln(u)) is
    // finite at both ends.
    val u = (conv(uniformHexKey(seed, col("id")), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    w.select(col("id"), col("log_w"),
        round(col("log_w") - log(-log(u)), 6).as("gumbel"))
      .orderBy(desc("gumbel"), col("id"))
      .limit(k)
  }
}
