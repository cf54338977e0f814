package graft

/** Vocab-scale BPE training probe (Test/runMain): how far toward a
  * real 32k-merge vocabulary the corpus + trainer go, and at what
  * merges/sec. Knobs via env: SPARK_GRAFT_SF_DIR (default sf0.01),
  * SPARK_GRAFT_BPE_MERGES (default 32768), SPARK_GRAFT_BPE_CAP
  * (default 512, the relaxed tier's batch width). Reports merges
  * learned (the corpus caps this: minFreq=2 exhausts when every
  * remaining adjacent pair is unique), rounds, wall seconds, and
  * merges/sec — the numbers BASELINE.md's BPE paragraph records. */
object BpeVocabDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val target = sys.env.get("SPARK_GRAFT_BPE_MERGES").map(_.toInt).getOrElse(32768)
    val cap = sys.env.get("SPARK_GRAFT_BPE_CAP").map(_.toInt).getOrElse(512)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The synthetic documents tables use a ~30-word vocabulary, which
    // exhausts classic BPE after ~90 merges (every remaining adjacent
    // pair unique) — useless for a 32k-merge measurement. With
    // SPARK_GRAFT_BPE_SYNTH=N the drive instead trains on N distinct
    // md5-derived pseudo-words (hex alphabet, lengths 8-23, Zipfian
    // freqs): enough pair diversity to sustain vocab-scale merging, so
    // the measurement isolates the TRAINER's round machinery.
    val freqs = (sys.env.get("SPARK_GRAFT_BPE_SYNTH") match {
      case Some(n) =>
        spark.range(n.toLong).selectExpr(
          "substr(md5(cast(id as string)) || md5(cast(id+1000000 as string)), 1, " +
            "8 + cast(id % 16 as int)) as word",
          "greatest(cast(100000 / (id + 1) as long), 2L) as freq")
      case None =>
        graft.operators.Bpe.wordFreqs(Tables.documents(spark, sfDir), "text")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = freqs.count()
    // SPARK_GRAFT_BPE_RELAXED=0 measures the EXACT sequential-equivalent
    // mode (cap+1 window, boundary-tie trim) at the same scale — the
    // oracle-gated tier's bound, vs the relaxed tier's throughput.
    val relaxed = sys.env.get("SPARK_GRAFT_BPE_RELAXED").forall(_ != "0")
    val t0 = System.nanoTime()
    val (m, r) = graft.operators.Bpe.trainMergesWithRounds(
      freqs, target, batchCap = cap, relaxed = relaxed)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-vocab] sf=$sfDir words=$nWords target=$target cap=$cap " +
      f"relaxed=$relaxed learned=${m.length} rounds=$r wall=${secs}%.1f s " +
      f"merges_per_sec=${m.length / secs}%.1f rounds_per_sec=${r / secs}%.2f")
    // SPARK_GRAFT_BPE_DIVERGE=1: train the OTHER mode too and report
    // how far relaxed drifts from the exact sequence — positional
    // agreement (same merge at same rank) and set overlap (same merges
    // in any order) — the numbers a user trades for the relaxed tier's
    // 6x round throughput.
    if (sys.env.get("SPARK_GRAFT_BPE_DIVERGE").contains("1")) {
      val (m2, r2) = graft.operators.Bpe.trainMergesWithRounds(
        freqs, target, batchCap = cap, relaxed = !relaxed)
      val (ex, rx) = if (relaxed) (m2, m) else (m, m2)
      val k = math.min(ex.length, rx.length)
      val pos = (0 until k).count(i => ex(i) == rx(i))
      val inter = ex.toSet.intersect(rx.toSet).size
      println(f"[bpe-vocab] diverge exact=${ex.length} relaxed=${rx.length} " +
        f"rounds_other=$r2 positional_agree=${pos.toDouble / k}%.4f " +
        f"set_overlap=${inter.toDouble / math.max(ex.length, rx.length)}%.4f")
      // The metric a USER trades: encoding fertility (mean tokens per
      // word occurrence) under each learned vocab over the same
      // frequency table. Merge-sequence overlap can be low while both
      // vocabs compress equally — greedy BPE has many near-equivalent
      // merge orders on conflict-dense corpora.
      def fertility(merges: Seq[(String, String)]): Double = {
        // distributed: segment is O(|merges| x len) per word, so the
        // 200k-word vocab table maps in tasks (merge list rides the
        // closure, KBs), not on the driver
        import spark.implicits._
        val ms = merges.toIndexedSeq
        val (toks, words) = freqs.selectExpr("word", "freq")
          .as[(String, Long)]
          .map { case (w, f) =>
            (graft.operators.Bpe.segment(w, ms).length.toLong * f, f) }
          .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        toks.toDouble / words
      }
      println(f"[bpe-vocab] fertility exact=${fertility(ex)}%.4f " +
        f"relaxed=${fertility(rx)}%.4f (tokens/word, same freq table)")
    }
    freqs.unpersist()
    spark.stop()
  }
}
