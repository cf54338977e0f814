package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Knn}

/** Measures the block-scoped LSH kNN graph (the documented path past
  * the auto bit-width's 16-bit recall cap): ivfAssign pre-clusters the
  * corpus, knnGraphLsh(blockCol = centroid_id) builds within-block
  * neighborhoods. Reports wall time of unblocked-auto vs blocked and
  * the blocked tier's edge recall against the unblocked graph — the
  * same probe/recall trade every blocked tier in this repo makes
  * (cluster-local neighbors only). Run via Test/runMain at
  * SPARK_GRAFT_SF_DIR; numbers recorded in BASELINE.md. */
object GraphBlockDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val clusters = sys.env.get("SPARK_GRAFT_GRAPH_CLUSTERS")
      .map(_.toInt).getOrElse(16)
    val assigned = Knn.ivfAssign(emb, "embedding",
      numClusters = clusters, seed = 42L).persist()
    assigned.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      df.select(col("id"), col("nb")).as[(Long, Long)].collect().toSet
    }

    // SPARK_GRAFT_GRAPH_ARMS picks arms individually (default: all) so
    // a 100x session can run one ~3-minute arm per invocation; edge
    // sets save to /tmp so recall cross-computes across invocations.
    val arms = sys.env.get("SPARK_GRAFT_GRAPH_ARMS")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("auto", "blocked", "globalkey"))
    def save(name: String, s: Set[(Long, Long)]): Unit = {
      import spark.implicits._
      s.toSeq.toDF("id", "nb").coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/graphblock_$name")
    }
    def loadArm(name: String): Option[Set[(Long, Long)]] = {
      import spark.implicits._
      if (!new java.io.File(s"/tmp/graphblock_$name").exists()) None
      else Some(spark.read.parquet(s"/tmp/graphblock_$name")
        .as[(Long, Long)].collect().toSet)
    }

    if (arms("auto")) {
      val (auto, tAuto) = time(edges(Graph.knnGraphLsh(
        assigned, "vec_id", "embedding", k = 3, dims = 64, tables = 8)))
      save("auto", auto)
      println(f"GRAPHBLOCK_AUTO clusters=$clusters wall=${tAuto}%.2fs " +
        f"edges=${auto.size}")
    }
    if (arms("blocked")) {
      val (blocked, tBlocked) = time(edges(Graph.knnGraphLsh(
        assigned, "vec_id", "embedding", k = 3, dims = 64, tables = 8,
        blockCol = Some("centroid_id"))))
      save("blocked", blocked)
      val recall = loadArm("auto").map(a =>
        (a intersect blocked).size.toDouble / a.size)
      println(f"GRAPHBLOCK clusters=$clusters blocked=${tBlocked}%.2fs " +
        f"edges_blocked=${blocked.size} recall_vs_auto=${recall.fold("n/a")(r => f"$r%.3f")}")
    }

    // The cost-over-recall point the pre-r15 default sat at: bits
    // sized from the GLOBAL corpus count, so each (block, signature)
    // cell runs ~64/B occupancy — cheaper but blinder (measured
    // recall-vs-exact 0.312 against the per-block default's 0.450 at
    // r14). Since r15 the blocked DEFAULT is the per-block recipe
    // (bits = autoLshBits(maxBlock)) + the r16 occupancy escape valve;
    // this arm keeps the global-key trade measurable.
    if (arms("globalkey")) {
      val globalCount = assigned.count()
      val narrowBits = Graph.autoLshBits(globalCount)
      val (wide, tWide) = time(edges(Graph.knnGraphLsh(
        assigned, "vec_id", "embedding", k = 3, dims = 64, bits = narrowBits,
        tables = 8, blockCol = Some("centroid_id"))))
      save("globalkey", wide)
      val recallWide = loadArm("auto").map(a =>
        (a intersect wide).size.toDouble / a.size)
      println(f"GRAPHBLOCK_GLOBALKEY n=$globalCount bits=$narrowBits " +
        f"wall=${tWide}%.2fs edges=${wide.size} recall_vs_auto=${recallWide.fold("n/a")(r => f"$r%.3f")}")
    }

    // Ground truth: the exact n^2 graph (feasible at drive scales) —
    // recall vs the LSH auto graph conflates two approximations, so
    // the record keeps each tier's recall against the TRUE kNN edges.
    if (arms.contains("exact") ||
        (arms.size == 3 && sys.env.get("SPARK_GRAFT_GRAPH_EXACT").forall(_ != "0"))) {
      val (ex, tEx) = time(edges(Graph.knnGraph(
        emb, "vec_id", "embedding", k = 3)))
      def r(s0: Option[Set[(Long, Long)]]) =
        s0.fold("n/a")(s => f"${(ex intersect s).size.toDouble / ex.size}%.3f")
      println(f"GRAPHBLOCK_EXACT wall=${tEx}%.2fs edges=${ex.size} " +
        f"recall auto=${r(loadArm("auto"))} blocked=${r(loadArm("blocked"))} " +
        f"globalkey=${r(loadArm("globalkey"))}")
    }
    spark.stop()
  }
}
