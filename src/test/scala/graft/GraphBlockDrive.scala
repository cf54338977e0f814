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

    val (auto, tAuto) = time(edges(Graph.knnGraphLsh(
      assigned, "vec_id", "embedding", k = 3, dims = 64, tables = 8)))
    val (blocked, tBlocked) = time(edges(Graph.knnGraphLsh(
      assigned, "vec_id", "embedding", k = 3, dims = 64, tables = 8,
      blockCol = Some("centroid_id"))))
    val recall = (auto intersect blocked).size.toDouble / auto.size
    println(f"GRAPHBLOCK clusters=$clusters auto=${tAuto}%.2fs " +
      f"blocked=${tBlocked}%.2fs edges_auto=${auto.size} " +
      f"edges_blocked=${blocked.size} recall_vs_auto=${recall}%.3f")

    // The cost-over-recall point the pre-r15 default sat at: bits
    // sized from the GLOBAL corpus count, so each (block, signature)
    // cell runs ~64/B occupancy — cheaper but blinder (measured
    // recall-vs-exact 0.312 against the per-block default's 0.450 at
    // r14). Since r15 the blocked DEFAULT is the per-block recipe
    // (bits = autoLshBits(maxBlock), the `blocked` arm above); this
    // arm keeps the global-key trade measurable.
    val globalCount = assigned.count()
    val narrowBits = Graph.autoLshBits(globalCount)
    val (wide, tWide) = time(edges(Graph.knnGraphLsh(
      assigned, "vec_id", "embedding", k = 3, dims = 64, bits = narrowBits,
      tables = 8, blockCol = Some("centroid_id"))))
    val recallWide = (auto intersect wide).size.toDouble / auto.size
    println(f"GRAPHBLOCK_GLOBALKEY n=$globalCount bits=$narrowBits " +
      f"wall=${tWide}%.2fs edges=${wide.size} recall_vs_auto=${recallWide}%.3f")

    // Ground truth: the exact n^2 graph (feasible at drive scales) —
    // recall vs the LSH auto graph conflates two approximations, so
    // the record keeps each tier's recall against the TRUE kNN edges.
    if (sys.env.get("SPARK_GRAFT_GRAPH_EXACT").forall(_ != "0")) {
      val (ex, tEx) = time(edges(Graph.knnGraph(
        emb, "vec_id", "embedding", k = 3)))
      def r(s0: Set[(Long, Long)]) = (ex intersect s0).size.toDouble / ex.size
      println(f"GRAPHBLOCK_EXACT wall=${tEx}%.2fs edges=${ex.size} " +
        f"recall auto=${r(auto)}%.3f blocked=${r(blocked)}%.3f " +
        f"globalkey=${r(wide)}%.3f")
    }
    spark.stop()
  }
}
