package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Measures the pipeline-ORDER answer to near-dup-flooded corpora
  * (Test/runMain at SPARK_GRAFT_SF_DIR): on a corpus where every
  * vector has ~dup-factor genuine high-cosine neighbors, the pair
  * tiers' cost is their true output mass — so the funnel runs
  * embedding dedup FIRST (semanticDedup's per-cluster keep/drop is
  * linear-output) and graph analytics over the survivors. Reports
  * wall of dedup + survivor graph vs the flooded graph, and the
  * survivor count. Numbers recorded in BASELINE.md. */
object DedupFirstDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val tau = sys.env.get("SPARK_GRAFT_DEDUP_TAU").map(_.toDouble)
      .getOrElse(0.9)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val n = emb.count()
    // stage 1: SemDeDup proper — kmeans pre-clustering (near-copies
    // land in the same cluster) then per-cluster cosine keep/drop.
    // Linear OUTPUT (one decision per row); pair mass is bounded by
    // cluster sizes, which the cluster count controls.
    val clusters = sys.env.get("SPARK_GRAFT_DEDUP_CLUSTERS")
      .map(_.toInt).getOrElse(256)
    val (kept, tDedup) = time {
      val assigned = graft.operators.Knn.ivfAssign(emb, "embedding",
        numClusters = clusters, seed = 42L)
      val decided = Dedup.semanticDedup(assigned, "vec_id", "embedding",
        "centroid_id", tau = tau)
      val k = decided.filter(!col("is_dup"))
        .select(col("id").as("vec_id")).persist()
      k.count()
      k
    }
    val survivors = kept.count()
    val slim = emb.join(kept, "vec_id")
    // stage 2: the kNN graph over survivors only
    val (_, tGraph) = time {
      Graph.knnGraphLsh(slim, "vec_id", "embedding", k = 3,
        dims = 64, tables = 8).count()
    }
    println(f"DEDUPFIRST n=$n tau=$tau survivors=$survivors " +
      f"dedup=${tDedup}%.1fs graph_on_survivors=${tGraph}%.1fs " +
      f"total=${tDedup + tGraph}%.1fs")
    spark.stop()
  }
}
