package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Measures the hard-negative production tier at bench scale (sf0.1):
  * centroid-blocked mining vs the exact cross-pair tier — wall time of
  * each and recall of the blocked tier's (anchor, negative) pairs
  * against the exact set. Run via Test/runMain; numbers recorded in
  * BASELINE.md. */
object HardNegDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val assigned = Knn.ivfAssign(emb, "embedding", numClusters = 16, seed = 42L)
      .persist()
    assigned.count()
    val anchors = assigned.filter(col("vec_id") % 20 === 0)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      df.select(col("id"), col("neg_id")).as[(Long, Long)].collect().toSet
    }

    val (exact, tExact) = time(pairs(Knn.hardNegatives(
      anchors, assigned, "vec_id", "embedding", "label", k = 5)))
    val (blocked, tBlocked) = time(pairs(Knn.hardNegatives(
      anchors, assigned, "vec_id", "embedding", "label", k = 5,
      blockCol = Some("centroid_id"))))
    val recall = (exact intersect blocked).size.toDouble / exact.size
    println(f"HARDNEG exact=${tExact}%.2fs blocked=${tBlocked}%.2fs " +
      f"pairs=${exact.size} recall=${recall}%.3f")
    spark.stop()
  }
}
