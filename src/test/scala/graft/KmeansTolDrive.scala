package graft

import org.apache.spark.sql.SparkSession

/** Manual drive: rounds-to-stop of the watched k-means at several
  * production tolerances, per SF — the measurement behind the
  * cluster_kmeans_watched_tol gate row's tol choice (a tol that stops
  * well inside the 25-round cap at bench scale, where tol=0 provably
  * needs more than the cap). */
object KmeansTolDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      for (tol <- Seq(0.0, 1e-2, 1e-3, 1e-4)) {
        val t0 = System.nanoTime()
        val (_, rounds) = graft.operators.Cluster.fitCentroidsWatched(
          emb, "vec_id", "embedding", k = 4, maxIters = 25, tol = tol)
        println(f"KMEANS_TOL sf=$sf tol=$tol%.0e rounds=$rounds " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
