package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive: IVF partitioned layout + pruned search over testdata. */
object IvfDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfdrive").toString
    Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
      .write.parquet(s"$dir/embeddings")
    graft.pipeline.Index.buildIvf(spark, dir, numClusters = 8)
    val parts = new java.io.File(s"$dir/embeddings_ivf").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).sorted
    println("PARTS " + parts.mkString(" "))
    val q = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") === 5).select("embedding").head()
      .getSeq[Float](0).toArray
    val res = graft.pipeline.Index.searchIvf(spark, dir, q, nprobe = 2, k = 5)
    val scanLine = res.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("partition"))
      .take(2).mkString(" || ")
    println("SCAN " + scanLine.take(300))
    println("RESULT " + res.collect().map(r => s"${r.getString(0)}:${r.getDouble(1)}").mkString(" "))
  }
}
