package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.embedding.HashEmbedder
import graft.pipeline.Index

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-ivf").toString + "/idx"
    val docs = (0 until 60).map(i => (s"document number $i about topic ${i % 5}", s"d$i.md"))
      .toDF("text", "source")
    Index.build(docs, d, new HashEmbedder(16), strategy = "simple")
    Index.buildIvf(spark, d, numClusters = 6)
    d
  }

  private lazy val qv = new HashEmbedder(16).embedOne("topic 3 documents")

  test("ivf layout: partitioned table + centroid table exist") {
    val ivf = spark.read.parquet(s"$dir/embeddings_ivf")
    assert(ivf.columns.contains("centroid_id"))
    assert(ivf.count() == 60)
    val cents = spark.read.parquet(s"$dir/centroids")
    assert(cents.select("centroid_id").distinct().count() <= 6)
    // physical layout: one directory per cluster
    val parts = new java.io.File(s"$dir/embeddings_ivf").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).length
    assert(parts >= 2)
  }

  test("pruned search scans only nprobe partitions (PartitionFilters)") {
    val df = Index.searchIvf(spark, dir, qv, nprobe = 2, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected partition pruning in:\n$plan")
    assert(df.count() == 5)
  }

  test("nprobe = all clusters recovers exact search") {
    val exact = spark.read.parquet(s"$dir/embeddings")
      .crossJoin(broadcast(spark.range(1).select(
        typedLit(qv.map(_.toDouble).toSeq).as("qv"))))
      .select(col("id"),
        round(graft.functions.VectorFunctions.dot(col("embedding"), col("qv")), 6).as("score"))
      .orderBy(desc("score"), col("id")).limit(5)
      .as[(String, Double)].collect().toSeq
    val ivf = Index.searchIvf(spark, dir, qv, nprobe = 6, k = 5)
      .as[(String, Double)].collect().toSeq
    assert(ivf == exact)
  }
}
