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

  test("appendIvf assigns new vectors to existing centroids (no re-cluster)") {
    dir // force layout build
    val before = spark.read.parquet(s"$dir/embeddings_ivf").count()
    // Two new passages arrive via the ordinary update path...
    Index.update(Seq(("brand new doc about topic 3", "n1.md"),
        ("another new doc about topic 0", "n2.md")).toDF("text", "source"),
      dir, new HashEmbedder(16), strategy = "simple")
    // ...and incremental IVF maintenance folds them into the layout.
    val appended = Index.appendIvf(spark, dir)
    assert(appended == 2)
    val ivf = spark.read.parquet(s"$dir/embeddings_ivf")
    assert(ivf.count() == before + 2)
    // assignments reference existing centroids only
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("centroid_id").distinct().as[Int].collect().toSet
    val got = ivf.select("centroid_id").distinct().as[Int].collect().toSet
    assert(got.subsetOf(cents))
    // idempotent: nothing left to assign
    assert(Index.appendIvf(spark, dir) == 0)
    // the new ids are searchable through the pruned path with full probes
    val hits = Index.searchIvf(spark, dir,
      new HashEmbedder(16).embedOne("brand new doc about topic 3"),
      nprobe = 6, k = 1).as[(String, Double)].collect()
    assert(hits.head._1.startsWith("n1.md"))
  }

  test("compact rewrites many small files into few, preserving rows") {
    dir // ensure index exists (plus the update above may have run)
    val passages = new java.io.File(s"$dir/passages")
    def nParts = passages.listFiles().count(_.getName.startsWith("part-"))
    // several single-row updates -> one small file each
    (1 to 3).foreach { i =>
      Index.update(Seq((s"tiny incremental doc $i", s"t$i.md")).toDF("text", "source"),
        dir, new HashEmbedder(16), strategy = "simple")
    }
    val rowsBefore = spark.read.parquet(s"$dir/passages").count()
    val tfBefore = spark.read.parquet(s"$dir/bm25_tf").count()
    assert(nParts > 1)
    Index.compact(spark, dir)
    assert(nParts == 1) // tiny table -> a single file
    assert(spark.read.parquet(s"$dir/passages").count() == rowsBefore)
    assert(spark.read.parquet(s"$dir/bm25_tf").count() == tfBefore)
    // keep the IVF layout in sync for the exact-recovery test below
    Index.appendIvf(spark, dir)
    ()
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

  test("rebalanceIvf splits hot clusters; rows preserved, exact at full nprobe") {
    val d = Files.createTempDirectory("graft-rebal").toString + "/idx"
    val docs = (0 until 80).map(i =>
        (s"text piece $i about topic ${i % 7} and some filler words", s"r$i.md"))
      .toDF("text", "source")
    Index.build(docs, d, new HashEmbedder(16), strategy = "simple")
    // deliberately skewed layout: ~15/16 of rows in cluster 0
    val emb = spark.read.parquet(s"$d/embeddings")
    Index.writeIvfLayout(spark, emb.withColumn("centroid_id",
      when(abs(hash(col("id"))) % 16 === 0, lit(1)).otherwise(lit(0))), d)
    val before = spark.read.parquet(s"$d/embeddings_ivf")
      .groupBy("centroid_id").count().as[(Int, Long)].collect().toMap
    assert(before.values.max > 60)

    val split = Index.rebalanceIvf(spark, d, maxFraction = 0.2)
    assert(split >= 1) // cluster 0 was over the 16-row cap

    val after = spark.read.parquet(s"$d/embeddings_ivf")
    val counts = after.groupBy("centroid_id").count().as[(Int, Long)].collect().toMap
    // no row lost or duplicated; hot id retired; layout within bounds
    assert(after.count() == 80)
    assert(after.select("id").distinct().count() == 80)
    assert(!counts.contains(0) && counts.size > before.size)
    assert(counts.values.max <= 16, s"still over cap: $counts")
    // centroids table tracks the new partition set
    val cents = spark.read.parquet(s"$d/centroids")
      .select("centroid_id").distinct().as[Int].collect().toSet
    assert(cents == counts.keySet)
    // full-nprobe search over the rebalanced layout is still exact
    val q = new HashEmbedder(16).embedOne("topic 3 filler")
    val exact = emb
      .crossJoin(broadcast(spark.range(1).select(
        typedLit(q.map(_.toDouble).toSeq).as("qv"))))
      .select(col("id"),
        round(graft.functions.VectorFunctions.dot(col("embedding"), col("qv")), 6).as("score"))
      .orderBy(desc("score"), col("id")).limit(5)
      .as[(String, Double)].collect().toSeq
    val got = Index.searchIvf(spark, d, q, nprobe = counts.size, k = 5)
      .as[(String, Double)].collect().toSeq
    assert(got == exact)
    // already within bounds: a second call rewrites nothing
    assert(Index.rebalanceIvf(spark, d, maxFraction = 0.2) == 0)
  }
}
