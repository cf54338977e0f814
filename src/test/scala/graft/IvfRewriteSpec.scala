package graft

import java.nio.file.Files

import graft.embedding.HashEmbedder
import graft.pipeline.Index

/** The [[graft.plans.IvfTopKRewrite]] optimizer rule: a declarative
  * `ORDER BY dot_product(embedding, qv) DESC LIMIT k` over the IVF
  * layout is rewritten into the centroid-pruned scan. */
class IvfRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-ivf-rw").toString + "/idx"
    val docs = (0 until 60).map(i => (s"document number $i about topic ${i % 5}", s"d$i.md"))
      .toDF("text", "source")
    Index.build(docs, d, new HashEmbedder(16), strategy = "simple")
    Index.buildIvf(spark, d, numClusters = 6)
    GraftExtensions.install(spark)
    d
  }

  private lazy val qv = new HashEmbedder(16).embedOne("topic 3 documents")

  test("declarative top-k over the IVF layout is rewritten to a pruned scan") {
    spark.conf.set("spark.graft.ivf.nprobe", "2")
    try {
      val df = Index.searchIvfDeclarative(spark, dir, qv, k = 5)
      // The injected probe filter is a real Filter node in the optimized
      // plan (not just the partition column appearing in the scan output).
      import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
      val probeFilters = df.queryExecution.optimizedPlan.collect {
        case f: LFilter if f.condition.references.exists(_.name == "centroid_id") => f
      }
      assert(probeFilters.nonEmpty,
        s"expected injected centroid filter in optimized plan:\n${df.queryExecution.optimizedPlan}")
      // ...and it lands as a non-empty PartitionFilters on the scan.
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [centroid_id"),
        s"expected partition pruning in physical plan:\n$physical")
      // Same results as the manually-constructed pruned plan.
      val manual = Index.searchIvf(spark, dir, qv, nprobe = 2, k = 5)
        .as[(String, Double)].collect().toSeq
      assert(df.as[(String, Double)].collect().toSeq == manual)
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }

  test("filtered declarative ANN: probe filter composes with the user predicate") {
    import org.apache.spark.sql.functions.{col, length}
    spark.conf.set("spark.graft.ivf.nprobe", "2")
    try {
      val df = Index.searchIvfDeclarative(spark, dir, qv, k = 5,
        filter = Some(length(col("id")) > 4))
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [centroid_id"),
        s"probe pruning missing:\n$physical")
      assert(physical.contains("PushedFilters:") && physical.contains("length"),
        s"user predicate not pushed toward the scan:\n$physical")
      // equivalent to filtering the manual pruned search's candidate set
      val manual = Index.searchIvf(spark, dir, qv, nprobe = 2, k = 1000)
        .filter(length(col("id")) > 4).limit(5)
        .as[(String, Double)].collect().toSeq
      assert(df.as[(String, Double)].collect().toSeq == manual)
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }

  test("nprobe covering all clusters recovers the exact top-k") {
    spark.conf.set("spark.graft.ivf.nprobe", "6")
    try {
      val rewritten = Index.searchIvfDeclarative(spark, dir, qv, k = 5)
        .as[(String, Double)].collect().toSeq
      val exact = Index.searchIvf(spark, dir, qv, nprobe = 6, k = 5)
        .as[(String, Double)].collect().toSeq
      assert(rewritten == exact)
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }

  test("plans over non-IVF tables are left untouched") {
    // Same query shape against the flat embeddings table (no centroid_id
    // partitioning, no sibling centroids dir): no filter is injected and
    // the exact answer comes back.
    val flat = Files.createTempDirectory("graft-flat").toString + "/embeddings_ivf"
    spark.read.parquet(s"$dir/embeddings").write.parquet(flat)
    val df = Index.searchIvfDeclarative(spark,
      new java.io.File(flat).getParent, qv, k = 5)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    assert(df.queryExecution.optimizedPlan.collect { case f: LFilter => f }.isEmpty,
      "no centroid filter should be injected for a non-IVF table")
    val exact = Index.searchIvf(spark, dir, qv, nprobe = 6, k = 5)
      .as[(String, Double)].collect().toSeq
    assert(df.as[(String, Double)].collect().toSeq == exact)
  }
}
