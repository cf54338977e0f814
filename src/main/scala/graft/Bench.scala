package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A short untimed warm-up (trivial scans) absorbs first-action JVM/
  * codegen costs so per-query numbers reflect plan execution, matching
  * how a long-lived session would behave.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up (untimed): touch the inputs, trigger codegen/JIT once.
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sfDir, t).count()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.eventsWithTs(spark, sfDir).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Intra-query persist() calls (tf, shingle tables) are scoped to
      // one query; drop them so later queries aren't taxed by cache
      // eviction/GC of their predecessors' blocks.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            // Keep the one-line-JSON stdout contract; failures go loud on
            // stderr rather than silently shrinking the total.
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // A failed query reports -1, never its elapsed time: a fast failure
      // must not read as a speedup to the BASELINE regression gate.
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, _, false) => k }
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // A run with failures must never read as a speedup to a gate that
    // compares the total alone: report a sentinel total instead of the
    // (smaller) sum over the surviving queries.
    val total =
      if (failedNames.isEmpty) results.collect { case (_, v, true) => v }.sum
      else 99999.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
