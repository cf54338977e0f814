package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization guide §1.1/§7.2): dump
  * `.explain("formatted")` for declared queries to files so plan shape
  * (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans) can be diffed before/after a change.
  *
  * Usage: `runMain graft.PlanDump <outDir> [query1,query2,...]`
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (local cores).
  *
  * The explain itself is driver-side planning only, but CONSTRUCTING
  * some declared queries runs real jobs before explain is reached
  * (k-means fits collect centroids, the iterative loops materialize
  * per-round checkpoints, fixture rows write parquet) — so a dump pass
  * does execute work and should not share a host with a timing run.
  * Fixture-dependent rows that require a prior query's side effects
  * fall back to an error note rather than aborting the dump.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r16"
    val only = if (args.length > 1)
      Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // try/finally: a failed Files.write must still stop the session —
    // a leaked local[32] JVM would pollute any timing run that follows.
    try {
      selected.foreach { case (name, fn) =>
        val body =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          } catch {
            case scala.util.control.NonFatal(e) =>
              s"PLAN UNAVAILABLE (${e.getClass.getSimpleName}): ${e.getMessage}"
          }
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          body.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plandump] $name")
      }
    } finally spark.stop()
  }
}
