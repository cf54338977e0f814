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
  * Plans are captured WITHOUT executing the query (explain is
  * driver-side planning only), so this is safe to run alongside other
  * work; fixture-dependent rows that require a prior query's side
  * effects fall back to an error note rather than aborting the dump.
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
    spark.stop()
  }
}
