package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing breakdown for repetitionFlags' sub-plans (not a test). */
object RepetitionDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("DRIVE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    import graft.operators.CorpusClean
    time("full")(CorpusClean.repetitionFlags(docs, "doc_id", "text").count())
    // sub-plans of the original (pre-union) formulation, for comparison
    val toksDf = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    time("tokens")(toksDf.count())
    val cnt2 = size(col("toks")) - 1
    val g2 = toksDf.select(col("doc_id"), explode(when(cnt2 >= 1,
      transform(sequence(lit(1), greatest(cnt2, lit(1))),
        i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
      .otherwise(array().cast("array<string>"))).as("g"))
    time("g2 occurrences")(g2.count())
    val g2c = g2.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    time("g2c groupBy")(g2c.count())
    val top2 = g2c.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(desc("c"), col("g")))).filter(col("rn") === 1)
    time("top2 window")(top2.count())
    val cnt5 = size(col("toks")) - 4
    val g5 = toksDf.select(col("doc_id"), explode(when(cnt5 >= 1,
      transform(sequence(lit(1), greatest(cnt5, lit(1))),
        i => concat_ws(" ", (0 until 5).map(o => element_at(col("toks"), i + o)): _*)))
      .otherwise(array().cast("array<string>"))).as("g"))
    time("g5 occurrences")(g5.count())
    time("g5c+d5")(g5.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L)))
      .count())
    val lineOcc = docs.select(col("doc_id"),
      explode(filter(transform(split(col("text"), "\n"), l => trim(l)),
        l => length(l) > 0)).as("line"))
    time("lines")(lineOcc.groupBy("doc_id", "line").agg(count(lit(1))).count())
    spark.stop()
  }
}
