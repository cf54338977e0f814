package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiling main (r16 measurement; not part of the engine). */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = EntryFixtures.relEdges(spark, sfDir)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val eout = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    println(s"nodes=$n edges=${e.count()}")

    var rank = nodes.select(col("id"),
      (lit(1.0) / lit(n)).as("rank"),
      lit(null).cast("double").as("p1"), lit(null).cast("double").as("p2"))
    def round1(r: org.apache.spark.sql.DataFrame) = {
      val contrib = eout
        .join(r.select(col("id").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      r.select(col("id"), col("rank").as("pr1"), col("p1").as("pr2"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(0.3) + lit(0.5) * coalesce(col("contrib"), lit(0.0))).as("rank"),
          col("pr1").as("p1"), col("pr2").as("p2"))
    }
    // run 3 rounds, timing each, then print the executed plan of a round
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      rank = org.apache.spark.sql.GraftColumnBridge.dropInheritedStats(
        round1(rank).localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER))
      println(f"round $i: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val r7 = round1(rank)
    println(r7.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
