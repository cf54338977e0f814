package graft

import org.apache.spark.sql.SparkSession

/** Manual drive: dedup ingest across two successive micro-batch runs. */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sd").toString
    val provider = new graft.embedding.HashEmbedder(16)
    graft.pipeline.Index.build(
      Seq(("seed document one", "seed.md")).toDF("text", "source"),
      s"$root/idx", provider, strategy = "simple")
    def run(): Unit = {
      val schema = spark.read.parquet(s"$root/in/f1").schema
      graft.streaming.Streaming.runAvailableNow(graft.streaming.Streaming.dedupIngest(
        spark, s"$root/in/*", s"$root/idx", schema, provider, s"$root/ckpt"))
    }
    Seq(("alpha text", "a.md"), ("SEED   document ONE", "seeddup.md"))
      .toDF("text", "source").write.parquet(s"$root/in/f1")
    run()
    println("AFTER_BATCH1 " + spark.read.parquet(s"$root/idx/passages").count())
    // batch 2: re-send alpha (already ingested) + one genuinely new doc
    Seq(("alpha  TEXT", "a2.md"), ("brand new beta", "b.md"))
      .toDF("text", "source").write.parquet(s"$root/in/f2")
    run()
    val srcs = spark.read.parquet(s"$root/idx/passages")
      .select("metadata.source").as[String].collect().sorted
    println("AFTER_BATCH2 " + srcs.mkString(" "))
    spark.stop()
  }
}
