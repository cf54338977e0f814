package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import graft.functions.VectorFunctions.{asDouble, dot}

    val emb = Tables.embeddings(spark, sfDir)
    emb.count()

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val a = emb.select(col("vec_id").cast("long").as("id"),
        asDouble(col("embedding")).as("va"))
      .where(col("id").isNotNull && col("va").isNotNull &&
        dot(col("va"), col("va")) > 0)
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val b = emb.select(col("vec_id").cast("long").as("nb"),
        asDouble(col("embedding")).as("vb"))
      .where(col("nb").isNotNull && col("vb").isNotNull &&
        dot(col("vb"), col("vb")) > 0)
      .withColumn("nb_n", sqrt(dot(col("vb"), col("vb"))))
    val scored = a.repartition(col("id")).crossJoin(b.repartition(col("nb")))
      .filter(col("id") =!= col("nb"))
      .select(col("id"), col("nb"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb_n")), 6)
          .as("score"))

    for (i <- 1 to 3) {
      time(s"scored noop #$i") {
        scored.write.format("noop").mode("overwrite").save()
      }
      time(s"knnGraph full #$i") {
        graft.operators.Graph.knnGraph(emb, "vec_id", "embedding", 3)
          .write.format("noop").mode("overwrite").save()
      }
      val noround = a.repartition(col("id")).crossJoin(b.repartition(col("nb")))
        .filter(col("id") =!= col("nb"))
        .select(col("id"), col("nb"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb_n"))).as("score"))
      time(s"scored NO-round noop #$i") {
        noround.write.format("noop").mode("overwrite").save()
      }
      val justjoin = a.repartition(col("id")).crossJoin(b.repartition(col("nb")))
        .filter(col("id") =!= col("nb"))
        .select(col("id"), col("nb"))
      time(s"join only noop #$i") {
        justjoin.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
