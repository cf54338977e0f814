package graft

import org.apache.spark.sql.SparkSession

/** Drive harness: the SQL surface through the extensions config path. */
object SqlDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    val top = spark.sql(
      """SELECT e.vec_id, round(dot_product(e.embedding, q.embedding), 6) AS score
        |FROM embeddings e JOIN embeddings q ON q.vec_id = 0
        |ORDER BY score DESC, e.vec_id LIMIT 3""".stripMargin).collect()
    println("SQL_TOP " + top.map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(" "))
    spark.stop()
  }
}
