package graft

import org.apache.spark.sql.SparkSession

/** Manual drive: near-dup clustering over the real documents table. */
object CcDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val clusters = graft.operators.Dedup.dupClusters(docs, "doc_id", "text", 3, 0.5)
    val rows = clusters.collect()
    val byComp = rows.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).sorted).toMap
    println("N_CLUSTERED_DOCS " + rows.length)
    println("N_CLUSTERS " + byComp.size)
    println("SIZES " + byComp.values.map(_.size).toSeq.sorted.reverse.mkString(","))
    println("SAMPLE " + byComp.toSeq.sortBy(_._1).take(3)
      .map { case (c, ids) => s"$c->[${ids.mkString(" ")}]" }.mkString(" "))
    println("KEEPERS " + rows.count(_.getBoolean(2)))
    spark.stop()
  }
}
