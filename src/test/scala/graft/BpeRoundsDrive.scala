package graft
object BpeRoundsDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val freqs = graft.operators.Bpe.wordFreqs(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text")
    for (n <- Seq(20, 60)) {
      val (m, r) = graft.operators.Bpe.trainMergesWithRounds(freqs, n)
      val (mSeq, rSeq) = graft.operators.Bpe.trainMergesWithRounds(freqs, n, batchCap = 1)
      val (mFast, rFast) = graft.operators.Bpe.trainMergesWithRounds(freqs, n, relaxed = true)
      println(s"numMerges=$n exact: rounds=$r (seq=$rSeq, equal=${m == mSeq})  relaxed: merges=${mFast.length} rounds=$rFast")
    }
    spark.stop()
  }
}
