package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * AQE's skew-join splitting handles sort-merge joins automatically;
  * these helpers cover the two shapes AQE does not: a skewed
  * *aggregation* (one giant group serializes into one task) and a
  * broadcast-side replicated join when the hot keys are known or must
  * be handled deterministically.
  */
object Skew {

  /** Two-phase (salted) aggregation: group by (key, salt) first so a hot
    * key spreads over `saltFactor` tasks, then reduce the partials.
    * `partial` must be an associative partial aggregate and `merge` its
    * combiner (e.g. count/sum -> sum). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltFactor: Int,
                partial: Column, merge: Column => Column,
                outName: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.as("__partial"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(merge(col("__partial")).as(outName))
  }

  /** Salted join against a small-but-not-broadcastable skewed side:
    * replicate each right row `saltFactor` times, salt the left side
    * randomly-but-deterministically, join on (key, salt). Spreads a hot
    * join key over `saltFactor` shuffle partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val salts = left.sparkSession.range(saltFactor)
      .select(col("id").cast("int").as("__salt"))
    val replicatedRight = right.crossJoin(salts)
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
