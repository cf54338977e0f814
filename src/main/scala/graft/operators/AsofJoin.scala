package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row
  * with the same key and `rightTs <= leftTs` (inclusive), ties broken
  * by the largest `tieBreak`. The operator Spark's built-ins lack
  * (SURVEY §7.2's "custom operator" case), composed rather than
  * custom-planned:
  *
  * Both sides are tagged and UNIONED, then one window per key — ordered
  * by (ts, side, tie) with right rows sorting before left rows at equal
  * ts — carries the last non-null right payload forward
  * (`last_value(ignoreNulls)` over unbounded-preceding..current). Each
  * left row reads the payload of the latest right row at or before it.
  *
  * Scale shape: ONE shuffle, partitioned by join key — no pair-wise
  * join blowup (a naive join+filter+rank materializes |matches| rows;
  * this materializes |left| + |right|). Within a hot key the window
  * sort is the bound — for extreme per-key skew, range-partition the
  * timeline per key and carry boundary rows, same pattern as
  * sessionization at scale.
  */
object AsofJoin {

  /** Left columns + `payload` columns of the as-of matched right row
    * (nulls when no right row precedes). `tieBreak` must be a numeric
    * right column; larger wins at equal timestamps. */
  def latestAtOrBefore(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       payload: Seq[String],
                       tieBreak: String): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payStruct = struct(payload.map(col).toIndexedSeq: _*)
    val lSchema = left.select(leftStruct).schema.head.dataType
    val pSchema = right.select(payStruct).schema.head.dataType

    // keys pass through untyped (string/long/... — a silent numeric cast
    // would null out non-numeric keys and collapse them into one
    // partition); a NULL right timestamp can never be "at or before"
    // anything, matching SQL comparison semantics, so it is dropped.
    val lTag = left.select(
      col(leftKey).as("__k"),
      col(leftTs).as("__t"),
      lit(1).as("__is_left"),
      lit(0L).as("__tie"),
      leftStruct.as("__l"),
      lit(null).cast(pSchema).as("__p"))
    val rTag = right.filter(col(rightTs).isNotNull).select(
      col(rightKey).as("__k"),
      col(rightTs).as("__t"),
      lit(0).as("__is_left"),
      col(tieBreak).cast("long").as("__tie"),
      lit(null).cast(lSchema).as("__l"),
      payStruct.as("__p"))

    // right-before-left at equal ts makes the join inclusive; among
    // right rows at equal ts the largest tie value is carried last.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_left"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTag.union(rTag)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val payCols = payload.map(c => col(s"__match.$c").as(c))
    matched.select((leftCols ++ payCols).toIndexedSeq: _*)
  }

  /** The same as-of semantics through the custom plan node
    * ([[graft.plans.AsofJoinNode]] → `AsofJoinStrategy` →
    * `AsofJoinExec`): each side shuffles only its own columns and the
    * per-partition merge carries one payload row per key instead of a
    * window frame over null-padded union rows. Registered on the
    * session on first use; sides must not share attribute lineage
    * (alias one side of a self-join). Null right timestamps are
    * filtered here, like the window formulation. */
  def latestAtOrBeforeNative(left: DataFrame, right: DataFrame,
                             leftKey: String, rightKey: String,
                             leftTs: String, rightTs: String,
                             payload: Seq[String],
                             tieBreak: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    graft.plans.AsofJoinPlan.install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.filter(col(rightTs).isNotNull).queryExecution.analyzed
    def attrOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
               name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in ${plan.output.map(_.name).mkString(", ")}"))
    require(attrOf(lPlan, leftTs).dataType == attrOf(rPlan, rightTs).dataType,
      s"asof timestamp types differ: ${attrOf(lPlan, leftTs).dataType} vs " +
      s"${attrOf(rPlan, rightTs).dataType}")
    val payloadExprs = payload.map(attrOf(rPlan, _))
    val payloadAttrs = payloadExprs.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    GraftColumnBridge.ofRows(spark, graft.plans.AsofJoinNode(
      lPlan, rPlan,
      attrOf(lPlan, leftKey), attrOf(rPlan, rightKey),
      attrOf(lPlan, leftTs), attrOf(rPlan, rightTs),
      attrOf(rPlan, tieBreak), payloadExprs, payloadAttrs))
  }
}
