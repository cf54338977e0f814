package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Expression,
  GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a first-class plan node — the (c) tier of the
  * custom-operator ladder (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), for the one relational operator this engine needs that
  * Spark's planner has no node for.
  *
  * Semantics (identical to the Column formulation
  * [[graft.operators.AsofJoin.latestAtOrBefore]], which remains the
  * oracle-checked reference): for every left row, the single right row
  * with the same key and the largest `rightTs <= leftTs` (inclusive),
  * ties on equal timestamps broken by the largest `tieBreak`; payload
  * columns are null when no right row qualifies. Null left timestamps
  * and null-key rows follow the window formulation: null keys group
  * together, null left timestamps never match.
  *
  * Physical shape: declares `ClusteredDistribution` on each side's key
  * and per-partition ordering (key, ts[, tie]) — `EnsureRequirements`
  * inserts the co-partitioning exchanges and sorts — then a single
  * O(n) streaming merge per partition that carries the last qualifying
  * right payload. Versus the union+window formulation this shuffles
  * each side's own columns (no null-padded wide rows through the
  * exchange) and holds ONE carried payload per key instead of a window
  * frame; versus a join+filter+rank it never materializes |matches|
  * rows. Whole-stage codegen is not implemented (the merge is a
  * stateful two-iterator loop); the surrounding stages fuse as usual.
  *
  * Caveat (also why the node is built by
  * [[graft.operators.AsofJoin.latestAtOrBeforeNative]], not pattern
  * matching): the two sides must not share attribute ids — the analyzer
  * dedups self-joins only for its own Join node. The API wrapper
  * re-aliases the payload to fresh ids; passing two views of one
  * DataFrame still requires the caller to alias one side.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tieBreak: Expression,
    payload: Seq[NamedExpression],
    payloadAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  /** The payload attrs are MINTED here (fresh ids aliasing the right
    * payload), not consumed — without this, CheckAnalysis counts them
    * as missing inputs. */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] into [[AsofJoinExec]]. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, tie, payload, attrs) =>
      AsofJoinExec(lk, rk, lts, rts, tie, payload, attrs,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tieBreak: Expression,
    payload: Seq[NamedExpression],
    payloadAttrs: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadAttrs)

  /** Both sides hash-clustered on their key: EnsureRequirements makes
    * the children co-partitioned (the two exchanges of an SMJ — each
    * side ships only its own columns). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, ts) on the left; (key, ts, tie) on the right, so the LAST
    * consumed right row at any timestamp is the largest tie value. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(tieBreak, Ascending)))

  /** The merge streams left rows through unchanged. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payloadExprs = payload
    val nPayload = payloadAttrs.size
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
        val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
        val payloadProj = UnsafeProjection.create(payloadExprs, rightOut)
        val lTsBound = BindReferences.bindReference(lTsExpr, leftOut)
        val rTsBound = BindReferences.bindReference(rTsExpr, rightOut)
        val keyOrd =
          TypeUtils.getInterpretedOrdering(keyType).asInstanceOf[Ordering[Any]]
        val tsOrd =
          TypeUtils.getInterpretedOrdering(tsType).asInstanceOf[Ordering[Any]]
        // single-expression keys: compare the projected field directly
        // (null keys compare equal, matching window partitionBy)
        def keyVal(row: UnsafeRow): Any = row.get(0, keyType)
        def keyCmp(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else keyOrd.compare(a, b)

        val nullPayload = new GenericInternalRow(nPayload)
        val joined = new JoinedRow
        // the SparkPlan contract: operators emit UnsafeRows (the next
        // exchange serializes them as such)
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

        new Iterator[InternalRow] {
          private var rHead: InternalRow =
            if (rIter.hasNext) rIter.next() else null
          private var carried: UnsafeRow = null
          // the copied key ROW, not the projected value: a UTF8String
          // key value would point into the projection's reused buffer
          private var carriedKeyRow: UnsafeRow = null
          private var hasCarried = false

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lrow = lIter.next()
            val lk = keyVal(lKeyProj(lrow))
            val lt = lTsBound.eval(lrow)
            // consume right rows on earlier keys (no carry — their key
            // can never equal a later left key) and, on the same key,
            // every row at-or-before lt (each one overwrites carried:
            // sorted by (ts, tie), so the last is the match)
            var advancing = rHead != null
            while (advancing) {
              val rkRow = rKeyProj(rHead)
              val c = keyCmp(keyVal(rkRow), lk)
              if (c < 0) {
                rHead = if (rIter.hasNext) rIter.next() else null
                advancing = rHead != null
              } else if (c == 0 && lt != null) {
                val rt = rTsBound.eval(rHead)
                if (rt != null && tsOrd.lteq(rt, lt)) {
                  carried = payloadProj(rHead).copy()
                  carriedKeyRow = rkRow.copy()
                  hasCarried = true
                  rHead = if (rIter.hasNext) rIter.next() else null
                  advancing = rHead != null
                } else advancing = false
              } else advancing = false
            }
            val ok = hasCarried && lt != null &&
              keyCmp(keyVal(carriedKeyRow), lk) == 0
            resultProj(joined(lrow, if (ok) carried else nullPayload))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {
  /** Idempotent per-session registration of the planner strategy (the
    * extensions path registers it at session build instead). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    ()
  }
}
