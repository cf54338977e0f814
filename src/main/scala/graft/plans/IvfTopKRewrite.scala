package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Descending, Expression, In, IntegerLiteral, Literal, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, desc, element_at, round, sum, typedLit}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.expressions.DotProduct

/** Optimizer rule: turns a *declarative* nearest-neighbor query
  *
  *   SELECT id, round(dot_product(embedding, <literal query vector>), 6) AS score
  *   FROM   <table partitioned by centroid_id>        -- Index.buildIvf layout
  *   ORDER BY score DESC, id LIMIT k
  *
  * into the centroid-pruned IVF scan that `Index.searchIvf` builds by
  * hand: rank the stored centroids against the query vector, keep the
  * best `spark.graft.ivf.nprobe` (default 4), and inject
  * `centroid_id IN (<winners>)` under the projection. Because
  * `centroid_id` is the table's partition column, the Parquet source
  * prunes to nprobe partitions — the scan touches nprobe/K of the data,
  * which is what makes top-k sub-linear at 100 TB.
  *
  * Eligibility is the on-disk contract of [[graft.pipeline.Index.buildIvf]]:
  * the scanned relation is partitioned by `centroid_id` and has a sibling
  * `centroids` table (avg vector per cluster, position-wise rows
  * `centroid_id, pos, cv`). Plans over other tables are left untouched.
  *
  * The centroid ranking runs as a (tiny: K x dims rows) re-entrant Spark
  * job at optimization time — the same "one legitimate driver-side
  * scalar" as the manual path; a ThreadLocal guards recursion. This is
  * approximate search: results match exact top-k only as well as the
  * probed clusters cover the true neighbors (see RecallSpec).
  *
  * Register via [[graft.GraftExtensions]] (`spark.sql.extensions`) or
  * `GraftExtensions.install(spark)`.
  */
case class IvfTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import IvfTopKRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (inRewrite.get()) plan
    else plan.transformDown {
      // Bare shape: Project over the relation. Filtered shape: a user
      // predicate (filtered ANN) sits between — the injected centroid
      // filter composes with it, giving PartitionFilters + the pushed
      // user predicate in one scan.
      case gl @ GlobalLimit(IntegerLiteral(k),
            LocalLimit(IntegerLiteral(_),
              Sort(orders, true, ProjectOverIvf(projList, userFilter, lr), sortHint)))
          if orders.nonEmpty && ivfRelation(lr).isDefined &&
            // idempotency: an already-rewritten plan carries the probe
            // filter on centroid_id — never inject twice
            userFilter.forall(!_.references.exists(_.name == "centroid_id")) =>
        val rewritten = for {
          // NB: match on orders.head, not a `::` pattern — Sort.order is
          // typically an ArraySeq, which the List extractor won't match.
          scoreAttr <- orders.head match {
            case SortOrder(a: AttributeReference, Descending, _, _) => Some(a)
            case _ => None
          }
          alias <- projList.collectFirst {
            case a: Alias if a.exprId == scoreAttr.exprId => a }
          qv <- queryVectorOf(alias.child)
          fsRel <- ivfRelation(lr)
          centroidAttr <- lr.output.find(_.name == "centroid_id")
        } yield {
          val centroidsPath =
            new Path(fsRel.location.rootPaths.head.getParent, "centroids").toString
          val probes = probedClusters(centroidsPath, qv, nprobe)
          val probeCond =
            In(centroidAttr, probes.map(Literal.create(_, centroidAttr.dataType)))
          val filter = Filter(
            userFilter.map(And(probeCond, _)).getOrElse(probeCond), lr)
          logInfo(s"IvfTopKRewrite: pruned top-$k scan to clusters " +
            probes.mkString("[", ",", "]") + s" of $centroidsPath")
          GlobalLimit(Literal(k), LocalLimit(Literal(k),
            Sort(orders, global = true, Project(projList, filter), sortHint)))
        }
        rewritten.getOrElse(gl)
    }

  /** Matches `Project(list, relation)` or
    * `Project(list, Filter(cond, relation))`, yielding the optional
    * user predicate. */
  private object ProjectOverIvf {
    def unapply(p: LogicalPlan)
        : Option[(Seq[NamedExpression], Option[Expression], LogicalRelation)] = p match {
      case Project(list, lr: LogicalRelation) => Some((list, None, lr))
      case Project(list, Filter(cond, lr: LogicalRelation)) => Some((list, Some(cond), lr))
      case _ => None
    }
  }

  private def nprobe: Int =
    spark.conf.get("spark.graft.ivf.nprobe", "4").toInt

  /** The scan's HadoopFsRelation iff it follows the IVF layout contract. */
  private def ivfRelation(lr: LogicalRelation): Option[HadoopFsRelation] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.partitionSchema.fieldNames.contains("centroid_id") &&
            fs.location.rootPaths.nonEmpty &&
            fs.location.rootPaths.head.getParent != null =>
        val sibling = new Path(fs.location.rootPaths.head.getParent, "centroids")
        val hfs = sibling.getFileSystem(spark.sessionState.newHadoopConf())
        if (hfs.exists(sibling)) Some(fs) else None
      case _ => None
    }

  /** Extract the literal query vector from the score expression
    * (`round(dot_product(col, lit), 6)` or bare `dot_product`). */
  private def queryVectorOf(e: Expression): Option[Array[Double]] = {
    def litVec(x: Expression): Option[Array[Double]] = x match {
      case c: Cast => litVec(c.child)
      case Literal(a: ArrayData, ArrayType(DoubleType, _)) => Some(a.toDoubleArray())
      case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
        Some(a.toFloatArray().map(_.toDouble))
      case _ => None
    }
    e.collectFirst { case DotProduct(a, b) => litVec(b).orElse(litVec(a)) }.flatten
  }

  /** Rank stored centroids against the query (same formula as
    * `Index.searchIvf`: position-wise sum of cv * qv[pos], rounded to 6,
    * id tie-break), return the top-nprobe cluster ids. */
  private def probedClusters(centroidsPath: String, qv: Array[Double],
                             np: Int): Seq[Any] = {
    inRewrite.set(true)
    try {
      spark.read.parquet(centroidsPath)
        .groupBy("centroid_id")
        .agg(round(sum(col("cv") * element_at(typedLit(qv.toSeq), col("pos") + 1)), 6)
          .as("cscore"))
        .orderBy(desc("cscore"), col("centroid_id"))
        .limit(np)
        .select("centroid_id")
        .collect().toSeq.map(_.get(0))
    } finally inRewrite.set(false)
  }
}

object IvfTopKRewrite {
  /** Guards the re-entrant centroid-ranking job from re-triggering the
    * rule (and from matching some unrelated concurrent plan mid-rank). */
  private val inRewrite: ThreadLocal[Boolean] =
    ThreadLocal.withInitial(() => false)
}
