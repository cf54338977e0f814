package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder: maps an `ARRAY<DOUBLE>` vector of
  * `m * dsub` dimensions to `m` one-byte-range codes, each the argmin-L2
  * centroid of that subspace's codebook (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search").
  *
  * The codebook is a constructor constant (flat row-major
  * `[(sub * k + code) * dsub + j]`), shipped once per task via the
  * codegen reference array — NOT per row. A Column formulation would
  * need an `m * k * dsub`-node expression tree (8·256·96 ≈ 200k nodes at
  * production shape — far past codegen limits); this is three primitive
  * loops inside whole-stage codegen, like [[DotProduct]].
  *
  * Determinism contract (the DuckDB oracle reproduces encode exactly):
  * per-subspace distance is the *sequential* sum of squared diffs
  * (j = 0..dsub-1), and argmin keeps the FIRST code achieving the
  * minimum (strict `<` comparison == `ORDER BY dist, code LIMIT 1`).
  *
  * Null vectors yield null; a wrong-dims vector throws (same stance as
  * [[DotProduct.dimMismatch]] — silent truncation would produce
  * plausible wrong codes).
  */
case class PqEncode(child: Expression, codebook: PqCodebookConst, m: Int, k: Int)
    extends UnaryExpression {

  require(m > 0 && k > 0, s"pq_encode: m and k must be positive, got m=$m k=$k")
  require(codebook.length % (m * k) == 0 && codebook.length > 0,
    s"pq_encode: codebook length ${codebook.length} is not a multiple of m*k=${m * k}")

  val dsub: Int = codebook.length / (m * k)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<DOUBLE> input, got $other")
  }

  private def flat: Array[Double] = codebook.flat

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw PqEncode.dimMismatch(v.numElements(), m * dsub)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      val vbase = mi * dsub
      var c = 0
      while (c < k) {
        val cbase = (mi * k + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = v.getDouble(vbase + j) - flat(cbase + j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(mi) = bestC
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val vbase = ctx.freshName("vbase")
      val cbase = ctx.freshName("cbase")
      val cls = classOf[PqEncode].getName
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw $cls.dimMismatch($v.numElements(), ${m * dsub});
         |}
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  int $vbase = $mi * $dsub;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $cbase = ($mi * $k + $c) * $dsub;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      double $diff = $v.getDouble($vbase + $j) - $cb[$cbase + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bestC = $c; }
         |  }
         |  $codes[$mi] = $bestC;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Wrong input dims = wrong embedder for this codebook; fail fast.
    * Called from generated code, hence public + Java-friendly. */
  def dimMismatch(got: Int, want: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"pq_encode: vector has $got dimensions, codebook expects $want")
}

/** Opaque codebook constant for [[PqEncode]]'s case-class arity.
  *
  * A bare `IndexedSeq[Double]` constructor field leaks into the
  * expression's product iterator: `explain()` would render all
  * m·k·dsub doubles (multi-MB plan strings at 8·256·96 production
  * shape) and every tree transform/comparison would walk them. This
  * wrapper prints a three-number summary and compares by a precomputed
  * hash before falling back to content equality (so Catalyst
  * canonicalization/CSE still unify identical codebooks). */
final class PqCodebookConst(val flat: Array[Double]) extends Serializable {
  def length: Int = flat.length
  private val hash: Int = java.util.Arrays.hashCode(flat)
  override def hashCode: Int = hash
  override def equals(o: Any): Boolean = o match {
    case c: PqCodebookConst =>
      (c eq this) || (c.hash == hash && java.util.Arrays.equals(c.flat, flat))
    case _ => false
  }
  override def toString: String = s"pq_codebook(len=${flat.length}, hash=$hash)"
}
