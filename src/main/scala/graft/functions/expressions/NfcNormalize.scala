package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * Catalyst expression — Spark ships no `normalize` SQL function, and a
  * Scala UDF would box every row and block whole-stage codegen.
  *
  * Crawled text mixes composed ("é" U+00E9) and decomposed
  * ("e" + U+0301) forms of the same glyphs; every downstream text
  * operator in this engine (fingerprints, shingles, dedup keys, BM25
  * terms) compares bytes, so un-normalized input silently splits
  * identical content into distinct keys. NFC first makes those
  * operators see one spelling. Parity: DuckDB's `nfc_normalize` applies
  * the same Unicode canonical composition, so the normalization
  * pipeline ([[graft.functions.TextFunctions.normalizeText]]) is
  * oracle-checkable end to end.
  *
  * `doGenCode` emits the single static `Normalizer.normalize` call
  * inline, so the expression stays inside whole-stage codegen (it is
  * meant for the first projection over 100 TB of raw text). The
  * fast-path check `Normalizer.isNormalized` skips allocation for the
  * (dominant) already-NFC case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    NfcNormalize.normalize(u)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared by interpreted and generated code paths. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
