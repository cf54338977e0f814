package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a text column: the `numHashes`
  * minima of a universal hash family applied to the document's DISTINCT
  * word n-gram shingles. Same parity contract as the relational
  * formulation in `Dedup.minhashSignaturesWide` (and the DuckDB
  * oracle): tokens `[a-z0-9]{2,}` over Spark-lower text, shingles
  * space-joined n-grams as a SET, base hash = first 15 md5 hex chars
  * (`SimHash64.md5Hex15`), family member s =
  * `((h % 2147483647) * (2s+1) + s + 1) % 2147483647`.
  *
  * As a scalar expression the signature stage is a pure map — zero
  * shuffle at any corpus size, where the aggregation formulation
  * shuffles every (doc, shingle) row. Returns NULL for documents with
  * no shingles (fewer than n tokens) — such docs are absent from the
  * relational signature table too, and a sentinel signature would make
  * all empty docs LSH-collide.
  */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0 && numHashes > 0, s"need n > 0 and numHashes > 0, got $n/$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING input, got ${child.dataType}")

  private val MOD = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    val m = SimHash64.tokenPattern.matcher(text)
    while (m.find()) toks.add(m.group())
    if (toks.size < n) return null

    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= toks.size - n) {
      val sb = new StringBuilder(toks.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val h = SimHash64.md5Hex15(shingle) % MOD
        var s = 0
        while (s < numHashes) {
          val v = (h * (2L * s + 1) + s + 1) % MOD
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
