package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A declarative Bloom filter: md5-derived probe positions, built with
  * one bit-OR aggregation, tested with pure Column arithmetic against
  * a literal word array — no UDF, no sketch object to serialize, and
  * (because every ingredient is md5/bit math) reproducible by any
  * engine, like every other hash in this codebase.
  *
  * Why not Spark's `stat.bloomFilter`: that returns an opaque sketch
  * whose membership test only runs through a lambda filter
  * (deserialized per row) or internal Catalyst expressions; this one
  * keeps the test inside whole-stage codegen and the filter itself is
  * just `Array[Long]` — m/64 words collected to the driver (KBs at
  * ~10 bits/member for a million members) and shipped as a literal.
  *
  * Scale: build = one map over the member set + a groupBy on at most
  * m/64 word indices (map-side combined, result rows = filter words);
  * test = k md5 calls per row, zero shuffle. False-positive rate
  * ≈ (1 - e^(-k·n/m))^k; false NEGATIVES are impossible — the property
  * gating passes rely on.
  */
object Bloom {

  /** Probe j's bit position for a value: md5("j:" + value) mod m. */
  private def probe(c: Column, j: Int, mBits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), c.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(mBits.toLong))

  /** shiftleft with a COLUMN shift amount (the DSL overload only takes
    * a literal; the Catalyst expression itself accepts any child). */
  private def shiftLeftCol(v: Column, n: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        GraftColumnBridge.expression(v),
        GraftColumnBridge.expression(n)))
  }

  /** Build the filter over a column's values. `mBits` must be a
    * multiple of 64. Returns the packed bit words. */
  def build(df: DataFrame, colName: String, mBits: Int,
            kHashes: Int = 4): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1: $kHashes")
    val probes = (0 until kHashes).map(j => probe(col(colName), j, mBits))
    val rows = df.select(explode(array(probes: _*)).as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        shiftLeftCol(lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("mask"))
      .collect()
    val words = new Array[Long](mBits / 64)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test as a Column: false = definitely absent, true =
    * possibly present (verify exactly downstream when it matters). */
  def mightContain(c: Column, words: Array[Long], kHashes: Int = 4): Column = {
    require(words.nonEmpty, "empty Bloom filter")
    val mBits = words.length * 64
    val bits = typedLit(words.toSeq)
    (0 until kHashes).map { j =>
      val p = probe(c, j, mBits)
      val word = element_at(bits, (p / lit(64L)).cast("int") + 1)
      val mask = shiftLeftCol(lit(1L), pmod(p, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
