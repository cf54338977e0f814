package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.storage.StorageLevel

/** Round-state anchoring for the iterative operators (PageRank/PPR/
  * LPA/label-spread/k-core/CC loops): eager SERIALIZED localCheckpoint
  * (the r15 heap-cliff discipline) PLUS statistics re-anchoring (r16).
  *
  * Why the stats step: `localCheckpoint` copies the ORIGINAL plan's
  * size estimate onto the new `LogicalRDD`
  * (`LogicalRDD.rewriteStatsAndConstraints`), and the size estimate of
  * a join is the PRODUCT of its children's. A loop whose per-round
  * plan references the previous round's checkpoint K >= 2 times (the
  * watch-column carry joins, CC's pointer-jump self-join) therefore
  * compounds the estimate's BigInt digit count by factor K per round —
  * stats computation itself becomes the per-round bottleneck, and past
  * ~60 compounding rounds Spark throws `ArithmeticException:
  * BigInteger would overflow supported range` (measured: GraphSpec's
  * 60-cap PPR arm). Dropping the inherited stats resets the leaf to
  * the constant conf default each round; AQE's runtime sizes govern
  * the actual join strategies regardless, and output partitioning /
  * ordering are preserved for exchange reuse.
  */
private[operators] object Ckpt {
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    /** Eager serialized local checkpoint with round-invariant stats. */
    def ckptSer(): DataFrame = GraftColumnBridge.dropInheritedStats(
      df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER))
  }
}
