package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities: multi-dimensional clustering for data
  * skipping.
  *
  * Parquet scans prune files and row groups by column min/max
  * statistics. Sorting by one column makes ITS ranges tight per file
  * but leaves every other column spanning the whole domain — filters on
  * a second column skip nothing. Z-ordering interleaves equi-depth
  * bucket ids of several columns into one clustering key, so each file
  * covers a small hyper-rectangle of the combined space and filters on
  * ANY z-column skip most files — the standard lakehouse technique
  * (`OPTIMIZE ZORDER BY`) in plain Spark.
  *
  * Bucketing is distributed: each dimension is `repartitionByRange`d
  * (sampled range bounds, no single-task sort) and the partition id IS
  * the equi-depth bucket — robust to skewed value distributions, no
  * driver-side histogram.
  */
object Layout {

  /** Interleave bucket-id columns bit-wise: bit b of dimension i lands
    * at position b*dims + i. */
  private def interleave(buckets: Seq[Column], bitsPerDim: Int): Column = {
    val d = buckets.size
    val terms = for {
      (bucket, dim) <- buckets.zipWithIndex
      bit <- 0 until bitsPerDim
    } yield shiftleft(shiftright(bucket, bit).bitwiseAND(lit(1L)), bit * d + dim)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` clustered by the z-order of `zCols` into `numFiles`
    * range partitions (write with one file per partition to get the
    * skipping-friendly stats). `bitsPerDim` controls bucket resolution:
    * 2^bits buckets per dimension; dims * bits must fit a long. */
  def zorder(df: DataFrame, zCols: Seq[String], numFiles: Int,
             bitsPerDim: Int = 8): DataFrame = {
    require(zCols.nonEmpty && bitsPerDim * zCols.size <= 63,
      s"need zCols.size * bitsPerDim <= 63, got ${zCols.size} x $bitsPerDim")
    val nBuckets = 1 << bitsPerDim
    var cur = df
    val bucketCols = zCols.zipWithIndex.map { case (c, i) =>
      val name = s"__zb$i"
      cur = cur.repartitionByRange(nBuckets, col(c))
        .withColumn(name, spark_partition_id().cast("long"))
      name
    }
    cur.withColumn("__z", interleave(bucketCols.map(col), bitsPerDim))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(bucketCols :+ "__z": _*)
  }
}
