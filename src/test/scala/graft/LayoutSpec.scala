package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order clustering must make per-file min/max ranges narrow on BOTH
  * dimensions — the property parquet data skipping prunes on — where a
  * single-column sort only narrows its own. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random 2d points, independent dims
  private lazy val points = spark.range(20000).select(
    col("id"),
    (pmod(xxhash64(col("id")), lit(100000L)) / 100000.0).as("a"),
    (pmod(xxhash64(col("id"), lit(1)), lit(100000L)) / 100000.0).as("b"))

  /** Mean per-file (max-min) coverage of `c`, written at `path`. */
  private def meanCoverage(path: String, c: String): Double = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head
      r.getDouble(1) - r.getDouble(0)
    }
    spans.sum / spans.length
  }

  test("z-ordered files are narrow on both dims; sorted files on one") {
    val root = Files.createTempDirectory("graft-zorder").toString
    Layout.zorder(points, Seq("a", "b"), numFiles = 16, bitsPerDim = 6)
      .write.parquet(s"$root/z")
    points.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$root/s")

    assert(spark.read.parquet(s"$root/z").count() == 20000) // lossless

    val (za, zb) = (meanCoverage(s"$root/z", "a"), meanCoverage(s"$root/z", "b"))
    val (sa, sb) = (meanCoverage(s"$root/s", "a"), meanCoverage(s"$root/s", "b"))
    info(f"z-order coverage a=$za%.2f b=$zb%.2f; sort-by-a a=$sa%.2f b=$sb%.2f")
    // sort-by-a: tight on a, blind on b
    assert(sa < 0.2 && sb > 0.8)
    // z-order: materially narrow on BOTH dims (16 files ≈ 4x4 grid ->
    // ~1/4 coverage per dim ideally; allow generous slack)
    assert(za < 0.5 && zb < 0.5)
    assert(zb < sb / 1.5)
  }
}
