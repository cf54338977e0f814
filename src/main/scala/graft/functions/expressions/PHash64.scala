package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual difference hash (dHash) over an encoded image
  * column — the image analog of [[SimHash64]] for the multimodal
  * near-dup tier (SURVEY "beyond the reference"; the public dHash
  * scheme popularized by the pHash family of algorithms).
  *
  * Per row: decode via `javax.imageio` (PNG/JPEG/BMP/GIF — the same
  * JDK codec arm as `Multimodal.decode`), reduce to a 9x8 grayscale
  * grid by integer block-averaging, then emit one bit per horizontally
  * adjacent cell pair: bit `r*8+c` is set iff `gray[r][c+1] >
  * gray[r][c]`. Near-identical images (recompression, small edits,
  * brightness-preserving noise) land within a few bits of Hamming
  * distance; unrelated images differ in ~32.
  *
  * As a scalar expression the fingerprint is a pure map — 100 TB of
  * media hashes with ZERO shuffle; the banded Hamming pair join over
  * the resulting longs (`Dedup.hammingBandedPairs`) is the only
  * exchange in the dedup plan, and it carries 8-byte signatures, never
  * pixels.
  *
  * Determinism contract (what the DuckDB oracle replays): grayscale is
  * the integer luminance `(299R + 587G + 114B) / 1000` (exact for gray
  * pixels: r=g=b=v gives v); block boundaries are `x0 = c*w/9, x1 =
  * (c+1)*w/9` (integer division, likewise rows /8) and the block value
  * is `floor(sum / count)` — no floating point anywhere, so a fixture
  * whose pixel values are known analytically (lossless PNG round-trip)
  * hashes to an exactly predictable value. A 9x8 input image is hashed
  * verbatim (every block is one pixel).
  *
  * NULL for: undecodable/corrupt bytes (the dedup analog of
  * SimHash64's token-less docs — absent, never a hot sentinel key) and
  * images smaller than the 9x8 grid (blocks would be empty).
  *
  * `CodegenFallback`: the body is a per-row codec call + pixel loop
  * with local state — nothing whole-stage codegen could fuse.
  */
case class PHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phash64 expects BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PHash64.hash(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)

  override def prettyName: String = "phash64"
}

object PHash64 {
  val GridW = 9
  val GridH = 8

  /** Decode + dHash; None when the bytes aren't a decodable image of at
    * least 9x8. */
  def hash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < GridW || img.getHeight < GridH) None
      else Some(dhash(grayGrid(img)))
    } catch {
      // Corrupt/hostile containers throw runtime exceptions from ImageIO
      // plugins (same failure family as Multimodal.decodeOne): absent,
      // never a task failure.
      case scala.util.control.NonFatal(_) => None
    }

  /** 9x8 grayscale reduction by exact integer block-averaging
    * (row-major: grid(r*9+c)). */
  private[graft] def grayGrid(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Int](GridW * GridH)
    var r = 0
    while (r < GridH) {
      val y0 = r * h / GridH
      val y1 = (r + 1) * h / GridH
      var c = 0
      while (c < GridW) {
        val x0 = c * w / GridW
        val x1 = (c + 1) * w / GridW
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        grid(r * GridW + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        c += 1
      }
      r += 1
    }
    grid
  }

  /** dHash bit fold over a row-major 9x8 grid: bit r*8+c set iff the
    * right neighbor is strictly brighter. */
  private[graft] def dhash(grid: Array[Int]): Long = {
    var sh = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if (grid(r * GridW + c + 1) > grid(r * GridW + c))
          sh |= 1L << (r * (GridW - 1) + c)
        c += 1
      }
      r += 1
    }
    sh
  }
}
