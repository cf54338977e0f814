package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `BINARY` columns with a typed metadata struct, and
  * decode / feature-extraction / resize / frame-sampling run as batched
  * partition-local transforms.
  *
  * The actual codec work is STUBBED deterministically (no image/audio
  * libraries in this build): `decodeStub` derives plausible media
  * properties from the content hash instead of parsing the container.
  * Everything Spark-side is real — the schema, the mapPartitions batch
  * shape (mirroring how a Python `mapInPandas` + PIL/librosa stage would
  * slot in), the partitioning story (media tables bucket by `media_id`;
  * features join back on it), and the byte-level statistics, which need
  * no codec at all.
  */
object Multimodal {

  /** Canonical media-table schema: content + typed sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  final case class DecodedMedia(media_id: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-properties + a 16-dim feature
    * vector derived from the content bytes. A real deployment swaps the
    * body for an image/audio decoder; the batch shape (one partition's
    * rows grouped into fixed-size batches, heavy native work amortized
    * per batch) is exactly what the real decoder needs. */
  def decodeStub(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // (real decoder: one native call per batch goes here)
          batch.iterator.map { case (id, mt, bytes) =>
            val h = java.util.Arrays.hashCode(bytes)
            val feat = byteFeature16(bytes)
            DecodedMedia(id, mt,
              width = 64 + math.floorMod(h, 1024),
              height = 64 + math.floorMod(h >> 10, 1024),
              n_frames = if (mt == "video") 1 + math.floorMod(h >> 20, 300) else 1,
              feature = feat)
          }
        }
      }.toDF()
  }

  /** 16-bin byte histogram, L1-normalized — a codec-free content feature
    * computed in plain JVM code per row. */
  def byteFeature16(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= bytes.length.toFloat; j += 1 }
    hist
  }

  /** Byte-level statistics as pure Column expressions (no decode, no
    * UDF): size and content digest — the dedup keys for media. */
  def sizeBytes(content: Column): Column = length(content)
  def contentDigest(content: Column): Column = md5(content)

  /** Resize plan stub: rewrites the metadata struct for a target box,
    * preserving aspect ratio — metadata-only, the pixel work happens in
    * the decode stage. */
  def resizeMeta(width: Column, height: Column, maxDim: Int): (Column, Column) = {
    val scale = least(lit(maxDim) / greatest(width, height), lit(1.0))
    ((width * scale).cast("int"), (height * scale).cast("int"))
  }

  /** Frame-sampling plan: which frame indices to extract for a video of
    * `nFrames` at stride `everyN` — as an array column the decode stage
    * consumes. */
  def frameSampleIndices(nFrames: Column, everyN: Int): Column =
    when(nFrames >= 1,
      sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyN)))
      .otherwise(array().cast("array<int>"))
}
