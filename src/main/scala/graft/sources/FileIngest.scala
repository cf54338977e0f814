package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-tree ingestion (SURVEY §2.1, S1-S3): walk directories into a
  * `(text, source)` DataFrame ready for the chunk→embed pipeline.
  *
  * The reference walks with the `ignore` crate honoring .gitignore, an
  * extension allow/deny list, a size cap (1 MB default, 10 KB for
  * `.json`), hidden-file exclusion and a max-file count
  * (`src/cli/build.rs:414-554`). Spark-side the same policy becomes a
  * `binaryFile` scan plus Column predicates — the predicates (size,
  * path) push into the file-index listing, so excluded files are never
  * read. PDF extraction (S3, a cargo feature in the reference) is a
  * pluggable `ContentDecoder`; the default decoder handles UTF-8 text
  * and skips undecodable bytes, matching `load_file_content`'s
  * skip-unreadable behavior.
  */
object FileIngest {

  /** The reference's default extension allow-list (build.rs:429-440). */
  val defaultExtensions: Seq[String] = Seq(
    "txt", "md", "py", "js", "ts", "tsx", "jsx", "rs", "go", "java",
    "c", "cpp", "cc", "h", "hpp", "json", "yaml", "yml", "toml",
    "rb", "php", "swift", "kt", "scala", "cs")

  /** Stricter size cap for data-ish formats (build.rs:443-444). */
  val strictSizeExtensions: Map[String, Long] = Map("json" -> 10L * 1024)

  trait ContentDecoder extends Serializable {
    /** Decode raw file bytes to text; None = skip the file. */
    def decode(path: String, bytes: Array[Byte]): Option[String]
  }

  /** UTF-8 decoder; undecodable files are skipped (S2). A PDF decoder
    * (S3) plugs in here — pdfbox is not shipped in this build, so PDF
    * support stays a decoder away rather than a code change. */
  object Utf8Decoder extends ContentDecoder {
    override def decode(path: String, bytes: Array[Byte]): Option[String] = {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
      catch { case _: java.nio.charset.CharacterCodingException => None }
    }
  }

  /** HTML → text decoder (dependency-free): drops script/style/comments,
    * strips tags (block-level tags become newlines so headings and
    * paragraphs keep their boundaries for chunking), decodes the common
    * named entities plus numeric escapes, collapses blank runs. Routes
    * by extension and falls back to UTF-8 passthrough for everything
    * else, so it can replace the default decoder wholesale. */
  object HtmlTextDecoder extends ContentDecoder {
    private val blockTags =
      "p|div|br|li|ul|ol|tr|table|h[1-6]|section|article|header|footer|blockquote|pre"
    private val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

    private[graft] def htmlToText(html: String): String = {
      val noScript = html
        .replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
        .replaceAll("(?s)<!--.*?-->", " ")
      val withBreaks = noScript
        .replaceAll(s"(?i)</?($blockTags)(\\s[^>]*)?/?>", "\n")
        .replaceAll("(?s)<[^>]+>", " ")
      val decoded = "&(#[xX][0-9a-fA-F]+|#[0-9]+|[a-zA-Z]+);".r.replaceAllIn(withBreaks, m => {
        val body = m.group(1)
        // malformed/overflowing escapes pass through verbatim — one junk
        // entity must never fail the ingest task
        val rep =
          try {
            if (body.startsWith("#x") || body.startsWith("#X"))
              Character.toString(Integer.parseInt(body.drop(2), 16))
            else if (body.startsWith("#"))
              Character.toString(Integer.parseInt(body.drop(1)))
            else named.getOrElse(body, m.matched)
          } catch { case _: IllegalArgumentException => m.matched }
        java.util.regex.Matcher.quoteReplacement(rep)
      })
      decoded
        .replaceAll("[ \\t\\x0B\\f\\r]+", " ")
        .replaceAll(" ?\\n ?", "\n")
        .replaceAll("\\n{2,}", "\n")
        .trim
    }

    override def decode(path: String, bytes: Array[Byte]): Option[String] =
      Utf8Decoder.decode(path, bytes).map { text =>
        if (path.toLowerCase.endsWith(".html") || path.toLowerCase.endsWith(".htm"))
          htmlToText(text)
        else text
      }.filter(_.nonEmpty)
  }

  /** JSONL corpus source: one JSON document object per line — the
    * common interchange format for training-data drops. Maps the
    * configured fields to the engine's `(text, source)` contract;
    * malformed lines are dropped (DROPMALFORMED), text-less rows are
    * filtered, and a missing source field falls back to
    * `<file>#<content-fingerprint>` — derived from stable data only, so
    * ids stay deterministic across runs and repartitioning (a line
    * number would not be: Spark reads splits in any order). Identical
    * text lines in one file collapse to one source, which matches the
    * dedup gate's exact-duplicate semantics anyway. Splittable and
    * scan-parallel like any Spark json read. */
  def readJsonl(spark: SparkSession, path: String,
                textField: String = "text",
                sourceField: String = "source"): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField(textField, StringType, nullable = true),
      StructField(sourceField, StringType, nullable = true)))
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .withColumn("__file", input_file_name())
      .select(
        col(textField).as("text"),
        coalesce(col(sourceField),
          concat(col("__file"), lit("#"),
            graft.functions.TextFunctions.fingerprint(col(textField)))).as("source"))
      .filter(col("text").isNotNull && length(col("text")) > 0)
  }

  private def ext(path: Column): Column =
    lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))

  /** Scan a directory tree into `(text, source)` rows.
    *
    * Local directory roots are enumerated by [[IgnoreWalk]] (honoring
    * `.gitignore`/`.leannignore` and skipping build/dependency
    * directories, like the reference's `ignore`-crate walker,
    * build.rs:492-509) — pointing the build CLI at a real repo must not
    * ingest `node_modules` or `target`. The extension/size/cap policy
    * is then applied as Column predicates over the (path, length)
    * listing, and only the surviving files have their CONTENT read —
    * distributed, inside the flatMap. The walk branch requires the
    * driver's filesystem to be visible to the executors (local master /
    * shared FS — the build-CLI deployments); on a non-local master,
    * non-local roots (HDFS/object stores, where per-directory ignore
    * files aren't a convention), or `honorIgnoreFiles = false`, the
    * plain recursive `binaryFile` scan is used instead — which fails
    * LOUDLY if paths aren't readable, never silently ingesting zero
    * documents. In the walk branch, a file deleted between listing and
    * read is skipped (ingest races are normal); any other I/O error
    * (permissions, disk) fails the task loudly. */
  def readDocuments(spark: SparkSession, root: String,
                    extensions: Seq[String] = defaultExtensions,
                    excludeExtensions: Seq[String] = Nil,
                    includeHidden: Boolean = false,
                    maxFileSizeKb: Long = 1024,
                    maxFiles: Option[Int] = None,
                    decoder: ContentDecoder = Utf8Decoder,
                    honorIgnoreFiles: Boolean = true): DataFrame = {
    import spark.implicits._

    val e = ext(col("path"))
    val strict = strictSizeExtensions.foldLeft(lit(maxFileSizeKb * 1024)) {
      case (acc, (x, cap)) => when(e === x, least(acc, lit(cap))).otherwise(acc)
    }
    def applyPolicy(raw: DataFrame, hiddenFiltered: Boolean): DataFrame = {
      val hiddenOk =
        if (includeHidden || hiddenFiltered) lit(true)
        else !col("path").rlike("/\\.[^/]+(/|$)")
      val filtered = raw
        .filter(e.isin(extensions.map(_.toLowerCase): _*))
        .filter(if (excludeExtensions.isEmpty) lit(true)
                else !e.isin(excludeExtensions.map(_.toLowerCase): _*))
        .filter(col("length") <= strict)
        .filter(hiddenOk)
      maxFiles match {
        case Some(n) => filtered.orderBy("path").limit(n) // deterministic cap
        case None    => filtered
      }
    }

    val localRoot = new java.io.File(root)
    if (honorIgnoreFiles && localRoot.isDirectory &&
        spark.sparkContext.isLocal) {
      val listing = IgnoreWalk.walk(root, includeHidden).toDF("path", "length")
      applyPolicy(listing, hiddenFiltered = true)
        .select("path").as[String]
        .flatMap { p =>
          val bytes =
            try Some(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
            catch {
              // deleted between listing and read: a normal ingest race
              case _: java.nio.file.NoSuchFileException => None
              case _: java.io.FileNotFoundException => None
              // permissions/disk errors must fail the task, not silently
              // shrink the corpus
            }
          bytes.flatMap(b => decoder.decode(p, b)).map(t => (t, p))
        }
        .toDF("text", "source")
    } else {
      val raw = spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("path"), col("length"), col("content"))
      applyPolicy(raw, hiddenFiltered = false)
        .select(col("path").as("source"), col("content"))
        .as[(String, Array[Byte])]
        .flatMap { case (p, bytes) => decoder.decode(p, bytes).map(t => (t, p)) }
        .toDF("text", "source")
    }
  }
}
