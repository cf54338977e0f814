package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion — the Common Crawl shape a 100 TB pretraining
  * corpus actually arrives in (the reference ingests local files and
  * JSONL, `src/cli/build.rs`; web-scale corpora ship as WARC, ISO
  * 28500, and its WET plain-text conversion sibling).
  *
  * Format (public spec): a WARC file is a sequence of records, each a
  * `WARC/x.y` version line, CRLF header lines (`Name: value`) up to a
  * blank line, then exactly `Content-Length` payload bytes, then a
  * blank separator. WET files are WARC files whose `conversion`
  * records carry the extracted UTF-8 text of one page each.
  *
  * Scale/parallelism stance: `.warc.gz`/`.wet.gz` are concatenated
  * gzip members and NOT splittable without a member index, so the unit
  * of parallelism is the FILE — which is how the corpus is shipped
  * (Common Crawl segments into ~64k files of ~150 MB per crawl;
  * thousands of tasks with no shuffle). The scan is `binaryFile`-based
  * (works on any Hadoop-visible FS), decompression + parsing happen
  * inside the flatMap at scan parallelism, and malformed records are
  * skipped per record (DROPMALFORMED stance, same as [[FileIngest
  * .readJsonl]]) — one corrupt record must not fail a 150 MB file, and
  * one corrupt file must not fail a 100 TB ingest.
  */
object WarcIngest {

  /** One parsed record. `source` falls back to `path#index` when the
    * record carries no WARC-Target-URI (warcinfo records, some
    * request/response pairs). */
  private[graft] case class WarcRecord(
      warcType: String, targetUri: String, date: String,
      recordId: String, contentType: String, text: String, nBytes: Long)

  /** Read WET/WARC files under `path` (glob or directory) into
    * (text, source, warc_type, warc_date, record_id, content_type,
    * n_bytes) rows, keeping only `recordTypes` (default: `conversion`,
    * WET's text records). Payloads longer than `maxPayloadBytes` are
    * skipped, not truncated (a truncated document would silently
    * corrupt downstream dedup/fingerprints). */
  def readWet(spark: SparkSession, path: String,
              recordTypes: Seq[String] = Seq("conversion"),
              maxPayloadBytes: Long = 8L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val types = recordTypes.map(_.toLowerCase).toSet
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.{warc,wet,warc.gz,wet.gz,gz}")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val base: InputStream = new ByteArrayInputStream(bytes)
        val in = new BufferedInputStream(
          if (p.endsWith(".gz")) new GZIPInputStream(base) else base)
        try {
          parseRecords(in, maxPayloadBytes).zipWithIndex.collect {
            case (r, i) if types.contains(r.warcType) =>
              val src = if (r.targetUri.nonEmpty) r.targetUri else s"$p#$i"
              (r.text, src, r.warcType, r.date, r.recordId, r.contentType,
                r.nBytes)
          }.toVector
        } catch {
          // A corrupt gzip member/file yields the records parsed so
          // far from nothing; it must not fail the whole ingest task.
          case _: java.util.zip.ZipException => Vector.empty
          case _: EOFException => Vector.empty
        } finally in.close()
      }
      .toDF("text", "source", "warc_type", "warc_date", "record_id",
        "content_type", "n_bytes")
      .filter(length(col("text")) > 0)
  }

  /** Parse all well-formed records in the stream, skipping malformed
    * ones by scanning forward to the next `WARC/` version line. The
    * iterator is lazy per record, but each payload is bounded by
    * `maxPayloadBytes`, so per-task memory is one payload. */
  private[graft] def parseRecords(in: InputStream,
      maxPayloadBytes: Long = 8L * 1024 * 1024): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      advance()

      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }

      private def advance(): Unit = {
        while (true) {
          // scan to the next version line (skips garbage between records
          // and the blank separators after payloads)
          var line = readLine(in)
          while (line != null && !line.startsWith("WARC/")) line = readLine(in)
          if (line == null) { done = true; return }

          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = readLine(in)
          var ok = h != null
          while (ok && h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) headers.update(
              h.substring(0, i).trim.toLowerCase,
              h.substring(i + 1).trim)
            h = readLine(in)
            if (h == null) ok = false
          }
          val len = headers.get("content-length").flatMap(_.toLongOption)
          if (ok && len.exists(l => l >= 0 && l <= maxPayloadBytes)) {
            readFully(in, len.get) match {
              case Some(payload) =>
                nextRec = WarcRecord(
                  headers.getOrElse("warc-type", "").toLowerCase,
                  stripAngles(headers.getOrElse("warc-target-uri", "")),
                  headers.getOrElse("warc-date", ""),
                  stripAngles(headers.getOrElse("warc-record-id", "")),
                  headers.getOrElse("content-type", ""),
                  new String(payload, StandardCharsets.UTF_8),
                  len.get)
                return
              case None => done = true; return // truncated final record
            }
          } else if (ok && len.exists(_ > maxPayloadBytes)) {
            // oversized: skip exactly the payload, keep parsing
            if (!skipFully(in, len.get)) { done = true; return }
          }
          // else: malformed record (no/bad Content-Length) — loop and
          // re-scan for the next WARC/ marker
        }
      }
    }

  /** Some WARC writers wrap URIs/ids in angle brackets (`<urn:...>`). */
  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  /** Byte-level line read (headers are ASCII; CRLF or LF), null at EOF
    * with nothing read. */
  private def readLine(in: InputStream): String = {
    val buf = new ArrayBuffer[Byte](64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf += b.toByte; b = in.read() }
    if (buf.nonEmpty && buf.last == '\r') buf.remove(buf.length - 1)
    new String(buf.toArray, StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, n: Long): Option[Array[Byte]] = {
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, (n - off).toInt)
      if (r < 0) return None
      off += r
    }
    Some(out)
  }

  private def skipFully(in: InputStream, n: Long): Boolean = {
    var left = n
    val buf = new Array[Byte](64 * 1024)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) return false
      left -= r
    }
    true
  }
}
