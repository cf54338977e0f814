package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.{FileIngest, PdfText, PdfTextDecoder}

/** Fixture PDFs are built by hand (the minimal page-tree skeleton with
  * a content stream) — one uncompressed, one FlateDecode — so the spec
  * exercises both stream paths offline. */
class PdfTextSpec extends SparkSpec {
  import spark.implicits._

  /** A syntactically complete single-page PDF around `content`. */
  private def pdf(content: Array[Byte], flate: Boolean): Array[Byte] = {
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length}$filter >>
         |stream
         |""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream\nendobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    head ++ content ++ tail
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private val contentStream =
    """BT
      |/F1 12 Tf
      |72 720 Td (Hello PDF world) Tj
      |0 -14 Td [(kerned) -250 (array)] TJ
      |0 -14 Td (escaped \(parens\) and \\ backslash \101) Tj
      |0 -14 Td <48657820737472696E67> Tj
      |ET""".stripMargin

  test("uncompressed content stream: Tj, TJ arrays, escapes, hex strings") {
    val text = PdfText.extract(pdf(contentStream.getBytes(StandardCharsets.ISO_8859_1),
      flate = false)).get
    assert(text.contains("Hello PDF world"))
    assert(text.contains("kernedarray")) // TJ parts concatenate
    assert(text.contains("escaped (parens) and \\ backslash A")) // \101 octal = A
    assert(text.contains("Hex string"))
    // Td line moves became newlines (chunker sees paragraph boundaries)
    assert(text.linesIterator.size >= 4)
  }

  test("FlateDecode content stream inflates and extracts the same text") {
    val text = PdfText.extract(pdf(deflate(contentStream), flate = true)).get
    assert(text.contains("Hello PDF world") && text.contains("Hex string"))
  }

  test("a nested dict (DecodeParms) cannot hide the stream's filter") {
    // /Filter sits in the OUTER dict; a naive lastIndexOf("<<") would
    // find the inner /DecodeParms dict and mis-read the deflate bytes
    // as plain text.
    val content = deflate("BT (Nested dict text) Tj ET")
    val raw = new String(pdf(content, flate = true), StandardCharsets.ISO_8859_1)
      .replace("/Filter /FlateDecode",
        "/Filter /FlateDecode /DecodeParms << /Columns 4 >>")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(raw).get.contains("Nested dict text"))
  }

  test("non-PDF, image-filter, and corrupt-deflate inputs are skipped, not thrown") {
    assert(PdfText.extract("not a pdf at all".getBytes).isEmpty)
    // DCTDecode (JPEG) stream: unsupported filter -> no text, no crash
    val jpeg = pdf("ÿØÿ junk".getBytes(StandardCharsets.ISO_8859_1), flate = false)
    val asJpeg = new String(jpeg, StandardCharsets.ISO_8859_1)
      .replace("/Length", "/Filter /DCTDecode /Length")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(asJpeg).isEmpty)
    // flate flag set but garbage bytes -> DataFormatException swallowed
    assert(PdfText.extract(pdf("garbage not deflate".getBytes, flate = true)).isEmpty)
  }

  test("pdf files flow through readDocuments into chunks (S3 end-to-end)") {
    val root = Files.createTempDirectory("graft-pdf")
    Files.write(root.resolve("doc.pdf"),
      pdf(contentStream.getBytes(StandardCharsets.ISO_8859_1), flate = false))
    Files.writeString(root.resolve("plain.md"), "plain markdown doc")
    val docs = FileIngest.readDocuments(spark, root.toString,
      extensions = FileIngest.defaultExtensions :+ "pdf",
      decoder = PdfTextDecoder)
      .as[(String, String)].collect().toMap
    assert(docs.size == 2)
    val pdfText = docs.keys.find(_.contains("Hello PDF world"))
    assert(pdfText.isDefined)
    // and it chunks like any other document
    val chunks = graft.pipeline.Index.chunkDocs(
      Seq((pdfText.get, "doc.pdf")).toDF("text", "source"), "text", "source",
      strategy = "simple").collect()
    assert(chunks.nonEmpty && chunks.head.text.nonEmpty)
  }
}
