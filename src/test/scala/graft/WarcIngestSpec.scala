package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.sources.WarcIngest

/** WET/WARC source: record framing, type filtering, CRLF headers,
  * Content-Length payload reads, malformed-record skipping, gzip
  * (including concatenated members — how crawl files are actually
  * written), and composition with the chunk pipeline. */
class WarcIngestSpec extends SparkSpec {

  private def record(warcType: String, uri: String, payload: String,
      extraHeader: String = ""): Array[Byte] = {
    val body = payload.getBytes(UTF_8)
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    sb.append("WARC-Record-ID: <urn:uuid:0000-1111>\r\n")
    sb.append("Content-Type: text/plain\r\n")
    if (extraHeader.nonEmpty) sb.append(s"$extraHeader\r\n")
    sb.append(s"Content-Length: ${body.length}\r\n")
    sb.append("\r\n")
    sb.toString.getBytes(UTF_8) ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val wetBytes: Array[Byte] =
    record("warcinfo", "", "software: test-crawler") ++
    record("conversion", "http://example.com/a", "first page text here") ++
    "not a warc line at all\r\ngarbage\r\n".getBytes(UTF_8) ++ // inter-record junk
    ("WARC/1.0\r\nWARC-Type: conversion\r\nbroken-no-length\r\n\r\n")
      .getBytes(UTF_8) ++ // malformed: no Content-Length → skipped
    record("conversion", "http://example.com/b", "second page\nwith two lines")

  test("parseRecords: framing, headers, payloads, malformed skip") {
    val recs = WarcIngest.parseRecords(
      new java.io.ByteArrayInputStream(wetBytes)).toVector
    assert(recs.map(_.warcType) === Vector("warcinfo", "conversion", "conversion"))
    val byUri = recs.filter(_.warcType == "conversion").map(r => r.targetUri -> r).toMap
    assert(byUri("http://example.com/a").text === "first page text here")
    assert(byUri("http://example.com/b").text === "second page\nwith two lines")
    assert(byUri("http://example.com/a").recordId === "urn:uuid:0000-1111")
    assert(byUri("http://example.com/a").date === "2024-01-01T00:00:00Z")
  }

  test("parseRecords: oversized payload is skipped whole, parsing continues") {
    val big = record("conversion", "http://big.example/", "x" * 1000)
    val small = record("conversion", "http://small.example/", "small text")
    val recs = WarcIngest.parseRecords(
      new java.io.ByteArrayInputStream(big ++ small),
      maxPayloadBytes = 100).toVector
    assert(recs.map(_.targetUri) === Vector("http://small.example/"))
  }

  test("readWet: distributed read of plain and multi-member-gzip files") {
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(s"$dir/part1.wet"), wetBytes)
    // two CONCATENATED gzip members in one file — GZIPInputStream must
    // read across member boundaries (how crawl writers append)
    val bos = new ByteArrayOutputStream()
    for (chunk <- Seq(
        record("conversion", "http://gz.example/one", "gzipped page one"),
        record("conversion", "http://gz.example/two", "gzipped page two"))) {
      val gz = new GZIPOutputStream(bos)
      gz.write(chunk); gz.finish(); gz.close()
    }
    Files.write(Paths.get(s"$dir/part2.wet.gz"), bos.toByteArray)

    val out = WarcIngest.readWet(spark, dir)
      .select("source", "text", "warc_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.size === 4) // warcinfo filtered out by default type set
    assert(out("http://example.com/a") === "first page text here")
    assert(out("http://gz.example/one") === "gzipped page one")
    assert(out("http://gz.example/two") === "gzipped page two")
  }

  test("readWet composes with the chunker pipeline (text, source contract)") {
    val dir = Files.createTempDirectory("graft-warc2").toString
    Files.write(Paths.get(s"$dir/c.wet"),
      record("conversion", "http://example.com/long",
        (1 to 80).map(i => s"sentence number $i is here").mkString(" ")))
    val docs = WarcIngest.readWet(spark, dir).select("text", "source")
    val chunks = graft.pipeline.Index.chunkDocs(docs, "text", "source",
      strategy = "simple", chunkSize = 120, chunkOverlap = 20)
    assert(chunks.count() > 1)
  }
}
