package graft

import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}

import graft.embedding.HashEmbedder
import graft.pipeline.Index
import graft.sources.LeannImport

/** Round-trip with the reference's NATIVE index layout: build an index
  * directly, lay its rows out as the reference would write them
  * (passages.jsonl + ids.txt + flat-f32 embeddings + meta.json, see
  * LeannImport scaladoc), import that directory, and require the
  * imported index to answer searches identically to the directly-built
  * one — the embeddings travelled as raw bytes, so equality proves the
  * row-to-id mapping and the little-endian decode are exact. */
class LeannImportSpec extends SparkSpec {
  import spark.implicits._

  private val provider = new HashEmbedder(32)

  private lazy val docs = Seq(
    ("vector databases store embeddings for retrieval augmented generation", "intro.md"),
    ("spark shuffles data between executors during wide transformations", "spark.md"),
    ("the hnsw graph index walks neighbors greedily for approximate search", "ann.md"),
    ("parquet files store columns with predicate pushdown and pruning", "parquet.md"))
    .toDF("text", "source")

  private lazy val wh = Files.createTempDirectory("graft-leann-import").toString
  private lazy val directDir = s"$wh/direct"

  /** Write the native layout from a built index's tables, in the exact
    * shape the Rust writer produces (collapsed file names; one JSON
    * object per jsonl line; ids line i <-> embedding row i). */
  private def writeNativeLayout(natDir: String, withEmbeddings: Boolean = true,
                                dropLastId: Boolean = false,
                                truncateBytes: Int = 0): String = {
    Files.createDirectories(Paths.get(natDir))
    val passages = spark.read.parquet(s"$directDir/passages")
      .selectExpr("id", "text", "metadata.source AS source")
      .as[(String, String, String)].collect().sortBy(_._1)
    val jsonl = passages.map { case (id, text, source) =>
      graft.util.Json.write(scala.collection.immutable.ListMap(
        "id" -> id, "text" -> text,
        "metadata" -> scala.collection.immutable.ListMap("source" -> source)))
    }.mkString("\n")
    Files.writeString(Paths.get(s"$natDir/documents.passages.jsonl"), jsonl)
    val embByIdRows = spark.read.parquet(s"$directDir/embeddings")
      .as[(String, Array[Float])].collect()
    // Map, not sliding lookup: parquet row order need not match id order
    val embById = embByIdRows.toMap
    val ids = passages.map(_._1)
    val idsOut = if (dropLastId) ids.dropRight(1) else ids
    Files.writeString(Paths.get(s"$natDir/documents.ids.txt"), idsOut.mkString("\n"))
    if (withEmbeddings) {
      val dims = embById.head._2.length
      val bb = ByteBuffer.allocate(ids.length * dims * 4).order(ByteOrder.LITTLE_ENDIAN)
      ids.foreach(id => embById(id).foreach(bb.putFloat))
      val bytes = bb.array()
      val out = if (truncateBytes > 0) bytes.dropRight(truncateBytes) else bytes
      Files.write(Paths.get(s"$natDir/documents.embeddings"), out)
    }
    Files.writeString(Paths.get(s"$natDir/documents.leann.meta.json"),
      graft.util.Json.write(scala.collection.immutable.ListMap(
        "version" -> "1.0", "backend_name" -> "hnsw",
        "embedding_model" -> provider.modelName,
        "embedding_mode" -> "provider", "dimensions" -> 32L,
        "passage_count" -> ids.length.toLong,
        "is_recompute" -> true, "is_pruned" -> !withEmbeddings)))
    natDir
  }

  test("round trip: imported native index searches identically to the direct build") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native")
    val meta = LeannImport.importIndex(spark, nat, s"$wh/imported")
    assert(meta.passageCount == 4 && meta.dimensions == 32 && !meta.isPruned)
    assert(meta.backendName == "hnsw" && meta.embeddingModel == provider.modelName)
    // embeddings byte-round-tripped: the tables must match vector-for-vector
    val direct = spark.read.parquet(s"$directDir/embeddings")
      .as[(String, Array[Float])].collect().toMap
    val imported = spark.read.parquet(s"$wh/imported/embeddings")
      .as[(String, Array[Float])].collect().toMap
    assert(imported.keySet == direct.keySet)
    imported.foreach { case (id, v) => assert(v.sameElements(direct(id)), s"vector drift for $id") }
    // and the full search path (BM25 stats, passages join, ranking) agrees
    for (q <- Seq("vector retrieval", "spark shuffle", "graph neighbors")) {
      val a = Index.search(spark, directDir, q, provider, topK = 3)
        .selectExpr("id", "score").as[(String, Double)].collect().toSeq
      val b = Index.search(spark, s"$wh/imported", q, provider, topK = 3)
        .selectExpr("id", "score").as[(String, Double)].collect().toSeq
      assert(a == b, s"search('$q') diverged: direct=$a imported=$b")
    }
  }

  test("pruned native index imports as pruned and searches via recompute-on-read") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-pruned", withEmbeddings = false)
    Files.delete(Paths.get(s"$nat/documents.ids.txt")) // prune drops vectors; ids may remain or not
    val meta = LeannImport.importIndex(spark, nat, s"$wh/imported-pruned")
    assert(meta.isPruned && meta.passageCount == 4)
    assert(!Files.exists(Paths.get(s"$wh/imported-pruned/embeddings")))
    val r = Index.search(spark, s"$wh/imported-pruned", "vector retrieval", provider, topK = 2)
      .selectExpr("id").as[String].collect()
    assert(r.length == 2)
  }

  test("ragged embeddings file fails loudly, never imports a prefix") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-ragged", truncateBytes = 3)
    val e = intercept[IllegalArgumentException] {
      LeannImport.importIndex(spark, nat, s"$wh/imported-ragged")
    }
    assert(e.getMessage.contains("not a multiple"))
  }

  test("ids/rows count mismatch fails loudly — a wrong mapping must not land") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-mismatch", dropLastId = true)
    val e = intercept[IllegalArgumentException] {
      LeannImport.importIndex(spark, nat, s"$wh/imported-mismatch")
    }
    assert(e.getMessage.contains("refusing to import"))
  }

  test("exportNative is the exact inverse: export -> import round-trips the index") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = s"$wh/native-exported"
    LeannImport.exportNative(spark, directDir, nat)
    // the reference's byte contract: flat f32 rows, count * dims * 4
    val embBytes = Files.size(Paths.get(s"$nat/documents.embeddings"))
    assert(embBytes == 4L * 32 * 4, s"embeddings file is $embBytes bytes")
    val ids = Files.readString(Paths.get(s"$nat/documents.ids.txt")).split("\n")
    assert(ids.length == 4 && ids.sorted.sameElements(ids), "ids sorted, one per row")
    // offset index points each id at its own jsonl line
    val idx = graft.util.Json.parseObject(
      Files.readString(Paths.get(s"$nat/documents.passages.idx.json")))
    val jsonlBytes = Files.readAllBytes(Paths.get(s"$nat/documents.passages.jsonl"))
    idx.foreach { case (id, o) =>
      val lineStart = new String(jsonlBytes, o.asInstanceOf[Long].toInt,
        math.min(200, jsonlBytes.length - o.asInstanceOf[Long].toInt), "UTF-8")
      assert(lineStart.startsWith("{\"id\":\"" + id + "\""), s"offset of $id points at: ${lineStart.take(40)}")
    }
    // and the round trip searches identically to the original
    val meta = LeannImport.importIndex(spark, nat, s"$wh/reimported")
    assert(meta.passageCount == 4 && meta.dimensions == 32 && !meta.isPruned)
    val a = Index.search(spark, directDir, "vector retrieval", provider, topK = 3)
      .selectExpr("id", "score").as[(String, Double)].collect().toSeq
    val b = Index.search(spark, s"$wh/reimported", "vector retrieval", provider, topK = 3)
      .selectExpr("id", "score").as[(String, Double)].collect().toSeq
    assert(a == b, s"round-tripped search diverged: $a vs $b")
  }

  test("imported index accepts incremental update — the full migration workflow") {
    // The reason the importer exists: migrate once, keep working. An
    // imported index must behave exactly like a built one for update
    // (append new docs without re-embedding the old), search, and the
    // BM25 stats merge.
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-upd")
    val imp = s"$wh/imported-upd"
    LeannImport.importIndex(spark, nat, imp)
    val more = Seq(("catalyst rewrites logical plans into physical ones", "new.md"))
      .toDF("text", "source")
    val meta2 = Index.update(more, imp, provider, strategy = "simple")
    assert(meta2.passageCount == 5)
    // the invariant that matters: updated-imported == updated-direct,
    // row for row, on every search mode
    Index.update(more, directDir, provider, strategy = "simple")
    for (hybrid <- Seq(false, true); q <- Seq("catalyst logical plans", "vector retrieval")) {
      val a = Index.search(spark, directDir, q, provider, topK = 5, hybrid = hybrid)
        .selectExpr("id", "score").as[(String, Double)].collect().toSeq
      val b = Index.search(spark, imp, q, provider, topK = 5, hybrid = hybrid)
        .selectExpr("id", "score").as[(String, Double)].collect().toSeq
      assert(a == b, s"post-update search('$q', hybrid=$hybrid) diverged: $a vs $b")
      assert(a.exists(_._1.startsWith("new.md")), s"updated doc absent from '$q' top-5")
    }
    // dimension guard still fires on an imported index
    val e = intercept[IllegalArgumentException] {
      Index.update(more, imp, new HashEmbedder(16), strategy = "simple")
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getMessage.contains("Embedding dimension"))
  }

  test("locate: two native bases in one directory is ambiguous and refuses") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-two-bases")
    // a second base: pairing base A's passages with base B's vectors
    // would pass every count guard while attaching wrong embeddings
    Files.writeString(Paths.get(s"$nat/other.passages.jsonl"), "")
    val e = intercept[IllegalArgumentException] {
      LeannImport.locate(nat)
    }
    assert(e.getMessage.contains("2 native indexes"))
  }

  test("locate: siblings resolve by stem, stray *.txt files are not ids") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-stray")
    Files.writeString(Paths.get(s"$nat/centroids.txt"), "not ids\n")
    val layout = LeannImport.locate(nat)
    assert(layout.idsTxt.exists(_.endsWith("documents.ids.txt")))
    assert(layout.metaPath.exists(_.endsWith("documents.leann.meta.json")))
  }

  test("embeddings without ids.txt fails loudly instead of silently importing as pruned") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-noids")
    Files.delete(Paths.get(s"$nat/documents.ids.txt"))
    val e = intercept[RuntimeException] {
      LeannImport.importIndex(spark, nat, s"$wh/imported-noids")
    }
    assert(e.getMessage.contains("no matching ids.txt"))
  }

  test("multi-split embeddings file: row order survives splitting (the 100 TB path)") {
    // At scale the flat-f32 blob is GBs and Hadoop splits it across
    // executors; zipWithIndex's index must still equal the file row
    // number across split boundaries or every id maps to the wrong
    // vector. Force many splits on a small file and verify the mapping
    // end to end against directly-computed expectations.
    val dims = 8
    val n = 50000 // 1.6 MB at 32 B/row
    val dir = Files.createTempDirectory("graft-split").toString
    val bb = ByteBuffer.allocate(n * dims * 4).order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n; d <- 0 until dims) bb.putFloat(i * 1000f + d)
    Files.write(Paths.get(s"$dir/big.embeddings"), bb.array())
    Files.writeString(Paths.get(s"$dir/big.ids.txt"),
      (0 until n).map(i => s"doc-$i").mkString("\n"))
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(conf.get(key))
    conf.setLong(key, 64 * 1024) // 64 KB splits -> ~25 splits
    try {
      val out = graft.sources.LeannImport.readEmbeddings(
        spark, s"$dir/big.embeddings", s"$dir/big.ids.txt", dims)
      assert(out.rdd.getNumPartitions > 1 || n * dims * 4 < 64 * 1024,
        "split forcing failed — the test would not exercise multi-split ordering")
      val rows = out.as[(String, Array[Float])].collect()
      assert(rows.length == n)
      rows.foreach { case (id, vec) =>
        val i = id.stripPrefix("doc-").toInt
        assert(vec(0) == i * 1000f && vec(dims - 1) == i * 1000f + (dims - 1),
          s"row $id got someone else's vector: ${vec.take(2).toSeq}")
      }
    } finally {
      old match { case Some(v) => conf.set(key, v); case None => conf.unset(key) }
    }
  }

  test("embeddings file without a usable dimension count demands --dims") {
    Index.build(docs, directDir, provider, strategy = "simple")
    val nat = writeNativeLayout(s"$wh/native-nodims")
    Files.delete(Paths.get(s"$nat/documents.leann.meta.json"))
    val e = intercept[RuntimeException] {
      LeannImport.importIndex(spark, nat, s"$wh/imported-nodims")
    }
    assert(e.getMessage.contains("--dims"))
    // and the override path works end to end
    val meta = LeannImport.importIndex(spark, nat, s"$wh/imported-dims32",
      dimsOverride = Some(32))
    assert(meta.dimensions == 32 && meta.passageCount == 4)
  }
}
