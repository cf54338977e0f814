package graft

import org.apache.spark.sql.SparkSession

/** Full-pipeline manual drive (Test/runMain): ingest a real source tree,
  * build an index (auto chunking → AST for .scala), search, ask, react. */
object E2eDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = if (args.nonEmpty) args(0) else "/root/repo/src/main/scala"
    val docs = graft.sources.FileIngest.readDocuments(spark, root)
    println(s"INGESTED ${docs.count()} files")
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString + "/idx"
    val provider = new graft.embedding.HashEmbedder(32)
    val meta = graft.pipeline.Index.build(docs, dir, provider, strategy = "auto")
    println(s"BUILT passages=${meta.passageCount} dims=${meta.dimensions}")
    val chunkTypes = spark.read.parquet(s"$dir/passages")
      .groupBy("metadata.chunk_type").count().collect()
      .map(r => s"${r.get(0)}=${r.getLong(1)}").mkString(" ")
    println(s"CHUNK_TYPES $chunkTypes")
    val hits = graft.pipeline.Index.search(spark, dir, "bm25 scoring statistics",
      provider, topK = 3, hybrid = true).collect()
    println("SEARCH_TOP " + hits.map(r => r.getString(3)).mkString(" | "))
    val sym = graft.operators.Expansion.codeSymbols(docs, "text", 8).collect()
      .map(r => s"${r.getString(0)}(${r.getLong(1)})").mkString(" ")
    println(s"SYMBOLS $sym")
    graft.pipeline.Index.buildIvf(spark, dir, numClusters = 8)
    graft.pipeline.Index.buildPq(spark, dir, m = 8, k = 16)
    val annHits = graft.pipeline.Index.searchAnn(spark, dir,
      "bm25 scoring statistics", provider, topK = 3).collect()
    println("ANN_TOP " + annHits.map(r => r.getString(3)).mkString(" | "))
    val answer = graft.llm.Rag.ask(spark, dir, "how are bm25 scores computed",
      provider, new graft.llm.SimulatedLlm("drive"), topK = 3)
    println("ASK " + answer.take(120))
    spark.stop()
  }
}
