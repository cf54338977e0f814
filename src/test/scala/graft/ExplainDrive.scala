package graft

import org.apache.spark.sql.SparkSession

/** Plan audit harness: prints formatted physical plans for the queries
  * whose shape matters at scale (run via Test/runMain). */
object ExplainDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q3_join", "knn_filtered", "knn_ivf", "knn_ivf_plan",
        "knn_ivf_quantized", "knn_quantized", "filter_dsl", "bm25_topk",
        "dedup_simhash", "dedup_jaccard", "events_asof_order",
        "events_asof_native", "range_join_transit",
        "knn_pq", "knn_pq_stored", "quality_gopher", "boilerplate_ngrams",
        "pii_scrub", "decontaminate", "knn_maxsim", "knn_hamming",
        "corpus_top_terms",
        "pack_sequences", "sample_mixture", "shuffle_export",
        "quality_lm", "quality_repetition",
        "dedup_semantic", "sample_stratified", "corpus_divergence",
        "quality_nb", "bpe_pair_stats", "q_cube", "q_window_range",
        "dedup_winnow", "sample_mixture_temp", "sample_dsir",
        "quality_ppl_buckets", "bpe_encode", "tokenize_pack",
        "embedding_drift", "knn_hard_negatives", "dedup_span_removal",
        "knn_graph_lsh", "graph_pagerank_watched", "graph_triangles_capped",
        "dedup_embed", "dedup_containment", "chunk_ast", "graph_build")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
