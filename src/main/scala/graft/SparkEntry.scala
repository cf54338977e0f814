package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Dedup, Expansion, Graph, Knn}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB SQL in `oracleSql` (the
  * correctness gate hash-compares the two result sets).
  *
  * Determinism rules shared by every query/oracle pair:
  *   - money aggregates go through exact DECIMAL(18,2) sums, cast to
  *     DOUBLE only at the end (bit-identical across engines);
  *   - vector/BM25 scores are computed in Double and rounded to 6
  *     decimals *before* ranking, with id tie-breaks, so top-k sets match;
  *   - rows are explicitly ordered where a LIMIT exists.
  */
object SparkEntry {
  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Hybrid
    * vector+BM25 search — the reference's headline capability. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("hybrid_search")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md SS2, split into
    * per-family registries in r15 (the single file had grown to 6k
    * lines); key sets are disjoint by construction (each family owns
    * its name prefixes) and the aggregate is order-independent. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryRelational.queries ++ EntrySearch.queries ++ EntryKnn.queries ++
      EntryGraph.queries ++ EntryDedup.queries ++ EntryText.queries ++
      EntryExport.queries

  def oracleSql: Map[String, String] =
    EntryRelational.oracle ++ EntrySearch.oracle ++ EntryKnn.oracle ++
      EntryGraph.oracle ++ EntryDedup.oracle ++ EntryText.oracle ++
      EntryExport.oracle
}
