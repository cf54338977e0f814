package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Query expansion (ref `src/index/query.rs`): harvest frequent
  * non-stopword, non-code-like terms from the BM25-top passages of a
  * short query, to append to it.
  *
  * Term filter parity with `extract_key_terms` (query.rs:85-122):
  * length >= 4, not a stopword, not all-numeric, not code-like (mixed
  * digits+letters, or a code keyword; underscores cannot survive the
  * tokenizer split). Ranking is frequency descending; the reference
  * leaves ties in HashMap order — here ties break on the term itself so
  * results are deterministic and oracle-checkable.
  */
object Expansion {

  /** Key expansion terms over a set of passages. */
  def keyTerms(passages: DataFrame, textCol: String, queryWords: Seq[String],
               maxTerms: Int): DataFrame = {
    val stop = TextFunctions.stopwords.map(lit)
    val kw = TextFunctions.codeKeywords.map(lit)
    passages
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= 4)
      .filter(!col("term").isin(stop: _*))
      .filter(!col("term").rlike("^[0-9]+$"))
      .filter(!(col("term").rlike("[0-9]") && col("term").rlike("[a-z]")))
      .filter(!col("term").isin(kw: _*))
      .filter(if (queryWords.isEmpty) lit(true)
              else !col("term").isin(queryWords.map(lit): _*))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("term"))
      .limit(maxTerms)
  }

  /** Expansion terms for a query: BM25 top-k passages → key terms not
    * already present in the query. The ≤3-word auto-expansion gate is
    * `shouldExpand`. */
  def forQuery(docs: DataFrame, idCol: String, textCol: String,
               query: String, topK: Int = 5, maxTerms: Int = 10): DataFrame = {
    val top = BM25.topK(docs, idCol, textCol, query, topK).select(col("id"))
    val passages = docs.join(top, docs(idCol) === top("id"), "left_semi")
    keyTerms(passages, textCol, query.toLowerCase.split("\\s+").toSeq, maxTerms)
  }

  /** `should_expand` (query.rs:168-171): short queries only. */
  def shouldExpand(query: String): Boolean =
    query.split("\\s+").count(_.nonEmpty) <= 3
}
