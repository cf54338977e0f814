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

  /** Code-symbol detection regexes across six language families
    * (ref query.rs:12-31); group 1 captures the symbol name. */
  val symbolPatterns: Seq[String] = Seq(
    """(?:pub\s+)?(?:async\s+)?fn\s+(\w+)""",
    """(?:pub\s+)?struct\s+(\w+)""",
    """(?:pub\s+)?enum\s+(\w+)""",
    """(?:pub\s+)?trait\s+(\w+)""",
    """(?:async\s+)?def\s+(\w+)""",
    """class\s+(\w+)""",
    """(?:async\s+)?function\s+(\w+)""",
    """(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?\(""",
    """func\s+(?:\([^)]+\)\s+)?(\w+)""",
    """type\s+(\w+)\s+(?:struct|interface)""",
    """(?:public|private|protected)?\s*(?:static\s+)?(?:class|interface)\s+(\w+)""")

  /** Code-symbol extraction ranking (A6, `extract_code_symbols`,
    * query.rs:34-56): capture across all patterns, drop short/test_/_
    * names, rank by frequency (ties: symbol asc, where the reference is
    * HashMap-order nondeterministic). */
  def codeSymbols(passages: DataFrame, textCol: String, maxSymbols: Int): DataFrame = {
    val captured = symbolPatterns
      .map(p => regexp_extract_all(col(textCol), lit(p), lit(1)))
      .reduce(concat(_, _))
    passages
      .select(explode(captured).as("symbol"))
      .filter(length(col("symbol")) >= 3)
      .filter(!col("symbol").startsWith("test_") && !col("symbol").startsWith("_"))
      .groupBy("symbol")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("symbol"))
      .limit(maxSymbols)
  }
}
