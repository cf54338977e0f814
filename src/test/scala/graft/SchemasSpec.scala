package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.IndexMeta

class SchemasSpec extends AnyFunSuite {

  test("IndexMeta JSON round-trips templates with newlines/quotes/controls") {
    val meta = IndexMeta(version = 1, backendName = "spark-exact",
      embeddingModel = "hash-64", embeddingMode = "provider",
      dimensions = 64, passageCount = 42L,
      isRecompute = false, isPruned = true,
      queryPromptTemplate = "Represent this sentence:\n\t\"{}\"\r\n",
      buildPromptTemplate = "passage \\n literal backslash-n: \\n {}")
    val back = IndexMeta.fromJson(meta.toJson)
    assert(back == meta)
  }

  test("IndexMeta.fromJson unescapes uXXXX escape sequences") {
    // Escape built by concatenation so the Scala lexer never sees a
    // backslash-u in source.
    val esc = "a\\" + "u0007b"
    val json = s"""{"version":1,"backend_name":"b","embedding_model":"m",
      "embedding_mode":"p","dimensions":4,"passage_count":1,
      "is_recompute":false,"is_pruned":false,
      "query_prompt_template":"$esc","build_prompt_template":""}"""
    assert(IndexMeta.fromJson(json).queryPromptTemplate == "a" + 7.toChar + "b")
  }
}
