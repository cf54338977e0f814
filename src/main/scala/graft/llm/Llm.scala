package graft.llm

import org.apache.spark.sql.SparkSession

import graft.embedding.EmbeddingProvider
import graft.pipeline.Index

/** RAG / agent layer (SURVEY §2.11): thin driver-side orchestration over
  * the Spark query layer. LLM calls are service I/O behind a trait —
  * never a data-plane operator. Mirrors the reference's `ask`
  * (`src/cli/ask.rs:157-198`) and ReAct loop (`src/cli/react.rs:88-171`),
  * including its simulated provider (`src/llm/simulated.rs`) so the
  * whole path is testable offline.
  */
trait LlmProvider extends Serializable {
  def modelName: String
  def generate(prompt: String): String
}

object LlmProvider {

  /** Provider dispatch mirroring the reference's `LlmType` factory
    * (`src/llm/mod.rs:33-54`), with the same env-var fallbacks:
    * OpenAI key from $OPENAI_API_KEY, base URL from $OPENAI_BASE_URL
    * (openai.rs); Ollama host from $GRAFT_OLLAMA_HOST then
    * $OLLAMA_HOST then localhost:11434 (ollama.rs, whose app-specific
    * var is LEANN_OLLAMA_HOST); Anthropic key from $ANTHROPIC_API_KEY.
    */
  def create(providerType: String, modelName: String,
             baseUrl: Option[String] = None,
             apiKey: Option[String] = None): LlmProvider =
    providerType match {
      case "simulated" => new SimulatedLlm(modelName)
      case "openai" =>
        val key = apiKey.orElse(sys.env.get("OPENAI_API_KEY"))
        require(key.isDefined || baseUrl.isDefined,
          "OpenAI provider needs an api key ($OPENAI_API_KEY) or an explicit base_url")
        new OpenAiLlm(modelName,
          baseUrl.orElse(sys.env.get("OPENAI_BASE_URL"))
            .getOrElse("https://api.openai.com/v1"),
          apiKey = key)
      case "ollama" =>
        new OllamaLlm(modelName,
          host = baseUrl.orElse(sys.env.get("GRAFT_OLLAMA_HOST"))
            .orElse(sys.env.get("OLLAMA_HOST"))
            .getOrElse("http://localhost:11434"))
      case "anthropic" =>
        new AnthropicLlm(modelName,
          baseUrl = baseUrl.getOrElse("https://api.anthropic.com"),
          apiKey = apiKey.orElse(sys.env.get("ANTHROPIC_API_KEY")))
      case other => throw new IllegalArgumentException(
        s"unknown llm provider '$other' (supported: simulated, openai, ollama, anthropic)")
    }
}

/** Deterministic canned-response provider (ref simulated.rs:17-56):
  * echoes the question found after "Question:" and acknowledges context
  * when the prompt carries retrieved passages. */
final class SimulatedLlm(val modelName: String = "simulated") extends LlmProvider {
  override def generate(prompt: String): String = {
    val question =
      if (prompt.contains("Question:"))
        prompt.split("Question:", 2)(1).linesIterator.nextOption()
          .map(_.trim).filter(_.nonEmpty).getOrElse("your question")
      else "your question"
    val hasContext = prompt.contains("Context:") || prompt.contains("context")
    if (hasContext)
      s"""Based on the provided context, here is my response to "$question": the retrieved passages cover this topic. (simulated, model: $modelName)"""
    else
      s"""I understand you're asking about "$question". (simulated, model: $modelName)"""
  }
}

object Rag {

  /** `ask`: retrieve top-k, assemble the numbered-context prompt
    * (ask.rs:177-194), generate. */
  def ask(spark: SparkSession, indexDir: String, query: String,
          embedder: EmbeddingProvider, llm: LlmProvider, topK: Int = 5): String = {
    val results = Index.search(spark, indexDir, query, embedder, topK).collect()
    if (results.isEmpty) return "No relevant passages found."
    val context = results.zipWithIndex
      .map { case (r, i) => s"[${i + 1}] ${r.getString(2)}" }
      .mkString("\n\n")
    val prompt =
      s"""Here is some retrieved context that might help answer your question:
         |
         |$context
         |
         |Question: $query
         |
         |Please provide the best answer you can based on this context and your knowledge.""".stripMargin
    llm.generate(prompt)
  }
}

/** ReAct agent (react.rs:88-171): Thought/Action loop with `search(q)`
  * and `finish(a)` tools, search observations fed back into the history,
  * bounded by maxSteps. */
final class ReactAgent(spark: SparkSession, indexDir: String,
                       embedder: EmbeddingProvider, llm: LlmProvider,
                       topK: Int = 3, maxSteps: Int = 5) {

  import ReactAgent.{Action, Finish, Search}

  /** Action parser (react.rs:173-218): bare `search(...)`/`finish(...)`
    * first, then `Action:`-prefixed lines. */
  def parseAction(response: String): Option[Action] = {
    def arg(s: String, from: Int, lastParen: Boolean): Option[String] = {
      val rest = s.substring(from)
      val end = if (lastParen) rest.lastIndexOf(')') else rest.indexOf(')')
      if (end < 0) None
      else Some(rest.substring(0, end).trim.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'"))
    }
    val si = response.indexOf("search(")
    if (si >= 0) return arg(response, si + 7, lastParen = false).map(Search)
    val fi = response.indexOf("finish(")
    if (fi >= 0) return arg(response, fi + 7, lastParen = true).map(Finish)
    None
  }

  private def executeSearch(query: String): String = {
    val results = Index.search(spark, indexDir, query, embedder, topK).collect()
    if (results.isEmpty) "No relevant results found."
    else results.zipWithIndex.map { case (r, i) =>
      val text = r.getString(2)
      val snippet = if (text.length > 300) text.take(300) + "..." else text
      s"[${i + 1}] $snippet"
    }.mkString("\n")
  }

  def run(query: String): String = {
    val sb = new StringBuilder(
      s"""You are a helpful assistant that answers questions using available tools.
         |Available tools: search(query), finish(answer)
         |
         |Question: $query
         |
         |Let me search for relevant information.
         |""".stripMargin)
    var step = 0
    while (step < maxSteps) {
      val response = llm.generate(sb.toString)
      sb.append(response).append('\n')
      parseAction(response) match {
        case Some(Search(q)) =>
          sb.append(s"Observation: ${executeSearch(q)}\n\n")
        case Some(Finish(answer)) =>
          return answer
        case None =>
          sb.append("Please use search(query) or finish(answer).\n")
      }
      step += 1
    }
    "Maximum steps reached. " + llm.generate(sb.toString + "\nQuestion: " + query)
  }
}

object ReactAgent {
  /** Agent actions — in the companion so pattern matches need no outer
    * instance reference (the inner-ADT type-test warning). */
  sealed trait Action
  final case class Search(query: String) extends Action
  final case class Finish(answer: String) extends Action
}
