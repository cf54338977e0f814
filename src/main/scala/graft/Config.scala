package graft

import java.nio.file.{Files, Path, Paths}

/** Configuration-file surface mirroring the reference
  * (`src/config.rs:1-130`, `src/cli/config_cmd.rs`): a TOML file with
  * `[embedding]` and `[build]` sections, flags always winning over file
  * values, file values over defaults. Location:
  * `$GRAFT_CONFIG_PATH`, else `~/.config/graft/config.toml`.
  *
  * The parser covers the TOML subset the surface needs — `[section]`
  * headers, `key = value` with quoted strings, integers, booleans and
  * flat string arrays, `#` comments — with no dependency.
  */
final case class EmbeddingConfig(
    provider: String = "hash",
    dims: Int = 64,
    batchSize: Option[Int] = None,
    model: Option[String] = None,
    baseUrl: Option[String] = None,
    // provider = "local": directory holding config.json + tokenizer.json
    // (or vocab.txt) + model.safetensors (ref candle.rs:36-42 model_path)
    modelPath: Option[String] = None)

final case class BuildConfig(
    chunkSize: Int = 256,
    chunkOverlap: Int = 128,
    maxFileSizeKb: Long = 1024,
    fileTypes: Option[Seq[String]] = None)

/** `[llm]` section (ref `src/llm/mod.rs:11-17` LlmType): provider is
  * one of simulated/openai/ollama/anthropic; api keys come from env
  * vars, never the file. */
final case class LlmConfig(
    provider: String = "simulated",
    model: Option[String] = None,
    baseUrl: Option[String] = None)

final case class Config(
    embedding: EmbeddingConfig = EmbeddingConfig(),
    build: BuildConfig = BuildConfig(),
    llm: LlmConfig = LlmConfig())

object Config {

  def configPath: Path =
    sys.env.get("GRAFT_CONFIG_PATH").map(Paths.get(_)).getOrElse(
      Paths.get(sys.props.getOrElse("user.home", "."), ".config", "graft", "config.toml"))

  /** Load from the default location; missing file → all defaults. */
  def load(): Config = loadFrom(configPath)

  def loadFrom(path: Path): Config =
    if (!Files.exists(path)) Config()
    else fromToml(Files.readString(path))

  def fromToml(text: String): Config = {
    val t = parseToml(text)
    def str(sec: String, k: String): Option[String] =
      t.getOrElse(sec, Map.empty).get(k).collect { case s: String => s }
    def long(sec: String, k: String): Option[Long] =
      t.getOrElse(sec, Map.empty).get(k).collect { case l: Long => l }
    def int(sec: String, k: String): Option[Int] = long(sec, k).map(_.toInt)
    def arr(sec: String, k: String): Option[Seq[String]] =
      t.getOrElse(sec, Map.empty).get(k).collect {
        case xs: Seq[_] => xs.map(String.valueOf) }
    Config(
      embedding = EmbeddingConfig(
        provider = str("embedding", "provider").getOrElse("hash"),
        dims = int("embedding", "dims").getOrElse(64),
        batchSize = int("embedding", "batch_size"),
        model = str("embedding", "model"),
        baseUrl = str("embedding", "base_url"),
        modelPath = str("embedding", "model_path")),
      build = BuildConfig(
        chunkSize = int("build", "chunk_size").getOrElse(256),
        chunkOverlap = int("build", "chunk_overlap").getOrElse(128),
        // stays Long end-to-end: a multi-TB cap must not wrap through Int
        maxFileSizeKb = long("build", "max_file_size_kb").getOrElse(1024L),
        fileTypes = arr("build", "file_types")),
      llm = LlmConfig(
        provider = str("llm", "provider").getOrElse("simulated"),
        model = str("llm", "model"),
        baseUrl = str("llm", "base_url")))
  }

  /** `section -> key -> value` where value is String | Long | Boolean |
    * Seq[String]. */
  def parseToml(text: String): Map[String, Map[String, Any]] = {
    var out = Map.empty[String, Map[String, Any]]
    var section = ""
    text.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
        } else line.indexOf('=') match {
          case -1 => // tolerate junk lines, like serde's lenient defaults
          case i =>
            val k = line.substring(0, i).trim
            val v = parseValue(line.substring(i + 1).trim)
            out += (section -> (out.getOrElse(section, Map.empty) + (k -> v)))
        }
      }
    }
    out
  }

  private def stripComment(line: String): String = {
    var inStr = false
    val b = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      val c = line.charAt(i)
      if (inStr && c == '\\' && i + 1 < line.length) {
        // escaped char inside a string (e.g. \") never toggles inStr
        b += c; b += line.charAt(i + 1); i += 1
      }
      else if (c == '"') { inStr = !inStr; b += c }
      else if (c == '#' && !inStr) done = true
      else b += c
      i += 1
    }
    b.result()
  }

  private def parseValue(v: String): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case "true" => true
    case "false" => false
    case s if s.startsWith("[") && s.endsWith("]") =>
      s.substring(1, s.length - 1).split(',').toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map(x => if (x.startsWith("\"") && x.endsWith("\"")) x.substring(1, x.length - 1) else x)
    case s => try java.lang.Long.parseLong(s) catch { case _: NumberFormatException => s }
  }

  /** Reference-style `config show` rendering (`config_cmd.rs:33-61`). */
  def show(c: Config, path: Path): String = {
    val header =
      if (Files.exists(path)) s"Config file: $path"
      else s"Config file: $path (not found, using defaults)"
    val batch = c.embedding.batchSize.map(b => s"batch_size = $b\n").getOrElse("")
    val types = c.build.fileTypes
      .map(ts => ts.map(t => "\"" + t + "\"").mkString("file_types = [", ", ", "]\n"))
      .getOrElse("")
    s"""$header
       |
       |[embedding]
       |provider = "${c.embedding.provider}"
       |dims = ${c.embedding.dims}
       |$batch
       |[build]
       |chunk_size = ${c.build.chunkSize}
       |chunk_overlap = ${c.build.chunkOverlap}
       |max_file_size_kb = ${c.build.maxFileSizeKb}
       |$types
       |[llm]
       |provider = "${c.llm.provider}"
       |${c.llm.model.map(m => "model = \"" + m + "\"\n").getOrElse("")}""".stripMargin
  }

  val exampleToml: String =
    """# graft configuration (see: graft.Cli config show)
      |
      |[embedding]
      |provider = "hash"     # or http / ollama / gemini / local
      |dims = 64             # 0 with provider="http" = auto-probe
      |# model = "text-embedding-3-small"
      |# base_url = "http://localhost:8080/v1"   # $GRAFT_EMBED_API_KEY for auth
      |# model_path = "/models/all-MiniLM-L6-v2" # provider="local": safetensors dir
      |# batch_size = 100
      |
      |[build]
      |chunk_size = 256
      |chunk_overlap = 128
      |max_file_size_kb = 1024
      |# file_types = ["md", "txt", "rs", "scala"]
      |
      |[llm]
      |provider = "simulated"  # or openai / ollama / anthropic
      |# model = "gpt-4o-mini"
      |# base_url = "http://localhost:11434"  # keys via $OPENAI_API_KEY / $ANTHROPIC_API_KEY
      |""".stripMargin

  /** Write the example config; refuses to overwrite unless forced. */
  def init(path: Path, force: Boolean): Either[String, Path] =
    if (Files.exists(path) && !force)
      Left(s"Config file already exists at $path. Use --force to overwrite.")
    else {
      // a bare relative filename has no parent directory to create
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.writeString(path, exampleToml)
      Right(path)
    }
}
