package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("missing file yields all defaults") {
    val c = Config.loadFrom(Files.createTempDirectory("graft-cfg").resolve("nope.toml"))
    assert(c == Config())
    assert(c.build.chunkSize == 256 && c.build.chunkOverlap == 128)
    assert(c.embedding.dims == 64)
  }

  test("toml subset: sections, strings, ints, arrays, comments") {
    val c = Config.fromToml(
      """# top comment
        |[embedding]
        |provider = "hash"   # trailing comment
        |dims = 32
        |batch_size = 50
        |
        |[build]
        |chunk_size = 100
        |chunk_overlap = 20
        |max_file_size_kb = 2048
        |file_types = ["md", "scala"]
        |
        |[llm]
        |provider = "ollama"
        |model = "llama3"
        |base_url = "http://gpu-box:11434"
        |""".stripMargin)
    assert(c.embedding.dims == 32 && c.embedding.batchSize.contains(50))
    assert(c.build.chunkSize == 100 && c.build.chunkOverlap == 20)
    assert(c.build.maxFileSizeKb == 2048L)
    assert(c.build.fileTypes.contains(Seq("md", "scala")))
    assert(c.llm.provider == "ollama" && c.llm.model.contains("llama3"))
    assert(c.llm.baseUrl.contains("http://gpu-box:11434"))
  }

  test("partial file keeps defaults for unset keys; '#' inside strings kept") {
    val c = Config.fromToml(
      """[build]
        |chunk_size = 64
        |[embedding]
        |provider = "hash#1"
        |""".stripMargin)
    assert(c.build.chunkSize == 64 && c.build.chunkOverlap == 128)
    assert(c.embedding.provider == "hash#1")
  }

  test("example round-trips and init refuses to clobber without force") {
    val dir = Files.createTempDirectory("graft-cfg")
    val p = dir.resolve("config.toml")
    assert(Config.init(p, force = false).isRight)
    val c = Config.loadFrom(p)
    assert(c == Config()) // example mirrors the defaults
    assert(Config.init(p, force = false).isLeft)
    assert(Config.init(p, force = true).isRight)
    assert(Config.show(c, p).contains("chunk_size = 256"))
  }
}
