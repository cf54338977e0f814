package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CodeChunker, SimpleChunker, SmartChunker}

class SimpleChunkerSpec extends AnyFunSuite {

  test("short text is a single unmodified chunk") {
    val c = new SimpleChunker(256, 128)
    val out = c.chunk("hello world", "a.txt")
    assert(out.map(_.text) == Seq("hello world"))
    assert(out.head.metadata.chunk_index.contains(0))
    assert(out.head.metadata.chunk_type == "simple")
    assert(out.head.id == "a.txt#0")
  }

  test("word-boundary split with overlap (golden)") {
    // sizeChars=8, overlapChars=4 over "aaa bbb ccc ddd"
    val c = new SimpleChunker(2, 1)
    val out = c.chunk("aaa bbb ccc ddd", "t")
    assert(out.map(_.text) == Seq("aaa bbb", "bbb", "ccc ddd"))
    assert(out.map(_.metadata.chunk_index.get) == Seq(0, 1, 2))
  }

  test("text with no whitespace still terminates and covers content") {
    val c = new SimpleChunker(2, 1)
    val text = "x" * 100
    val out = c.chunk(text, "t")
    assert(out.nonEmpty)
    assert(out.forall(_.text.nonEmpty))
    assert(out.head.text == "x" * 8)
  }

  test("all-whitespace long text terminates") {
    val c = new SimpleChunker(2, 1)
    val out = c.chunk(" " * 100, "t")
    assert(out.isEmpty) // every window trims to empty
  }

  test("property: terminates, chunks non-empty, bounded, deterministic") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh0123 \n\t  éß中"
    val c = new SimpleChunker(4, 2) // 16-char windows, 8-char overlap
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(400)
      val text = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val out = c.chunk(text, "s")
      if (text.length > 16) {
        assert(out.forall(_.text.nonEmpty), s"empty chunk for ${text.take(40)}…")
        assert(out.forall(_.text.length <= 16))
      }
      assert(out == c.chunk(text, "s"))
      // every non-whitespace character appears in some chunk
      val chars = out.flatMap(_.text).toSet
      assert(text.filterNot(_.isWhitespace).toSet.subsetOf(chars),
        s"lost characters in ${text.take(60)}…")
    }
  }
}

class CodeChunkerSpec extends AnyFunSuite {

  test("detects rust functions (ref ast.rs:426-441)") {
    val code =
      """fn hello_world() {
        |    println!("Hello");
        |}
        |
        |pub async fn async_func() -> Result<()> {
        |    Ok(())
        |}""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "test.rs")
    val fns = out.filter(_.metadata.block_type.contains("function"))
    assert(fns.map(_.metadata.name.get).toSet == Set("hello_world", "async_func"))
    assert(fns.forall(_.metadata.language.contains("rust")))
    assert(fns.head.text.contains("fn hello_world"))
  }

  test("detects python classes and methods by indentation (ref ast.rs:443-465)") {
    val code =
      """class MyClass:
        |    def method_one(self):
        |        pass
        |
        |    def method_two(self):
        |        return 42
        |
        |def standalone():
        |    pass""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "test.py")
    val names = out.flatMap(_.metadata.name)
    assert(names.contains("MyClass"))
    assert(names.contains("standalone"))
  }

  test("oversized block splits into parts and terminates") {
    val body = (1 to 200).map(i => s"    let line_$i = compute($i);").mkString("\n")
    val code = s"fn big() {\n$body\n}"
    val out = new CodeChunker(64, 32).chunk(code, "big.rs") // 256-char pieces
    assert(out.length > 1)
    assert(out.forall(_.metadata.chunk_type == "ast"))
    val parts = out.flatMap(_.metadata.part)
    assert(parts == parts.sorted)
  }

  test("gap between blocks becomes a context chunk") {
    val code =
      """fn first() {
        |    a();
        |}
        |// an explanatory comment block between functions
        |// that is long enough to matter here
        |fn second() {
        |    b();
        |}""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "gap.rs")
    assert(out.exists(_.metadata.chunk_type == "context"))
    // ordered by start line
    val starts = out.flatMap(_.metadata.start_line)
    assert(starts == starts.sorted)
  }

  test("detects go funcs and type declarations") {
    val code =
      """func NewServer(addr string) *Server {
        |    return &Server{addr: addr}
        |}
        |
        |type Config struct {
        |    Addr string
        |}
        |
        |type Handler interface {
        |    Serve()
        |}""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "main.go")
    val byType = out.flatMap(c => c.metadata.block_type.map(_ -> c.metadata.name.get))
    assert(byType.contains("function" -> "NewServer"))
    assert(byType.contains("struct" -> "Config"))
    assert(byType.contains("interface" -> "Handler"))
  }

  test("detects javascript functions, classes and arrows") {
    val code =
      """function render(props) {
        |  return props;
        |}
        |class Widget {
        |  draw() {}
        |}
        |const handler = async (ev) => {
        |  console.log(ev);
        |};""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "app.js")
    val names = out.flatMap(_.metadata.name).toSet
    assert(names.contains("render"))
    assert(names.contains("Widget"))
    assert(names.contains("handler"))
  }

  test("detects java classes and ruby indentation blocks") {
    val j = new CodeChunker(256, 128).chunk(
      "public class Engine {\n  private int x;\n}\n", "Engine.java")
    assert(j.exists(c => c.metadata.name.contains("Engine") &&
      c.metadata.block_type.contains("class")))

    val r = new CodeChunker(256, 128).chunk(
      """class Parser
        |  def parse(line)
        |    line.split
        |  end
        |end""".stripMargin, "parser.rb")
    // the inner def overlaps the class block, so overlap-dedup keeps only
    // the enclosing class (ref ast.rs:175-190); its text covers the method
    val cls = r.find(_.metadata.name.contains("Parser")).get
    assert(cls.text.contains("def parse"))
    assert(!r.exists(_.metadata.name.contains("parse")))
  }

  test("brace-less fallback: block without closing brace caps at 50 lines") {
    val code = "fn broken(a: u32) {\n" + (1 to 80).map(i => s"    line_$i();").mkString("\n")
    val out = new CodeChunker(256, 128).chunk(code, "broken.rs")
    val fn = out.find(_.metadata.name.contains("broken")).get
    assert(fn.metadata.end_line.get <= 51) // start + 50 cap (ref ast.rs:170)
  }

  test("trailing content after the last block becomes a context chunk") {
    val code =
      """fn only() {
        |    a();
        |}
        |// module-level trailer that the reference silently drops
        |static CONFIG: u32 = 42;""".stripMargin
    val out = new CodeChunker(256, 128).chunk(code, "tail.rs")
    val ctx = out.filter(_.metadata.chunk_type == "context")
    assert(ctx.nonEmpty)
    assert(ctx.last.text.contains("CONFIG"))
  }

  test("unknown extension falls back to simple chunking") {
    val out = new CodeChunker(256, 128).chunk("just prose text", "notes.txt")
    assert(out.head.metadata.chunk_type == "simple")
  }

  test("smart chunker auto-dispatch (ref mod.rs:83-117)") {
    val sc = new SmartChunker("auto", 256, 128)
    assert(sc.shouldUseAst("x.rs"))
    assert(sc.shouldUseAst("x.py"))
    assert(!sc.shouldUseAst("x.md"))
    assert(sc.chunk("fn a() {}\n", "m.rs").head.metadata.chunk_type == "ast")
    assert(sc.chunk("plain", "m.md").head.metadata.chunk_type == "simple")
  }
}
