package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

import graft.model.{Chunk, ChunkMeta}

/** Chunking strategies — the reference's "projection/flatMap" layer
  * (SURVEY §2.2, T1-T3), as pure Scala functions used inside a typed
  * `Dataset.flatMap`. Pure + deterministic → trivially distributed and
  * golden-testable.
  *
  * Positions are Unicode (UTF-16) character indices rather than the
  * reference's UTF-8 byte offsets (`src/chunker/simple.rs:54-113`); for
  * any ASCII corpus the chunk boundaries are identical, and the same
  * word-boundary / overlap / forward-progress rules apply.
  *
  * Ids: the reference threads a global mutable counter through the build
  * (`chunk_id: &mut u64`). A shared counter cannot be assigned from
  * distributed tasks without serializing the build, so ids here are
  * `source#chunkIndex` — deterministic under any partitioning.
  */
trait TextChunker extends Serializable {
  def chunk(text: String, source: String): Seq[Chunk]
}

/** Character-budget chunker with word-boundary awareness
  * (ref `src/chunker/simple.rs:24-118`): ~4 chars per token, break at the
  * last whitespace before the limit, step back `overlap` for the next
  * chunk, always making forward progress. */
final class SimpleChunker(chunkSize: Int = 256, chunkOverlap: Int = 128) extends TextChunker {

  override def chunk(text: String, source: String): Seq[Chunk] = {
    val sizeChars = chunkSize * 4
    val overlapChars = chunkOverlap * 4
    val out = ArrayBuffer.empty[Chunk]

    def mk(t: String, idx: Int): Chunk =
      Chunk(s"$source#$idx", t, ChunkMeta(source, Some(idx), "simple",
        None, None, None, None, None, None))

    if (text.length <= sizeChars) {
      return Seq(mk(text, 0))
    }

    var start = 0
    var chunkIndex = 0
    var done = false
    while (start < text.length && !done) {
      val end = math.min(start + sizeChars, text.length)
      // Break at the last whitespace inside the window (when not at EOF)
      val chunkEnd =
        if (end < text.length) {
          val rel = text.substring(start, end).lastIndexWhere(_.isWhitespace)
          if (rel >= 0) start + rel else end
        } else end

      val chunkText = text.substring(start, chunkEnd).trim
      if (chunkText.nonEmpty) {
        out += mk(chunkText, chunkIndex)
        chunkIndex += 1
      }

      if (chunkEnd <= start) {
        // No progress — force advance (ref: ceil_char_boundary(start+1))
        start += 1
      } else {
        var newStart =
          if (chunkEnd > start + overlapChars) chunkEnd - overlapChars else chunkEnd
        if (newStart <= start) newStart = chunkEnd
        start = newStart
        if (start >= text.length || chunkEnd >= text.length) done = true
      }
    }
    out.toSeq
  }
}

/** Regex-based code chunker (ref `src/chunker/ast.rs`): detect semantic
  * blocks per language, end them by brace counting (C-like) or
  * indentation (Python/Ruby), drop overlapping detections, split
  * oversized blocks by lines with overlap, and emit inter-block gaps as
  * "context" chunks, all ordered by start line.
  *
  * One deliberate fix over the reference: its oversized-block splitter
  * rewinds by the overlap after *every* emitted piece, including the
  * final one, so a trailing piece shorter than the limit re-chunks
  * forever (`ast.rs:289-292`). Here the rewind applies only when the
  * piece was cut by the size limit, and the next start always advances.
  */
final class CodeChunker(maxChunkSize: Int = 256, chunkOverlap: Int = 128) extends TextChunker {

  private val simple = new SimpleChunker(maxChunkSize, chunkOverlap)

  private case class Block(blockType: String, name: String,
      startLine: Int, endLine: Int, content: String)

  override def chunk(text: String, source: String): Seq[Chunk] =
    CodeChunker.languageOf(source) match {
      case None => simple.chunk(text, source)
      case Some(lang) =>
        val lines = text.split("\n", -1).toIndexedSeq
        val blocks = extractBlocks(lines, lang)
        if (blocks.isEmpty) simple.chunk(text, source)
        else {
          val bc = blocksToChunks(blocks, source, lang)
          val gc = fillGaps(lines, blocks, source)
          (bc ++ gc).sortBy(_.metadata.start_line.getOrElse(0))
        }
    }

  private def extractBlocks(lines: IndexedSeq[String], lang: String): Seq[Block] = {
    val found = ArrayBuffer.empty[Block]
    for ((blockType, re) <- CodeChunker.patterns(lang)) {
      for ((line, i) <- lines.zipWithIndex) {
        re.findFirstMatchIn(line).foreach { m =>
          val name = Option(m.group(1)).getOrElse("anonymous")
          val end = findBlockEnd(lines, i, lang)
          found += Block(blockType, name, i, end, lines.slice(i, end).mkString("\n"))
        }
      }
    }
    dedupeBlocks(found.toSeq.sortBy(_.startLine))
  }

  private def findBlockEnd(lines: IndexedSeq[String], start: Int, lang: String): Int =
    if (lang == "python" || lang == "ruby") findIndentEnd(lines, start)
    else findBraceEnd(lines, start)

  private def findIndentEnd(lines: IndexedSeq[String], start: Int): Int = {
    if (start >= lines.length) return start + 1
    val base = indentOf(lines(start))
    var end = start + 1
    while (end < lines.length) {
      val line = lines(end)
      if (line.trim.isEmpty) end += 1
      else if (indentOf(line) <= base) return end
      else end += 1
    }
    end
  }

  private def indentOf(s: String): Int = s.length - s.dropWhile(_.isWhitespace).length

  private def findBraceEnd(lines: IndexedSeq[String], start: Int): Int = {
    var depth = 0
    var foundFirst = false
    var i = start
    while (i < lines.length) {
      for (ch <- lines(i)) ch match {
        case '{' => depth += 1; foundFirst = true
        case '}' =>
          depth -= 1
          if (foundFirst && depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    math.min(start + 50, lines.length)
  }

  /** First (earlier-starting) block wins on overlap (ref ast.rs:175-190;
    * the input is stably sorted by start line). */
  private def dedupeBlocks(blocks: Seq[Block]): Seq[Block] = {
    val kept = ArrayBuffer.empty[Block]
    for (b <- blocks)
      if (!kept.exists(e => b.startLine < e.endLine && b.endLine > e.startLine))
        kept += b
    kept.toSeq
  }

  private def blocksToChunks(blocks: Seq[Block], source: String, lang: String): Seq[Chunk] = {
    val charLimit = maxChunkSize * 4
    val out = ArrayBuffer.empty[Chunk]
    var n = 0
    def meta(b: Block, name: String, part: Option[Int]) =
      ChunkMeta(source, None, "ast", Some(b.blockType), Some(name), Some(lang),
        Some(b.startLine + 1), Some(b.endLine), part)
    for (b <- blocks) {
      if (b.content.length <= charLimit) {
        out += Chunk(s"$source#$n", b.content, meta(b, b.name, None)); n += 1
      } else {
        val lines = b.content.split("\n", -1).toIndexedSeq
        val overlapLines = (chunkOverlap * 4) / 80 // ~80 chars per line
        var i = 0
        var part = 0
        while (i < lines.length) {
          val pieceStart = i
          var len = 0
          val piece = ArrayBuffer.empty[String]
          while (i < lines.length && len < charLimit) {
            len += lines(i).length + 1
            piece += lines(i)
            i += 1
          }
          val cutBySize = i < lines.length
          if (cutBySize) i = math.max(i - overlapLines, pieceStart + 1)
          if (piece.nonEmpty) {
            out += Chunk(s"$source#$n", piece.mkString("\n"),
              meta(b, s"${b.name}_part$part", Some(part)))
            n += 1
            part += 1
          }
        }
      }
    }
    out.toSeq
  }

  private def fillGaps(lines: IndexedSeq[String], blocks: Seq[Block], source: String): Seq[Chunk] = {
    val charLimit = maxChunkSize * 4
    val out = ArrayBuffer.empty[Chunk]
    var cur = 0
    var n = 0
    def emit(from: Int, until: Int): Unit = {
      val gap = lines.slice(from, until).mkString("\n")
      val trimmed = gap.trim
      // Non-trivial gaps only; oversized gaps are skipped (imports etc.)
      if (trimmed.nonEmpty && trimmed.length > 20 && gap.length <= charLimit) {
        out += Chunk(s"$source#ctx$n", gap, ChunkMeta(source, None, "context",
          None, None, None, Some(from + 1), Some(until), None))
        n += 1
      }
    }
    for (b <- blocks) {
      if (b.startLine > cur) emit(cur, b.startLine)
      cur = b.endLine
    }
    // Trailing content after the last block. The reference drops it
    // (`fill_gaps` iterates blocks only, ast.rs:317-362) — module-level
    // code after the final function would never be indexed; emitted here
    // as a deliberate improvement.
    if (cur < lines.length) emit(cur, lines.length)
    out.toSeq
  }
}

object CodeChunker {
  /** Extension → language (ref ast.rs:44-63). */
  def languageOf(path: String): Option[String] = {
    val ext = path.split('.').lastOption.filter(_ => path.contains('.')).getOrElse("")
    ext match {
      case "rs" => Some("rust")
      case "py" => Some("python")
      case "js" | "jsx" => Some("javascript")
      case "ts" | "tsx" => Some("typescript")
      case "go" => Some("go")
      case "java" => Some("java")
      case "c" | "h" => Some("c")
      case "cpp" | "cc" | "hpp" => Some("cpp")
      case "rb" => Some("ruby")
      case "php" => Some("php")
      case "swift" => Some("swift")
      case "kt" => Some("kotlin")
      case "scala" => Some("scala")
      case "cs" => Some("csharp")
      case _ => None
    }
  }

  /** Block-detection regexes per language (ref ast.rs:193-240). */
  def patterns(lang: String): Seq[(String, Regex)] = {
    def p(t: String, r: String) = (t, r.r)
    lang match {
      case "rust" => Seq(
        p("function", """^\s*(?:pub\s+)?(?:async\s+)?fn\s+(\w+)"""),
        p("struct", """^\s*(?:pub\s+)?struct\s+(\w+)"""),
        p("enum", """^\s*(?:pub\s+)?enum\s+(\w+)"""),
        p("impl", """^\s*impl(?:<[^>]+>)?\s+(?:(\w+)|for\s+(\w+))"""),
        p("trait", """^\s*(?:pub\s+)?trait\s+(\w+)"""),
        p("mod", """^\s*(?:pub\s+)?mod\s+(\w+)\s*\{"""))
      case "python" => Seq(
        p("function", """^\s*(?:async\s+)?def\s+(\w+)"""),
        p("class", """^\s*class\s+(\w+)"""))
      case "javascript" | "typescript" => Seq(
        p("function", """^\s*(?:async\s+)?function\s+(\w+)"""),
        p("function", """^\s*(?:export\s+)?(?:async\s+)?function\s+(\w+)"""),
        p("class", """^\s*(?:export\s+)?class\s+(\w+)"""),
        p("method", """^\s*(?:async\s+)?(\w+)\s*\([^)]*\)\s*\{"""),
        p("arrow", """^\s*(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?\([^)]*\)\s*=>"""))
      case "go" => Seq(
        p("function", """^\s*func\s+(?:\([^)]+\)\s+)?(\w+)"""),
        p("struct", """^\s*type\s+(\w+)\s+struct"""),
        p("interface", """^\s*type\s+(\w+)\s+interface"""))
      case "java" => Seq(
        p("class", """^\s*(?:public\s+)?(?:abstract\s+)?class\s+(\w+)"""),
        p("interface", """^\s*(?:public\s+)?interface\s+(\w+)"""),
        p("method", """^\s*(?:public|private|protected)?\s*(?:static\s+)?(?:\w+(?:<[^>]+>)?)\s+(\w+)\s*\("""))
      case "c" | "cpp" => Seq(
        p("function", """^\s*(?:\w+(?:\s*\*)?)\s+(\w+)\s*\([^)]*\)\s*\{?"""),
        p("class", """^\s*class\s+(\w+)"""),
        p("struct", """^\s*struct\s+(\w+)"""))
      case "ruby" => Seq(
        p("class", """^\s*class\s+(\w+)"""),
        p("module", """^\s*module\s+(\w+)"""),
        p("method", """^\s*def\s+(\w+)"""))
      case _ => Seq(
        p("function", """^\s*(?:def|func|function)\s+(\w+)"""),
        p("class", """^\s*class\s+(\w+)"""))
    }
  }
}

/** Strategy dispatch (ref `src/chunker/mod.rs:83-117`): `simple`, `ast`,
  * or `auto` (AST for recognized code extensions). */
final class SmartChunker(strategy: String = "auto",
    chunkSize: Int = 256, chunkOverlap: Int = 128) extends TextChunker {
  private val simple = new SimpleChunker(chunkSize, chunkOverlap)
  private val ast = new CodeChunker(chunkSize, chunkOverlap)

  private val astExts = Set("rs", "py", "js", "ts", "tsx", "jsx", "go", "java",
    "c", "cpp", "cc", "h", "hpp", "rb", "php", "swift", "kt", "scala", "cs")

  def shouldUseAst(path: String): Boolean =
    astExts.contains(path.split('.').lastOption.filter(_ => path.contains('.')).getOrElse(""))

  override def chunk(text: String, source: String): Seq[Chunk] = strategy match {
    case "simple" => simple.chunk(text, source)
    case "ast"    => ast.chunk(text, source)
    case _        => if (shouldUseAst(source)) ast.chunk(text, source)
                     else simple.chunk(text, source)
  }
}
