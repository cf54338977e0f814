package graft.sources

import java.util.zip.Inflater

/** Minimal, dependency-free PDF text extraction (S3, ref
  * `src/cli/build.rs:637-655`, which uses `pdf_extract` behind the
  * `pdf` cargo feature). This build ships no pdfbox, so the extractor
  * implements the subset that covers text-first PDFs:
  *
  *  - object streams located by `stream`/`endstream` markers, with the
  *    preceding dictionary inspected for the filter;
  *  - unfiltered and /FlateDecode streams (java.util.zip.Inflater);
  *    image/other filters are skipped;
  *  - text pulled from content streams via the text-showing operators:
  *    `(s) Tj`, `[(a) -120 (b)] TJ`, `'` and `"`, with full string
  *    syntax (nested parens, `\\`-escapes incl. octal and line
  *    continuations) and hex strings `<...>`;
  *  - `Td`/`TD`/`T*`/`ET` break lines, so paragraphs keep boundaries
  *    for the chunker.
  *
  * Honest limitations (documented, matching the "skip unreadable"
  * ingest stance): no ToUnicode CMap handling — bytes decode as
  * Latin-1, so PDFs using identity-encoded composite fonts extract as
  * garbage and should be filtered by downstream quality scoring; no
  * encrypted PDFs (skipped); no cross-reference parsing (streams are
  * found by scanning, which also tolerates mildly corrupt files).
  */
object PdfText {

  /** Extract text from PDF bytes; None when nothing extractable. */
  def extract(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      return None
    val raw = new String(bytes, "ISO-8859-1") // byte-preserving view
    val out = new StringBuilder
    var from = 0
    var found = true
    while (found) {
      raw.indexOf("stream", from) match {
        case -1 => found = false
        case s =>
          // Find the OUTER dictionary open: scan backward balancing
          // << / >> so a nested dict (e.g. /DecodeParms << ... >>)
          // can't hide the stream's /Filter from us.
          val dictStart = {
            var i = s - 1
            var depth = 0
            var found = -1
            while (i > 0 && found < 0) {
              if (raw.charAt(i - 1) == '>' && raw.charAt(i) == '>') { depth += 1; i -= 2 }
              else if (raw.charAt(i - 1) == '<' && raw.charAt(i) == '<') {
                depth -= 1
                if (depth == 0) found = i - 1
                i -= 2
              } else i -= 1
            }
            found
          }
          val dict = if (dictStart >= 0) raw.substring(dictStart, s) else ""
          // stream data starts after "stream" + EOL (spec: CRLF or LF)
          var dataStart = s + "stream".length
          if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
          val e = raw.indexOf("endstream", dataStart)
          if (e < 0) { found = false }
          else {
            val flate = dict.contains("/FlateDecode")
            val otherFilter = dict.contains("/Filter") && !flate
            if (!otherFilter) {
              val data = java.util.Arrays.copyOfRange(bytes, dataStart, e)
              val content =
                if (flate) inflate(data).map(b => new String(b, "ISO-8859-1"))
                else Some(new String(data, "ISO-8859-1"))
              content.filter(c => c.contains("Tj") || c.contains("TJ"))
                .map(contentText).filter(_.nonEmpty)
                .foreach { t => out ++= t; out += '\n' }
            }
            from = e + "endstream".length
          }
      }
    }
    val text = out.result()
      .replaceAll("[ \\t]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{2,}", "\n")
      .trim
    if (text.isEmpty) None else Some(text)
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Pull shown text out of one content stream. */
  private[sources] def contentText(cs: String): String = {
    val out = new StringBuilder
    // strings accumulated since the last operator, flushed on Tj/TJ/'/"
    var pending = new StringBuilder
    var i = 0
    val n = cs.length

    def parseLiteral(): Unit = { // at '(' on entry
      i += 1
      var depth = 1
      while (i < n && depth > 0) {
        cs.charAt(i) match {
          case '\\' if i + 1 < n =>
            cs.charAt(i + 1) match {
              case 'n' => pending += '\n'; i += 2
              case 'r' => pending += '\r'; i += 2
              case 't' => pending += '\t'; i += 2
              case 'b' => pending += '\b'; i += 2
              case 'f' => pending += '\f'; i += 2
              case '(' => pending += '('; i += 2
              case ')' => pending += ')'; i += 2
              case '\\' => pending += '\\'; i += 2
              case '\n' => i += 2 // line continuation
              case '\r' => i += 2; if (i < n && cs.charAt(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
                  v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
                }
                pending += v.toChar
              case other => pending += other; i += 2
            }
          case '(' => depth += 1; pending += '('; i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) pending += ')'
            i += 1
          case c => pending += c; i += 1
        }
      }
    }

    def parseHex(): Unit = { // at '<' (not '<<') on entry
      i += 1
      val hex = new StringBuilder
      while (i < n && cs.charAt(i) != '>') {
        val c = cs.charAt(i)
        if (Character.digit(c, 16) >= 0) hex += c
        i += 1
      }
      i += 1 // '>'
      val h = if (hex.length % 2 == 1) hex.toString + "0" else hex.toString
      var k = 0
      while (k + 2 <= h.length) {
        pending += Integer.parseInt(h.substring(k, k + 2), 16).toChar
        k += 2
      }
    }

    def flush(newline: Boolean): Unit = {
      if (pending.nonEmpty) { out ++= pending; pending = new StringBuilder }
      if (newline && out.nonEmpty && out.last != '\n') out += '\n'
    }

    while (i < n) {
      cs.charAt(i) match {
        case '(' => parseLiteral()
        case '<' if i + 1 < n && cs.charAt(i + 1) == '<' => i += 2 // dict
        case '<' => parseHex()
        case 'T' if i + 1 < n =>
          cs.charAt(i + 1) match {
            case 'j' | 'J' => flush(newline = false); i += 2 // Tj / TJ show
            case 'd' | 'D' | '*' => flush(newline = true); i += 2 // moves
            case _ => i += 1
          }
        case '\'' | '"' => flush(newline = true); i += 1 // show-with-move
        case 'E' if i + 1 < n && cs.charAt(i + 1) == 'T' =>
          flush(newline = true); i += 2
        case _ => i += 1
      }
    }
    // strings never followed by a show operator are dropped
    out.result().trim
  }
}

/** [[FileIngest.ContentDecoder]] chain for the CLI: `.pdf` through
  * [[PdfText]], `.html`/`.htm` through the HTML decoder, everything
  * else UTF-8 with skip-unreadable. */
object PdfTextDecoder extends FileIngest.ContentDecoder {
  override def decode(path: String, bytes: Array[Byte]): Option[String] = {
    val p = path.toLowerCase
    if (p.endsWith(".pdf")) PdfText.extract(bytes)
    else FileIngest.HtmlTextDecoder.decode(path, bytes)
  }
}
