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
  *    for the chunker;
  *  - **ToUnicode CMaps** (r7): font objects carrying `/ToUnicode`
  *    refs get their bfchar/bfrange CMaps parsed (both the range and
  *    array forms, multi-char UTF-16BE targets); content-stream `Tf`
  *    operators switch the active font, and strings shown under a
  *    CMapped font decode as 2-byte CIDs through the map — the
  *    Identity-H composite-font path most real-world non-Latin PDFs
  *    use. Unmapped codes are dropped rather than emitted as garbage.
  *
  *  - **encrypted PDFs** (r8): the standard security handler's
  *    empty-user-password arm — RC4 40-128 (R2/R3), AES-128 `/AESV2`
  *    (R4) and AES-256 `/AESV3` (R6) — decrypts stream payloads up
  *    front via [[PdfCrypt.decryptDocument]]; files that need a real
  *    password fail the /U check and are skipped.
  *  - **compressed object streams** (r8): `/Type /ObjStm` streams are
  *    inflated and their objects spliced into the scan view, so font /
  *    resource dicts that PDF 1.5+ writers pack there still feed the
  *    ToUnicode resolution (the spec forbids nested streams, so
  *    content extraction itself is unaffected).
  *
  * Honest limitations (documented, matching the "skip unreadable"
  * ingest stance): no embedded-CMap-file lookups beyond ToUnicode (a
  * font with Identity-H but NO ToUnicode still extracts as Latin-1
  * garbage for downstream quality filters to drop); password-protected
  * PDFs (non-empty user password) are skipped; no cross-reference
  * parsing (objects and streams are found by scanning, which also
  * tolerates mildly corrupt files).
  */
object PdfText {

  /** Extract text from PDF bytes; None when nothing extractable. */
  def extract(bytes0: Array[Byte]): Option[String] = {
    if (bytes0.length < 5 || new String(bytes0, 0, 5, "ISO-8859-1") != "%PDF-")
      return None
    val raw0 = new String(bytes0, "ISO-8859-1") // byte-preserving view
    // Encrypted documents get one up-front decrypt pass (streams only);
    // a failed password check on a REAL /Standard encrypt dict means
    // genuinely protected -> skip. A document that merely contains the
    // `/Encrypt n g R` byte pattern (e.g. in a content stream) but has
    // no such dict proceeds as plaintext.
    val (raw1, bytes1) =
      if (PdfCrypt.isEncrypted(raw0))
        PdfCrypt.decryptDocument(raw0, bytes0).getOrElse {
          if (PdfCrypt.hasStandardEncryptDict(raw0)) return None
          (raw0, bytes0)
        }
      else (raw0, bytes0)
    // PDF 1.5+ compressed object streams hold most font/resource dicts;
    // splice their objects into the scan view so /ToUnicode resolution
    // sees them (content streams can't live inside an ObjStm, so the
    // text scan itself is unaffected).
    val (raw, bytes) = expandObjectStreams(raw1, bytes1)
    val fontCmaps = resolveFontCmaps(raw, bytes)
    val out = new StringBuilder
    var from = 0
    var found = true
    while (found) {
      raw.indexOf("stream", from) match {
        case -1 => found = false
        case s =>
          streamAt(raw, bytes, s) match {
            case None => found = false
            case Some(St(_, content, end)) =>
              content.filter(c => c.contains("Tj") || c.contains("TJ"))
                .map(contentText(_, fontCmaps)).filter(_.nonEmpty)
                .foreach { t => out ++= t; out += '\n' }
              from = end
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

  /** One located stream: its dictionary, decoded content (None when an
    * unsupported filter or corrupt deflate), and scan-resume offset. */
  private final case class St(dict: String, content: Option[String], end: Int)

  /** Decode the stream whose `stream` keyword starts at `s`; returns
    * None only when no `endstream` follows (scan must stop).
    * `decodeIf` gates the (inflate) work on the already-located dict —
    * passes that only need SOME streams (the ObjStm expansion) skip
    * decompressing every other payload. */
  private def streamAt(raw: String, bytes: Array[Byte], s: Int,
                       decodeIf: String => Boolean = _ => true): Option[St] = {
    // Find the OUTER dictionary open: scan backward balancing << / >>
    // so a nested dict (e.g. /DecodeParms << ... >>) can't hide the
    // stream's /Filter from us.
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
    if (e < 0) None
    else {
      val flate = dict.contains("/FlateDecode")
      val otherFilter = dict.contains("/Filter") && !flate
      val content =
        if (otherFilter || !decodeIf(dict)) None
        else {
          val data = java.util.Arrays.copyOfRange(bytes, dataStart, e)
          if (flate) inflate(data).map(b => new String(b, "ISO-8859-1"))
          else Some(new String(data, "ISO-8859-1"))
        }
      Some(St(dict, content, e + "endstream".length))
    }
  }

  // ---- compressed object streams (PDF 1.5 /ObjStm) --------------------

  private val IntPairRe = """(\d+)\s+(\d+)""".r

  /** Inflate every `/Type /ObjStm` stream and append its contained
    * objects to the document view as synthetic `n 0 obj ... endobj`
    * text (same bytes appended to both the string and byte views, so
    * downstream offset arithmetic stays aligned). The ObjStm header is
    * `/N` pairs of `objnum offset` ints; object i's body spans
    * `/First + offset_i` until the next offset. Objects inside an
    * ObjStm are dictionaries/arrays only (the spec forbids nested
    * streams), so this feeds the font/CMap reference scan without
    * touching content-stream extraction. */
  private def expandObjectStreams(raw: String, bytes: Array[Byte]): (String, Array[Byte]) = {
    if (!raw.contains("/ObjStm")) return (raw, bytes)
    val synthetic = new StringBuilder
    var from = 0
    var scanning = true
    while (scanning) {
      raw.indexOf("stream", from) match {
        case -1 => scanning = false
        case s =>
          streamAt(raw, bytes, s, decodeIf = _.contains("/ObjStm")) match {
            case None => scanning = false
            case Some(St(dict, content, end)) =>
              if (dict.contains("/ObjStm")) {
                for {
                  c <- content
                  n <- """/N\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
                  first <- """/First\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
                  if first <= c.length
                } {
                  val pairs = IntPairRe.findAllMatchIn(c.substring(0, first))
                    .map(m => (m.group(1).toInt, m.group(2).toInt)).take(n).toVector
                  pairs.zipWithIndex.foreach { case ((objNum, off), i) =>
                    val start = first + off
                    val stop =
                      if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, c.length)
                      else c.length
                    if (start >= 0 && start <= stop)
                      synthetic ++= s"\n$objNum 0 obj ${c.substring(start, stop)} endobj\n"
                  }
                }
              }
              from = end
          }
      }
    }
    if (synthetic.isEmpty) (raw, bytes)
    else {
      val raw2 = raw + synthetic.result()
      (raw2, bytes ++ synthetic.result().getBytes("ISO-8859-1"))
    }
  }

  // ---- ToUnicode CMap resolution --------------------------------------

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj(.*?)endobj""".r
  private val ToUnicodeRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val FontResRe = """(?s)/Font\s*<<(.*?)>>""".r
  private val FontResRefRe = """/Font\s+(\d+)\s+\d+\s+R""".r
  private val NameRefRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** Map content-stream font resource names (the `/F1` of `/F1 12 Tf`)
    * to their parsed ToUnicode CMaps. Objects are found by scanning
    * (no xref); names colliding across pages keep the last mapping —
    * writers reuse names consistently in practice. */
  private def resolveFontCmaps(raw: String,
                               bytes: Array[Byte]): Map[String, Map[Int, String]] = {
    if (!raw.contains("/ToUnicode")) return Map.empty
    val objBodies: Map[Int, (Int, String)] = // objNum -> (bodyStart, body)
      ObjRe.findAllMatchIn(raw)
        .map(m => m.group(1).toInt -> (m.start(2), m.group(2))).toMap
    // CMap stream per object number (decoded lazily, memoized)
    val cmapCache = scala.collection.mutable.Map.empty[Int, Map[Int, String]]
    def cmapOf(objNum: Int): Map[Int, String] =
      cmapCache.getOrElseUpdate(objNum, {
        objBodies.get(objNum).flatMap { case (bodyStart, body) =>
          val rel = body.indexOf("stream")
          if (rel < 0) None
          else streamAt(raw, bytes, bodyStart + rel).flatMap(_.content)
        }.filter(c => c.contains("beginbfchar") || c.contains("beginbfrange"))
          .map(parseCmap).getOrElse(Map.empty)
      })
    def fontCmap(fontObj: Int): Map[Int, String] =
      objBodies.get(fontObj)
        .flatMap(b => ToUnicodeRe.findFirstMatchIn(b._2))
        .map(m => cmapOf(m.group(1).toInt))
        .getOrElse(Map.empty)
    // /Font resource dicts: inline << /F1 5 0 R >> or an indirect ref
    val inline = FontResRe.findAllMatchIn(raw).map(_.group(1))
    val indirect = FontResRefRe.findAllMatchIn(raw)
      .flatMap(m => objBodies.get(m.group(1).toInt).map(_._2))
    (inline ++ indirect).flatMap { resDict =>
      NameRefRe.findAllMatchIn(resDict).map { p =>
        p.group(1) -> fontCmap(p.group(2).toInt)
      }
    }.filter(_._2.nonEmpty).toMap
  }

  /** Parse a ToUnicode CMap's bfchar/bfrange sections into
    * CID → string (UTF-16BE targets, possibly multi-char). */
  private[sources] def parseCmap(cs: String): Map[Int, String] = {
    val out = scala.collection.mutable.Map.empty[Int, String]
    def utf16(hex: String): String = {
      // 4-hex-digit UTF-16BE code units; a bare 2-digit byte is a char
      val h = if (hex.length % 4 == 2) "00" + hex else hex
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= h.length) {
        sb += Integer.parseInt(h.substring(i, i + 4), 16).toChar
        i += 4
      }
      sb.result()
    }
    val hexRe = """<([0-9A-Fa-f]+)>""".r
    for (sec <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cs)) {
      val toks = hexRe.findAllMatchIn(sec.group(1)).map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => out(Integer.parseInt(src, 16)) = utf16(dst)
        case _ =>
      }
    }
    for (sec <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cs)) {
      // two forms: <lo> <hi> <dstStart>  |  <lo> <hi> [<d0> <d1> ...]
      val body = sec.group(1)
      val tripleRe =
        """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<([0-9A-Fa-f]+)>|\[([^\]]*)\])""".r
      for (m <- tripleRe.findAllMatchIn(body)) {
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        if (m.group(4) != null) {
          val dst = m.group(4)
          // increment applies to the LAST code unit (the spec's rule)
          val base = utf16(dst)
          var c = lo
          while (c <= hi) {
            val off = c - lo
            out(c) =
              if (base.isEmpty) ""
              else base.init + (base.last + off).toChar
            c += 1
          }
        } else {
          val dsts = hexRe.findAllMatchIn(m.group(5)).map(_.group(1)).toSeq
          var c = lo
          var i = 0
          while (c <= hi && i < dsts.length) {
            out(c) = utf16(dsts(i))
            c += 1; i += 1
          }
        }
      }
    }
    out.toMap
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

  /** Pull shown text out of one content stream. `fontCmaps` maps font
    * resource names to ToUnicode CMaps; strings shown while a CMapped
    * font is selected (`/F1 12 Tf`) decode as 2-byte CIDs. */
  private[sources] def contentText(
      cs: String,
      fontCmaps: Map[String, Map[Int, String]] = Map.empty): String = {
    val out = new StringBuilder
    // strings accumulated since the last operator, flushed on Tj/TJ/'/"
    var pending = new StringBuilder
    var i = 0
    val n = cs.length
    var lastName = ""                         // most recent /Name token
    var cmap: Map[Int, String] = null         // active font's ToUnicode

    /** Append one shown string's raw byte values (as chars 0-255),
      * decoding through the active CMap when one is selected. */
    def appendString(b: StringBuilder): Unit =
      if (cmap == null) pending ++= b
      else {
        var k = 0
        while (k + 2 <= b.length) {
          val cid = (b.charAt(k) << 8) | b.charAt(k + 1)
          cmap.get(cid).foreach(pending ++= _)
          k += 2
        }
        if (k < b.length) // odd trailing byte: try a 1-byte code
          cmap.get(b.charAt(k).toInt).foreach(pending ++= _)
      }

    def parseLiteral(): Unit = { // at '(' on entry
      val str = new StringBuilder
      i += 1
      var depth = 1
      while (i < n && depth > 0) {
        cs.charAt(i) match {
          case '\\' if i + 1 < n =>
            cs.charAt(i + 1) match {
              case 'n' => str += '\n'; i += 2
              case 'r' => str += '\r'; i += 2
              case 't' => str += '\t'; i += 2
              case 'b' => str += '\b'; i += 2
              case 'f' => str += '\f'; i += 2
              case '(' => str += '('; i += 2
              case ')' => str += ')'; i += 2
              case '\\' => str += '\\'; i += 2
              case '\n' => i += 2 // line continuation
              case '\r' => i += 2; if (i < n && cs.charAt(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
                  v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
                }
                str += v.toChar
              case other => str += other; i += 2
            }
          case '(' => depth += 1; str += '('; i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) str += ')'
            i += 1
          case c => str += c; i += 1
        }
      }
      appendString(str)
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
      val str = new StringBuilder
      var k = 0
      while (k + 2 <= h.length) {
        str += Integer.parseInt(h.substring(k, k + 2), 16).toChar
        k += 2
      }
      appendString(str)
    }

    def flush(newline: Boolean): Unit = {
      if (pending.nonEmpty) { out ++= pending; pending = new StringBuilder }
      if (newline && out.nonEmpty && out.last != '\n') out += '\n'
    }

    def isDelim(c: Char): Boolean =
      c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

    while (i < n) {
      cs.charAt(i) match {
        case '(' => parseLiteral()
        case '<' if i + 1 < n && cs.charAt(i + 1) == '<' => i += 2 // dict
        case '<' => parseHex()
        case '/' =>
          val start = i + 1
          i += 1
          while (i < n && !isDelim(cs.charAt(i))) i += 1
          lastName = cs.substring(start, i)
        case 'T' if i + 1 < n =>
          cs.charAt(i + 1) match {
            case 'j' | 'J' => flush(newline = false); i += 2 // Tj / TJ show
            case 'd' | 'D' | '*' => flush(newline = true); i += 2 // moves
            case 'f' => // font select: /F1 12 Tf
              cmap = fontCmaps.getOrElse(lastName, null)
              i += 2
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
