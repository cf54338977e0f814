package graft.sources

import java.io.File

/** Ignore-aware directory enumeration for [[FileIngest.readDocuments]],
  * mirroring the reference's `ignore`-crate walker
  * (`src/cli/build.rs:492-509`): honors `.gitignore` and `.leannignore`
  * files at every level, skips the common build/dependency directories,
  * and skips hidden entries unless asked not to.
  *
  * Scale note: this enumerates PATHS on the driver — the same
  * metadata-scale work Spark's own file index does when listing a
  * directory source — and returns `(path, length)` pairs; file CONTENT
  * is read later, distributed. Ignore files are per-directory local
  * state, which a flat distributed listing cannot evaluate (a rule in
  * `a/.gitignore` changes the meaning of everything under `a/`), so the
  * walk is where that logic has to live.
  *
  * Gitignore semantics implemented (the subset real repos rely on):
  * blank/`#` lines skipped; `!` negation with last-match-wins; patterns
  * containing an interior `/` anchor to the ignore file's directory,
  * bare names match at any depth below it; a trailing `/` restricts to
  * directories; `*` matches within a segment, `?` one char, `**` any
  * number of segments. An ignored directory's subtree is not walked
  * (matching git: you can't re-include inside an excluded directory).
  */
object IgnoreWalk {

  /** Build/dependency directory names never walked (build.rs:500-507). */
  val skipDirNames: Set[String] = Set(
    "target", "node_modules", ".git", "__pycache__",
    "venv", ".venv", "dist", "build", ".next",
    ".nuxt", "vendor", "Pods", ".gradle", ".cache",
    "deps", "_build", ".elixir_ls", ".hex", "priv")

  /** Ignore-file names honored during the walk (git's own + ours). */
  val ignoreFileNames: Seq[String] = Seq(".gitignore", ".leannignore")

  /** One parsed ignore line, scoped to the directory holding its file.
    * `baseDir` ends with '/'; `regex` matches the path RELATIVE to
    * baseDir. */
  private final case class Rule(baseDir: String, regex: java.util.regex.Pattern,
                                negated: Boolean, dirOnly: Boolean) {
    def matches(relPath: String, isDir: Boolean): Boolean =
      (!dirOnly || isDir) && regex.matcher(relPath).matches()
  }

  /** Translate one gitignore pattern body to a regex over the
    * slash-separated relative path. */
  private[sources] def globToRegex(pattern: String, anchored: Boolean): String = {
    val sb = new StringBuilder
    // unanchored patterns may match at any depth below the base dir
    if (!anchored) sb ++= "(?:.*/)?"
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' =>
          if (i + 1 < pattern.length && pattern.charAt(i + 1) == '*') {
            // "**" spans segments; "a/**/b" also matches "a/b"
            val followedBySlash = i + 2 < pattern.length && pattern.charAt(i + 2) == '/'
            val precededBySlash = i == 0 || pattern.charAt(i - 1) == '/'
            if (precededBySlash && followedBySlash) { sb ++= "(?:[^/]+/)*"; i += 1 } // consume '/'
            else sb ++= ".*"
            i += 2
          } else { sb ++= "[^/]*"; i += 1 }
        case '?' => sb ++= "[^/]"; i += 1
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb += '\\'; sb += c; i += 1
        case c => sb += c; i += 1
      }
    }
    // a pattern matching a directory ignores its whole subtree
    sb ++= "(?:/.*)?"
    sb.result()
  }

  private def parseIgnoreFile(f: File): Seq[Rule] = {
    val baseDir = f.getParentFile.getPath.stripSuffix("/") + "/"
    scala.io.Source.fromFile(f)(scala.io.Codec.UTF8).getLines()
      .map(_.replaceAll("\\s+$", ""))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line0 =>
        val (negated, line1) =
          if (line0.startsWith("!")) (true, line0.drop(1)) else (false, line0)
        val (dirOnly, line2) =
          if (line1.endsWith("/")) (true, line1.dropRight(1)) else (false, line1)
        // interior or leading slash anchors to this ignore file's dir
        val anchored = line2.startsWith("/") || line2.contains("/")
        val body = if (line2.startsWith("/")) line2.drop(1) else line2
        Rule(baseDir,
          java.util.regex.Pattern.compile(globToRegex(body, anchored)),
          negated, dirOnly)
      }.toSeq
  }

  /** Last matching rule decides (git semantics); None = no rule. */
  private def ignoredBy(rules: Seq[Rule], path: String, isDir: Boolean): Boolean = {
    var verdict = false
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (path.startsWith(r.baseDir) &&
          r.matches(path.substring(r.baseDir.length), isDir))
        verdict = !r.negated
      i += 1
    }
    verdict
  }

  /** Walk `root`, returning `(absolutePath, sizeBytes)` for every file
    * that survives the ignore rules, in deterministic (sorted) order. */
  def walk(root: String, includeHidden: Boolean): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    def go(dir: File, rules: Seq[Rule]): Unit = {
      val here = rules ++ ignoreFileNames
        .map(n => new File(dir, n)).filter(f => f.isFile)
        .flatMap(parseIgnoreFile)
      val children = Option(dir.listFiles()).getOrElse(Array.empty[File]).sortBy(_.getName)
      children.foreach { f =>
        val name = f.getName
        val hiddenSkip = !includeHidden && name.startsWith(".")
        if (f.isDirectory) {
          // never FOLLOW directory symlinks (cycle -> unbounded
          // recursion; link out of the root -> out-of-corpus ingest) —
          // matching the reference walker's follow_links(false). File
          // symlinks still resolve and are ingested, like the reference.
          val isLink = java.nio.file.Files.isSymbolicLink(f.toPath)
          if (!hiddenSkip && !isLink && !skipDirNames.contains(name) &&
              !ignoredBy(here, f.getPath, isDir = true))
            go(f, here)
        } else if (f.isFile) {
          if (!hiddenSkip && !ignoredBy(here, f.getPath, isDir = false))
            out += ((f.getPath, f.length()))
        }
      }
    }
    val r = new File(root)
    go(r, Seq.empty)
    out.result()
  }
}
