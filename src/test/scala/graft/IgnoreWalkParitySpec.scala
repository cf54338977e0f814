package graft

import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IgnoreWalk

/** Pins IgnoreWalk's gitignore semantics against the authority: real
  * `git check-ignore` over a generated fixture tree. Every file the
  * walk yields must be not-ignored per git, and every file it omits
  * (that isn't hidden or under a build dir) must be ignored per git.
  * Runs with includeHidden = true so only ignore-rule semantics are
  * compared (the hidden policy is the walk's own, tested elsewhere). */
class IgnoreWalkParitySpec extends AnyFunSuite {

  private def gitAvailable: Boolean =
    try { Seq("git", "--version").!(ProcessLogger(_ => ())) == 0 }
    catch { case _: Exception => false }

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    ()
  }

  test("walk matches git check-ignore over nested ignore files and glob forms") {
    assume(gitAvailable, "git not on PATH")
    val root = Files.createTempDirectory("graft-gitparity")
    assert(Seq("git", "-C", root.toString, "init", "-q").! == 0)

    // root .gitignore: the pattern forms the walker implements
    write(root, ".gitignore",
      """# comment line
        |*.log
        |/anchored.md
        |build-out/
        |temp*
        |!tempkeep.md
        |doc/**/gen.md
        |**/deep.md
        |cache?.md
        |""".stripMargin)
    // nested ignore file scopes to its directory
    write(root, "sub/.gitignore", "local.md\n!notme.md\n")

    val rels = Seq(
      "keep.md", "x.log", "sub/y.log", "anchored.md", "sub/anchored.md",
      "build-out/a.md", "sub/build-out/b.md", "tempfile.md", "tempkeep.md",
      "doc/gen.md", "doc/a/gen.md", "doc/a/b/gen.md", "doc/gen2.md",
      "one/deep.md", "deep.md", "cache1.md", "cache12.md",
      "sub/local.md", "sub/notme.md", "other/local.md", "sub/inner/local.md")
    rels.foreach(r => write(root, r, s"content of $r"))

    val walked = IgnoreWalk.walk(root.toString, includeHidden = true)
      .map { case (p, _) => root.relativize(java.nio.file.Paths.get(p)).toString }
      .toSet

    val mismatches = rels.flatMap { r =>
      val gitIgnored =
        Seq("git", "-C", root.toString, "check-ignore", "-q", r).! == 0
      val walkIgnored = !walked.contains(r)
      if (gitIgnored != walkIgnored)
        Some(s"$r: git says ${if (gitIgnored) "ignored" else "kept"}, " +
          s"walk says ${if (walkIgnored) "ignored" else "kept"}")
      else None
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
    // sanity: both directions actually occurred
    assert(walked.contains("keep.md") && !walked.contains("x.log"))
  }

  test("walk matches git over seeded random pattern/file combinations") {
    assume(gitAvailable, "git not on PATH")
    val rnd = new scala.util.Random(1234)
    val names = Seq("alpha", "beta", "gamma", "data", "gen", "note")
    val exts = Seq("md", "log", "txt")
    val dirs = Seq("", "a/", "a/b/", "c/")

    for (round <- 1 to 3) {
      val root = Files.createTempDirectory(s"graft-gitfuzz$round")
      assert(Seq("git", "-C", root.toString, "init", "-q").! == 0)
      // random gitignore: mix of bare names, globs, anchored, dir-only,
      // negations — the grammar subset the walker documents
      val patterns = (1 to 8).map { _ =>
        val base = rnd.nextInt(5) match {
          case 0 => s"*.${exts(rnd.nextInt(exts.length))}"
          case 1 => s"${names(rnd.nextInt(names.length))}*"
          case 2 => s"/${names(rnd.nextInt(names.length))}.md"
          case 3 => s"${names(rnd.nextInt(names.length))}"
          case 4 => s"**/${names(rnd.nextInt(names.length))}.md"
        }
        if (rnd.nextInt(4) == 0) s"!$base" else base
      }
      write(root, ".gitignore", patterns.mkString("", "\n", "\n"))
      val rels = (1 to 25).map { _ =>
        s"${dirs(rnd.nextInt(dirs.length))}${names(rnd.nextInt(names.length))}.${exts(rnd.nextInt(exts.length))}"
      }.distinct
      rels.foreach(r => write(root, r, "x"))

      val walked = IgnoreWalk.walk(root.toString, includeHidden = true)
        .map { case (p, _) => root.relativize(java.nio.file.Paths.get(p)).toString }
        .toSet
      val mismatches = rels.flatMap { r =>
        val gitIgnored =
          Seq("git", "-C", root.toString, "check-ignore", "-q", r).! == 0
        if (gitIgnored != !walked.contains(r))
          Some(s"round $round, patterns=${patterns.mkString(",")} file=$r: " +
            s"git=${if (gitIgnored) "ignored" else "kept"}")
        else None
      }
      assert(mismatches.isEmpty, mismatches.mkString("\n"))
    }
  }
}
