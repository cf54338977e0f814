package graft.llm

import java.io.{BufferedReader, PrintWriter}
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Interactive ask loop (ref `src/cli/ask.rs:200-317`): a line-oriented
  * REPL over a `question => answer` function with the reference's
  * command set (`/help`, `/clear`, `/history`, `/quit` + aliases),
  * in-memory conversation history, and a persisted command-history file
  * loaded on start and appended on exit (the rustyline history file,
  * minus the TTY line editing — this REPL reads plain lines, so it
  * works identically under a pipe, which is also how the spec drives
  * it).
  */
final class AskRepl(ask: String => String,
                    historyFile: Option[Path] = None,
                    assistantName: String = "graft") {

  private var conversation = Vector.empty[(String, String)]
  private var commands = Vector.empty[String]

  private def loadHistory(): Unit =
    historyFile.filter(Files.exists(_)).foreach { p =>
      commands = Files.readAllLines(p).asScala.toVector
    }

  private def saveHistory(): Unit =
    historyFile.foreach { p =>
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, commands.asJava)
      ()
    }

  // the reference's help text says "command history" but its handler
  // (and ours) lists the conversation's questions — say what we do
  private val helpText =
    """Commands:
      |  /help     - Show this help message
      |  /clear    - Clear conversation history
      |  /history  - Show conversation history
      |  /quit     - Exit interactive mode""".stripMargin

  def run(in: BufferedReader, out: PrintWriter): Unit = {
    loadHistory()
    out.println(s"$assistantName interactive mode — ask about the index. /help for commands.")
    var line = in.readLine()
    var done = false
    while (line != null && !done) {
      val input = line.trim
      if (input.nonEmpty) {
        commands :+= input
        input match {
          case "/help" | "/h" | "/?" => out.println(helpText)
          case "/clear" | "/c" =>
            conversation = Vector.empty
            out.println("Conversation history cleared.")
          case "/history" | "/hist" =>
            out.println("Conversation history:")
            if (conversation.isEmpty) out.println("  (empty)")
            else conversation.zipWithIndex.foreach { case ((q, _), i) =>
              out.println(s"  ${i + 1}. $q")
            }
          case "/quit" | "/q" | "/exit" =>
            out.println("Goodbye!")
            done = true
          case cmd if cmd.startsWith("/") =>
            out.println(s"Unknown command: $cmd. Type /help for available commands.")
          case question =>
            try {
              val answer = ask(question)
              out.println(s"$assistantName: $answer")
              conversation :+= (question -> answer)
            } catch {
              case e: Exception => out.println(s"Error: ${e.getMessage}")
            }
        }
      }
      if (!done) line = in.readLine()
    }
    if (line == null) out.println("Goodbye!") // EOF, like ReadlineError::Eof
    saveHistory()
  }
}
