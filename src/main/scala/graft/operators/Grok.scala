package graft.operators

import graft.core.Processor
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `grok` / `parse_log` processors (reference: internal/impl/pure/
  * processor_grok.go:35, processor_parse_log.go:32).
  *
  * Grok patterns compile ONCE on the driver to a plain regex + capture
  * names; extraction is then one codegen'd `regexp_extract` per named
  * field — no UDF, fully inside whole-stage codegen. (The reference
  * interprets the pattern per message; here the pattern is part of the
  * plan.)
  */
object Grok {

  /** Core pattern library (subset of the reference's grok-patterns set). */
  val patterns: Map[String, String] = Map(
    "WORD" -> "\\w+", "INT" -> "[+-]?\\d+", "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP" -> "\\d{1,3}(?:\\.\\d{1,3}){3}", "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?", "GREEDYDATA" -> ".*",
    "LOGLEVEL" -> "TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "TIMESTAMP_ISO8601" -> "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?")

  /** Compile `%{PATTERN:name}` grok syntax → (anchored regex, field names). */
  def compile(grokPattern: String): (String, Seq[String]) = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val re = "%\\{(\\w+)(?::(\\w+))?\\}".r.replaceAllIn(grokPattern, m => {
      val pat = patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"grok: unknown pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(n) => names += n; java.util.regex.Matcher.quoteReplacement(s"($pat)")
        case None => java.util.regex.Matcher.quoteReplacement(s"(?:$pat)")
      }
    })
    (re, names.toSeq)
  }

  /** One extracted Column per named field (group i+1 of the compiled regex). */
  def fields(src: Column, grokPattern: String): Seq[(String, Column)] = {
    val (re, names) = compile(grokPattern)
    names.zipWithIndex.map { case (n, i) => n -> regexp_extract(src, re, i + 1) }
  }

  /** `grok` as a processor: adds one column per named capture. Rows that
    * don't match yield empty strings (pair with a match filter or
    * errorWhere for the reference's erroring behavior). */
  def processor(src: Column, grokPattern: String): Processor =
    Processor("grok") { df =>
      fields(src, grokPattern).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    }

  /** `parse_log` syslog RFC3164-ish subset: "MMM dd HH:mm:ss host prog[pid]: msg". */
  val syslogPattern = "^(\\w{3}\\s+\\d+ \\d{2}:\\d{2}:\\d{2}) (\\S+) ([^\\[:]+)(?:\\[(\\d+)\\])?: (.*)$"
  def parseSyslog(src: Column): Seq[(String, Column)] = Seq(
    "log_ts" -> regexp_extract(src, syslogPattern, 1),
    "log_host" -> regexp_extract(src, syslogPattern, 2),
    "log_prog" -> regexp_extract(src, syslogPattern, 3),
    "log_pid" -> regexp_extract(src, syslogPattern, 4),
    "log_msg" -> regexp_extract(src, syslogPattern, 5))
}
