package graft.streaming

import java.io.{FileWriter, PrintWriter}

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A18: the reference's metrics surface (`o.Report()` human text +
  * `o.ReportJSONL()` appended to metrics.json on exit,
  * /root/reference/main.go:63-75,324,416-423) as a
  * `StreamingQueryListener` that appends one JSON line per micro-batch
  * progress event — rows/sec, batch duration, state rows — plus a
  * terminal line on query stop.
  */
final class MetricsListener(path: String) extends StreamingQueryListener {

  private def append(line: String): Unit = synchronized {
    val w = new PrintWriter(new FileWriter(path, true))
    try w.println(line) finally w.close()
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    append(s"""{"event":"started","id":"${e.id}","ts":"${e.timestamp}"}""")

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    append(e.progress.json)

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    append(s"""{"event":"terminated","id":"${e.id}"""" +
      e.exception.map(x => s""","exception":${ujsonEscape(x)}""").getOrElse("") +
      "}")

  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
