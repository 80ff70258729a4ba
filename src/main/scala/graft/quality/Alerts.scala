package graft.quality

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** K8 — failure/alert notification (dwh/general_lib.py:187-222 and the
  * DAG-level `email_on_failure`, dags/dwh_dag.py:168-169).
  *
  * The reference emails on task failure. A library can't assume SMTP,
  * so the portable equivalent is a machine-readable alert artifact
  * written next to the QC reports — the operational hook an external
  * pager/mailer tails. Two entry points:
  *
  *  - [[guarded]] — the direct twin of the reference's try/except +
  *    send_email wrapper around each pipeline step;
  *  - [[install]] — a session-wide [[QueryExecutionListener]] so ANY
  *    failed DataFrame action alerts, no per-call wrapping needed.
  *
  * Driver-side plain I/O by design: alerts are O(failures), never data.
  */
object Alerts {

  private[quality] def esc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  /** Write one alert JSON file; returns its path. File name carries the
    * sanitized job name + a nanotime suffix so concurrent failures
    * never clobber each other. */
  def writeAlert(
      alertDir: String,
      jobName: String,
      error: Throwable,
      runTime: java.time.Instant = java.time.Instant.now()
  ): java.nio.file.Path = {
    val safe = jobName.replaceAll("[^A-Za-z0-9_.-]", "_")
    val dir = java.nio.file.Paths.get(alertDir)
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(s"alert_${safe}_${System.nanoTime()}.json")
    val json =
      s"""{"job": "${esc(jobName)}", "status": "failed", """ +
        s""""error_class": "${esc(error.getClass.getName)}", """ +
        s""""error": "${esc(Option(error.getMessage).getOrElse(""))}", """ +
        s""""alert_time": "${runTime.toString}"}"""
    java.nio.file.Files.writeString(p, json)
    p
  }

  /** Run `body`; on failure write an alert, then rethrow — the library
    * twin of the reference's per-task try/except + send_email. */
  def guarded[T](alertDir: String, jobName: String)(body: => T): T =
    try body
    catch {
      case e: Throwable => writeAlert(alertDir, jobName, e); throw e
    }

  /** Session-wide alerting: fires on every failed DataFrame action.
    * Dispatch is asynchronous (listener bus) — alerts land shortly
    * after the failing action returns. */
  final class Listener(alertDir: String) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = ()
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
      writeAlert(alertDir, funcName, exception)
      ()
    }
  }

  def install(spark: SparkSession, alertDir: String): Listener = {
    val l = new Listener(alertDir)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)
}
