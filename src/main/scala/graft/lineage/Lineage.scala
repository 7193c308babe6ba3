package graft.lineage

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.command.DataWritingCommand
import org.apache.spark.sql.util.QueryExecutionListener

/** Dataset-identity + lineage events (reference:
  * python-sdk/src/astro/lineage/facets.py and
  * sql/operators/base_decorator.py:274-356 — every operator emits
  * OpenLineage facets with input/output dataset URIs, row counts and the
  * SQL text).
  *
  * Spark-first shape (SURVEY.md §1.5): one [[QueryExecutionListener]]
  * observes every action on the session — no per-operator instrumentation.
  * Inputs come from the optimized plan's relations (catalog tables and file
  * scans), outputs from write commands; events are OpenLineage-style JSON
  * objects appended to an in-memory ring + optional NDJSON sink.
  *
  * Scale note: listeners run on the driver per query COMPLETION, not per
  * row — cost is O(plan size), independent of data volume.
  */
final class LineageEvent(
    val eventTime: String,
    val durationNs: Long,
    val inputs: Seq[String],
    val outputs: Seq[String],
    val success: Boolean,
) {
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
    def arr(xs: Seq[String]) = xs.map(x => s""""${esc(x)}"""").mkString("[", ",", "]")
    s"""{"eventTime":"${esc(eventTime)}","durationNs":$durationNs,""" +
      s""""inputs":${arr(inputs)},"outputs":${arr(outputs)},"success":$success}"""
  }
}

final class LineageListener(sinkPath: Option[String] = None, maxEvents: Int = 1000)
    extends QueryExecutionListener {

  private val events = new ConcurrentLinkedQueue[LineageEvent]()

  def collected: Seq[LineageEvent] = events.asScala.toSeq

  private def record(qe: QueryExecution, durationNs: Long, success: Boolean): Unit = {
    val plan = qe.optimizedPlan
    val inputs = plan.collect {
      case r: LogicalRelation =>
        r.catalogTable.map(t => s"table://${t.identifier.unquotedString}")
          .getOrElse("file://" + r.relation.toString.take(200))
      case h: HiveTableRelation => s"table://${h.tableMeta.identifier.unquotedString}"
    }.distinct
    val outputs = qe.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.command.DataWritingCommandExec =>
        e.cmd match {
          case c: DataWritingCommand =>
            c.outputColumnNames // touch to keep exhaustivity simple
            commandOutput(c)
        }
    }.flatten.distinct
    // metadata-only actions (DESCRIBE, catalog lookups, driver collects with
    // no dataset identity) carry no lineage — skip unless a failure
    if (inputs.isEmpty && outputs.isEmpty && success) return
    val ev = new LineageEvent(java.time.Instant.now().toString, durationNs, inputs, outputs, success)
    events.add(ev)
    while (events.size > maxEvents) events.poll()
    sinkPath.foreach { p =>
      Files.writeString(Paths.get(p), ev.toJson + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  private def commandOutput(c: DataWritingCommand): Seq[String] = c match {
    case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand =>
      Seq(s"table://${c.table.identifier.unquotedString}")
    case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
      c.catalogTable.map(t => s"table://${t.identifier.unquotedString}")
        .orElse(Some(s"file://${c.outputPath}")).toSeq
    case _ => Seq(c.getClass.getSimpleName)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(qe, durationNs, success = true)

  /** NOTE: Spark invokes this only for EXECUTION failures — analysis-time
    * errors (e.g. unresolved tables) throw before a QueryExecution exists
    * and never reach any QueryExecutionListener.
    */
  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    record(qe, 0L, success = false)
}

object Lineage {

  /** Attach a lineage listener to the session; returns it for inspection.
    * Events append to `sinkPath` as NDJSON when given.
    */
  def attach(spark: SparkSession, sinkPath: Option[String] = None): LineageListener = {
    val l = new LineageListener(sinkPath)
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: LineageListener): Unit =
    spark.listenerManager.unregister(l)
}
