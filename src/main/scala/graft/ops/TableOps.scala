package graft.ops

import graft.model.Table
import org.apache.spark.sql.SparkSession

/** `drop_table` (reference: python-sdk/src/astro/sql/operators/drop.py:14-51;
  * SQL `DROP TABLE IF EXISTS` databases/base.py:383-390).
  */
object DropTable {
  def apply(spark: SparkSession, table: Table): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${table.qualifiedName}")
    // A same-named temp view shadows the catalog table; drop it too.
    spark.catalog.dropTempView(table.name)
  }
}

/** `cleanup`: end-of-pipeline GC of temp tables (reference:
  * python-sdk/src/astro/sql/operators/cleanup.py:55-301 — resolve task
  * outputs, filter `TempTable`, drop each). Airflow's DAG-completion dance
  * collapses into an in-process registry dropped in a `finally`.
  */
final class TempRegistry {
  private val tables = scala.collection.mutable.LinkedHashSet[Table]()

  def track(table: Table): Table = synchronized {
    if (table.temp) tables += table
    table
  }

  def tracked: Seq[Table] = synchronized(tables.toSeq)

  /** Drop every tracked temp table (cleanup.py:102-119). Idempotent. */
  def cleanup(spark: SparkSession): Seq[Table] = synchronized {
    val dropped = tables.toSeq
    dropped.foreach(DropTable(spark, _))
    tables.clear()
    dropped
  }
}

object Cleanup {
  /** Explicit-list variant (reference `tables_to_cleanup` param). */
  def apply(spark: SparkSession, tables: Seq[Table]): Seq[Table] = {
    val temps = tables.filter(_.temp)
    temps.foreach(DropTable(spark, _))
    temps
  }
}

/** A minimal pipeline context: tracks temp tables produced along the way and
  * guarantees cleanup, replacing the reference's Airflow-DAG + XCom wiring
  * (SURVEY.md §7 architecture stance).
  */
object Pipeline {
  def run[A](spark: SparkSession)(body: TempRegistry => A): A = {
    val reg = new TempRegistry
    try body(reg)
    finally reg.cleanup(spark)
  }
}
