package graft.ops

import graft.model.Table
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** `append`: insert source-table rows into target with optional column
  * mapping (reference: python-sdk/src/astro/sql/operators/append.py:15-176;
  * generated SQL `INSERT INTO t (cols) SELECT cols FROM s`,
  * databases/base.py:666-696).
  *
  * Scale note: a pure append is shuffle-free — source partitions are written
  * straight into the target's storage; no repartition, no wide stage.
  */
object Append {

  /** @param columns source→target column mapping. Empty → all target columns
    *   matched by name (the reference's no-columns case appends the full
    *   intersection; append.py:102-121). Unmapped target columns get NULL,
    *   like an INSERT with an explicit column list.
    */
  def apply(
      spark: SparkSession,
      source: Table,
      target: Table,
      columns: Map[String, String] = Map.empty,
  ): Table = {
    appendDf(spark, spark.table(source.qualifiedName), target, columns)
    target
  }

  def appendDf(
      spark: SparkSession,
      source: DataFrame,
      target: Table,
      columns: Map[String, String] = Map.empty,
  ): Table = {
    val tgtSchema = spark.table(target.qualifiedName).schema
    val mapping: Map[String, String] = // target col (lowercase) -> source col
      if (columns.nonEmpty) columns.map { case (s, t) => t.toLowerCase -> s }
      else {
        val src = source.columns.map(c => c.toLowerCase -> c).toMap
        tgtSchema.fields.flatMap(f => src.get(f.name.toLowerCase).map(f.name.toLowerCase -> _)).toMap
      }
    // Build a projection in target column order; insertInto is positional.
    val projected = tgtSchema.fields.toSeq.map { f =>
      mapping.get(f.name.toLowerCase) match {
        case Some(srcCol) => col(srcCol).cast(f.dataType).as(f.name)
        case None         => lit(null).cast(f.dataType).as(f.name)
      }
    }
    source.select(projected: _*).write.mode(SaveMode.Append).insertInto(target.qualifiedName)
    target
  }
}
