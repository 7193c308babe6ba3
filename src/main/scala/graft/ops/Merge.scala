package graft.ops

import graft.model.{MergeConflict, Table}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, count, lit, raise_error, when}

/** `merge`: upsert source into target on conflict columns, strategy
  * ignore | update | exception
  * (reference: python-sdk/src/astro/sql/operators/merge.py:16-200; SQL
  * dialects e.g. Postgres `INSERT ... ON CONFLICT` databases/postgres.py:155-209,
  * Snowflake `MERGE INTO` databases/snowflake.py:860-1006, BigQuery
  * databases/google/bigquery.py:266-308).
  *
  * Spark-first rewrite over plain catalog tables (no unique constraints, no
  * per-dialect SQL — SURVEY.md §2 op 8 option (b)):
  *
  *  - `ignore`    → anti-join the source against the target on the keys and
  *                  APPEND only the new rows (insert-only-new). Shuffle on the
  *                  key columns only; the target is never rewritten.
  *  - `update`    → full-outer join target×source on the keys; matched rows
  *                  take source values for the mapped columns (including
  *                  NULLs, matching `SET col = EXCLUDED.col`), unmatched
  *                  source rows are inserted; target is rewritten via a temp
  *                  table (plain parquet is copy-on-write; a Delta-format
  *                  catalog would instead take a literal `MERGE INTO`).
  *  - `exception` → fail if any source key already exists (semi-join count),
  *                  else plain insert.
  *
  * **Duplicate conflict keys within the source raise** `IllegalStateException`
  * — the documented stance, matching Snowflake's default
  * ERROR_ON_NONDETERMINISTIC_MERGE and Postgres's "cannot affect row a second
  * time" (a silent arbitrary winner would be nondeterministic at scale).
  * The check rides INSIDE the merge plan — a `count(*) over (partition by
  * keys)` window guarding the first key column — so it reuses the key
  * shuffle the join needs anyway instead of a separate full-source
  * aggregate job (at 100 TB the old pre-check was a full extra pass).
  * Pipelines that guarantee unique sources can skip even the window with
  * `failOnDuplicateSourceKeys = false` (with a dup source that setting
  * yields nondeterministic results, exactly like the warehouses' opt-outs).
  *
  * Scale: both sides shuffle by the conflict keys; AQE broadcasts the source
  * when it is small and handles key skew. The `update` rewrite is one extra
  * full write — the unavoidable cost of upsert on immutable files.
  */
object Merge {

  private val DupMsg =
    "merge source contains duplicate conflict-key rows - nondeterministic merge " +
      "(matches Snowflake ERROR_ON_NONDETERMINISTIC_MERGE / Postgres ON CONFLICT semantics)"

  /** The in-plan guard raises through the executor as a wrapped
    * SparkRuntimeException; surface the documented IllegalStateException.
    */
  private def translatingDupError[T](body: => T): T =
    try body
    catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null) {
          if (Option(c.getMessage).exists(_.contains("duplicate conflict-key rows")))
            throw new IllegalStateException(DupMsg, e)
          c = c.getCause
        }
        throw e
    }

  def apply(
      spark: SparkSession,
      source: Table,
      target: Table,
      columns: Map[String, String], // source col -> target col
      conflictColumns: Seq[String], // target key columns
      strategy: MergeConflict,
      failOnDuplicateSourceKeys: Boolean = true,
  ): Table =
    mergeDf(spark, spark.table(source.qualifiedName), target, columns, conflictColumns, strategy,
      failOnDuplicateSourceKeys)

  def mergeDf(
      spark: SparkSession,
      source: DataFrame,
      target: Table,
      columns: Map[String, String],
      conflictColumns: Seq[String],
      strategy: MergeConflict,
      failOnDuplicateSourceKeys: Boolean = true,
  ): Table = {
    require(conflictColumns.nonEmpty, "merge requires at least one conflict column")
    val tgtDf     = spark.table(target.qualifiedName)
    val tgtSchema = tgtDf.schema
    val mapping: Map[String, String] = // target col -> source col
      if (columns.nonEmpty) columns.map { case (s, t) => t -> s }
      else {
        val srcByLower = source.columns.map(c => c.toLowerCase -> c).toMap
        tgtSchema.fieldNames.flatMap(c => srcByLower.get(c.toLowerCase).map(c -> _)).toMap
      }
    val missingKeys = conflictColumns.filterNot(k => mapping.keys.exists(_.equalsIgnoreCase(k)))
    require(missingKeys.isEmpty, s"conflict columns not covered by the column mapping: $missingKeys")

    // Source projected to target names/types for the mapped columns.
    val srcMapped = source.select(mapping.toSeq.sortBy(_._1).map { case (tgt0, src0) =>
      val f = tgtSchema.fields.find(_.name.equalsIgnoreCase(tgt0)).getOrElse(
        throw new IllegalArgumentException(s"unknown target column in mapping: $tgt0"))
      col(src0).cast(f.dataType).as(f.name)
    }: _*)

    val keys = conflictColumns.map(k => tgtSchema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(
      throw new IllegalArgumentException(s"unknown conflict column: $k")))

    // Dup-key rejection inside the plan: per-key window count; a count > 1
    // detonates raise_error folded into the FIRST KEY COLUMN (a column every
    // strategy must evaluate, so pruning cannot drop the guard). The window's
    // HashPartitioning(keys) satisfies the downstream join requirement —
    // no exchange is added and the old separate aggregate job is gone.
    val srcT =
      if (!failOnDuplicateSourceKeys) srcMapped
      else {
        val k0     = keys.head
        val k0Type = tgtSchema.fields.find(_.name == k0).get.dataType
        srcMapped
          .withColumn("__kc", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
          .withColumn(k0,
            when(col("__kc") > 1, raise_error(lit(DupMsg)).cast(k0Type)).otherwise(col(k0)))
          .drop("__kc")
      }

    // Expand the mapped projection to the full target schema (unmapped -> NULL),
    // like INSERT INTO t (mapped...) SELECT ... .
    def expand(df: DataFrame): DataFrame = {
      val have = df.columns.map(_.toLowerCase).toSet
      df.select(tgtSchema.fields.toSeq.map { f =>
        if (have(f.name.toLowerCase)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }

    translatingDupError(strategy match {
      case MergeConflict.Ignore =>
        val newRows = expand(srcT.join(tgtDf.select(keys.map(col): _*), keys, "left_anti"))
        appendViaStaging(spark, newRows, target)

      case MergeConflict.Exception =>
        val conflicts = srcT.join(tgtDf.select(keys.map(col): _*), keys, "left_semi").limit(1).count()
        if (conflicts > 0)
          throw new IllegalStateException(s"merge conflict on ${keys.mkString(",")} with if_conflicts=exception")
        appendViaStaging(spark, expand(srcT), target)

      case MergeConflict.Update =>
        val t = tgtDf.alias("t")
        val s = srcT.withColumn("__src_match", lit(true)).alias("s")
        val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
        val mappedLower = mapping.keys.map(_.toLowerCase).toSet
        val outCols: Seq[Column] = tgtSchema.fields.toSeq.map { f =>
          val n = f.name
          if (keys.exists(_.equalsIgnoreCase(n)))
            coalesce(col(s"s.$n"), col(s"t.$n")).as(n)
          else if (mappedLower(n.toLowerCase))
            // matched or inserted -> source value (even NULL, like
            // `SET col = EXCLUDED.col`); target-only row -> target value
            when(col("s.__src_match"), col(s"s.$n")).otherwise(col(s"t.$n")).as(n)
          else
            col(s"t.$n").as(n) // unmapped: kept on match, NULL on insert
        }
        val merged = t.join(s, joinCond, "full_outer").select(outCols: _*)
        rewrite(spark, merged, target)
    })
    target
  }

  /** Append `rows` into `target` when `rows`'s lineage reads `target` itself:
    * stage the (delta-sized) rows first, then append from the staging table.
    */
  private def appendViaStaging(spark: SparkSession, rows: DataFrame, target: Table): Unit = {
    val staging = Table.temp()
    TableIO.overwrite(spark, rows, staging)
    try
      spark.table(staging.qualifiedName).write.mode(SaveMode.Append).insertInto(target.qualifiedName)
    finally
      spark.sql(s"DROP TABLE IF EXISTS ${staging.qualifiedName}")
  }

  /** Full rewrite of `target` with `result` (which reads `target`): stage to a
    * temp table to break the self-read, then swap the staging table into the
    * target name via a catalog rename — ONE data write; the swap is a
    * metadata/filesystem move, not a second full rewrite. Falls back to
    * write-twice if the catalog refuses the rename.
    */
  private def rewrite(spark: SparkSession, result: DataFrame, target: Table): Unit = {
    val staging = Table.temp()
    TableIO.overwrite(spark, result, staging)
    try {
      spark.sql(s"DROP TABLE IF EXISTS ${target.qualifiedName}")
      spark.sql(s"ALTER TABLE ${staging.qualifiedName} RENAME TO ${target.qualifiedName}")
    } catch {
      case _: Throwable =>
        TableIO.overwrite(spark, spark.table(staging.qualifiedName), target)
        spark.sql(s"DROP TABLE IF EXISTS ${staging.qualifiedName}")
    }
  }
}
