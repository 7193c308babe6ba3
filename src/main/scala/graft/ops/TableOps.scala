package graft.ops

import graft.model.Table
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Idempotent managed-table creation.
  *
  * The engine's "database" is the Spark catalog (SURVEY.md §7). With a
  * non-persistent (in-memory) catalog, a managed table's warehouse directory
  * survives the session while its catalog entry does not — so the next
  * session's CREATE fails with LOCATION_ALREADY_EXISTS. The reference's CTAS
  * is rerunnable because its tables live in real databases
  * (python-sdk/src/astro/databases/base.py:363-381 drops then recreates);
  * [[prepareCreate]] restores that semantics here: drop the catalog entry
  * (which removes the location when the entry exists) AND delete any stale
  * orphaned location before creating.
  */
object TableIO {

  /** Default managed location for `table` (database location + table name). */
  private[graft] def managedLocation(spark: SparkSession, table: Table): Path = {
    val db = table.metadata.database.orElse(table.metadata.schema)
      .getOrElse(spark.catalog.currentDatabase)
    val dbLoc = spark.sql(s"DESCRIBE DATABASE `${db.replace("`", "``")}`")
      .collect()
      .find(_.getString(0).equalsIgnoreCase("Location"))
      .map(_.getString(1))
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    new Path(dbLoc, table.name.toLowerCase)
  }

  /** Make a subsequent CREATE/saveAsTable of `table` safe regardless of what
    * a previous (possibly crashed) session left behind.
    */
  def prepareCreate(spark: SparkSession, table: Table): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${table.qualifiedName}")
    val loc = managedLocation(spark, table)
    val fs  = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Rerunnable overwrite-create of a managed table; `partitionBy` lays the
    * table out hive-style so filters on those columns prune whole
    * directories at scan time (partition pruning — the first scale lever
    * for selective queries over append-style fact tables).
    */
  def overwrite(
      spark: SparkSession,
      df: DataFrame,
      table: Table,
      partitionBy: Seq[String] = Nil,
  ): Table = {
    prepareCreate(spark, table)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table.qualifiedName)
    table
  }

  /** Delete the managed location ONLY when it is an orphan (no catalog
    * entry) — for appending/resuming writers that must keep existing data
    * when the table legitimately exists.
    */
  def clearOrphanLocation(spark: SparkSession, table: Table): Unit =
    if (!spark.catalog.tableExists(table.qualifiedName)) {
      val loc = managedLocation(spark, table)
      val fs  = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }

  /** Sweep stale `_tmp_*` staging directories (crashed runs) out of the
    * current database's warehouse location: any `_tmp_`-prefixed directory
    * with NO catalog entry is an orphan — a live temp table always has one.
    * Verify/Bench call this at startup so leftover staging dirs from a
    * killed JVM can't litter "ignored path" warnings (or disk) forever.
    */
  def sweepOrphanTemps(spark: SparkSession, minAgeMs: Long = 3600000L): Int = {
    val dbRoot = managedLocation(spark, Table("probe")).getParent
    val fs     = dbRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dbRoot)) return 0
    val cutoff = System.currentTimeMillis() - minAgeMs
    val orphans = fs.listStatus(dbRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(Table.TempPrefix + "_"))
      // the catalog check only sees THIS session's in-memory catalog, but the
      // warehouse dir is shared across JVMs — an age floor keeps a concurrent
      // session's seconds-old live staging dir safe while still reclaiming
      // genuinely dead leftovers from crashed runs
      .filter(_.getModificationTime < cutoff)
      .map(_.getPath)
      .filterNot(p => spark.catalog.tableExists(p.getName))
    orphans.foreach(fs.delete(_, true))
    orphans.size
  }

  /** Silence the two benign log lines that recur in clean runs: reading a
    * legitimately-empty table emits `WARN DataSource: All paths were
    * ignored` (the dir holds only `_SUCCESS`), and each fixture stream
    * re-warns that AQE is off for stateful workloads. Both loggers drop to
    * ERROR; everything else keeps the session's WARN level.
    */
  def quietKnownLogNoise(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel("org.apache.spark.sql.execution.datasources.DataSource", Level.ERROR)
    Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream", Level.ERROR)
  }

  /** Rerunnable bucketed-table create: rows hash-partition into `numBuckets`
    * files per partition on `bucketCols` (optionally sorted within buckets).
    * Two tables bucketed on the same keys with the same bucket count join
    * WITHOUT a shuffle — the co-located-join scale play for fact-fact joins
    * repeated across a pipeline: pay the clustering write once, skip the
    * exchange on every subsequent join/aggregation on those keys.
    */
  def overwriteBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: Table,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
  ): Table = {
    require(bucketCols.nonEmpty, "bucketed write requires bucket columns")
    require(numBuckets > 0, "numBuckets must be positive")
    prepareCreate(spark, table)
    // Pre-partition to the bucket layout: without this every input partition
    // holds an open writer PER bucket (numPartitions × numBuckets writers —
    // memory pressure and a small-file explosion); with it each task writes
    // exactly its one bucket file.
    val clustered = df.repartition(numBuckets, bucketCols.map(df.col): _*)
    val w0 = clustered.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val w  = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table.qualifiedName)
    table
  }

  /** Append to an existing bucketed table with the SAME bucket spec (Spark
    * rejects mismatched specs, so the layout invariant — and the
    * zero-exchange reads it buys — survives every append). Same
    * pre-clustering as [[overwriteBucketed]]: one writer per bucket.
    */
  def appendBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: Table,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
  ): Table = {
    require(spark.catalog.tableExists(table.qualifiedName),
      s"appendBucketed: ${table.qualifiedName} must exist (use overwriteBucketed first)")
    val clustered = df.repartition(numBuckets, bucketCols.map(df.col): _*)
    val w0 = clustered.write.mode(SaveMode.Append)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val w  = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table.qualifiedName)
    table
  }

  /** Compact a fragmented managed table: rewrite it into
    * `ceil(totalBytes / targetFileBytes)` files. For a hive-partitioned
    * table the rewrite clusters by (partition columns, split key) where the
    * split count is sized from the average bytes per partition directory —
    * each directory ends with ≈ `dirBytes / targetFileBytes` files under an
    * even value distribution; a heavily skewed partition value gets
    * proportionally LARGER files (the split count is corpus-average-based),
    * never a file explosion. Streaming appends, micro-batch loads, and
    * high-parallelism writers leave thousands of small files behind; at
    * warehouse scale every later scan then pays open/footer overhead per
    * file and the driver pays listing time — compaction is the standing
    * maintenance op that keeps scan cost proportional to bytes, not file
    * count (the reference's warehouses run this internally; a Spark-native
    * table needs it as an explicit op).
    *
    * Returns (fileCountBefore, fileCountAfter). Swap discipline: the
    * compacted copy is staged under a temp table; the original's directory
    * is moved aside to a `<name>__precompact_*` path on the FILESYSTEM
    * (deliberately not a catalog rename — dropping a renamed managed
    * backup would chase its stale partition-location metadata into the
    * new table's directories); the original's now-empty catalog entry is
    * dropped, the staged copy takes the name, and only then is the backup
    * path deleted. A crash at any step leaves at least one complete copy
    * of the data on disk (worst case: recoverable under the
    * `__precompact` path, which the `_tmp_` orphan sweep never touches).
    */
  def compact(
      spark: SparkSession,
      table: Table,
      targetFileBytes: Long = 128L * 1024 * 1024,
  ): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val db = table.metadata.database.orElse(table.metadata.schema)
    def meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table.name, db))
    val catalogTable  = meta
    val partitionCols = catalogTable.partitionColumnNames
    val df  = spark.table(table.qualifiedName)
    val loc = new Path(catalogTable.location)
    val fs  = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it  = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
      while (it.hasNext) {
        val s = it.next()
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) buf += s
      }
      buf.toSeq
    }

    val before     = dataFiles(loc)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles =
      math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    // Stage the compacted copy under a temp name (same database — ALTER
    // TABLE RENAME cannot cross databases). Partitioned tables
    // cluster by (partition cols, deterministic split key): one split per
    // ~targetFileBytes of the average directory, so each task writes whole
    // files into one directory instead of a sliver into every directory.
    val staged = Table.temp(table.metadata)
    prepareCreate(spark, staged)
    val repart =
      if (partitionCols.isEmpty) df.repartition(targetFiles)
      else {
        val numDirs = math.max(1, before.map(_.getPath.getParent.toString).distinct.size)
        val splitsPerDir = math.max(1,
          math.ceil(totalBytes.toDouble / numDirs / targetFileBytes).toInt)
        val dataCols = df.columns.filterNot(c => partitionCols.exists(_.equalsIgnoreCase(c)))
        val splitKey =
          if (splitsPerDir == 1 || dataCols.isEmpty) org.apache.spark.sql.functions.lit(0)
          else org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(dataCols.map(df.col): _*),
            org.apache.spark.sql.functions.lit(splitsPerDir))
        df.repartition(targetFiles, partitionCols.map(df.col) :+ splitKey: _*)
      }
    val w = repart.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(staged.qualifiedName)

    // swap: move the original's data aside on the filesystem, drop its
    // catalog entry (the managed-drop deletes are no-ops — the dirs are
    // already moved), rename the staged copy in, then reclaim the backup
    val backupLoc = new Path(loc.getParent,
      table.name.toLowerCase + "__precompact_" +
        java.util.UUID.randomUUID().toString.take(8))
    require(fs.rename(loc, backupLoc), s"could not move $loc aside to $backupLoc")
    spark.sql(s"DROP TABLE IF EXISTS ${table.qualifiedName}")
    spark.sql(s"ALTER TABLE ${staged.qualifiedName} RENAME TO ${table.qualifiedName}")
    // the rename moves the location but partition entries still point at the
    // staged directory — re-list them from the new location
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE ${table.qualifiedName}")
    spark.catalog.refreshTable(table.qualifiedName)
    fs.delete(backupLoc, true)
    val after = dataFiles(new Path(meta.location))
    (before.size, after.size)
  }

  // ===== Atomic publication via view indirection =====
  //
  // [[compact]] and merge-update swap a staged table into the target name via
  // DROP + ALTER RENAME — correct data, but a concurrent reader resolving the
  // name inside that two-statement window sees TABLE_NOT_FOUND. Warehouses
  // with ACID tables (the reference delegates to them, e.g. Delta MERGE)
  // don't expose that window; a Spark-catalog-native engine needs its own
  // indirection. The pattern here: the PUBLISHED name is a catalog VIEW over
  // a generation-numbered physical table (`name__gen<N>`). A rewrite writes
  // `__gen<N+1>` and flips the view with `ALTER VIEW ... AS` — which runs as
  // ONE `SessionCatalog.alterTable` (verified against Spark 4.1's
  // AlterViewAsCommand bytecode), a single synchronized catalog mutation,
  // so any reader resolves old-or-new, never absent. `CREATE OR REPLACE
  // VIEW` is NOT equivalent: Spark implements its replace path as dropTable
  // + createTable, an absence window a loaded racing reader really hits
  // (caught by AtomicSwapSpec under full-suite load). CREATE is used only
  // for the first publish, when no reader can know the name yet. Old
  // generations are reclaimed AFTER the flip; `keepGenerations` ≥ 2 leaves
  // the previous generation's files on disk through the flip so a reader
  // that resolved just before it can still finish its scan (the
  // snapshot-retention idea, minus the log).

  private val GenSuffix = "__gen"

  /** Physical generation table name for `table`. */
  private def genTable(table: Table, n: Int): Table =
    Table(s"${table.name}$GenSuffix$n", table.metadata, temp = false)

  /** Generation numbers currently in the catalog for `table`, ascending. */
  private[graft] def generations(spark: SparkSession, table: Table): Seq[Int] = {
    val db = table.metadata.database.orElse(table.metadata.schema)
      .getOrElse(spark.catalog.currentDatabase)
    val prefix = s"${table.name.toLowerCase}$GenSuffix"
    spark.sessionState.catalog.listTables(db)
      .map(_.table.toLowerCase)
      .collect { case t if t.startsWith(prefix) && t.drop(prefix.length).forall(_.isDigit) =>
        t.drop(prefix.length).toInt
      }
      .sorted
  }

  /** Atomically publish `df` under `table.qualifiedName`.
    *
    * Writes the next generation table, then flips the published VIEW in one
    * `CREATE OR REPLACE VIEW` — concurrent readers of the name see the old
    * or the new generation, never a missing table (AtomicSwapSpec hammers
    * this with a racing reader). Generations older than `keepGenerations`
    * are dropped after the flip.
    *
    * Migration: if a plain TABLE already occupies the name it is catalog-
    * renamed to a generation slot first (metadata-only move). That rename +
    * view-create pair is the one remaining non-atomic window, paid once per
    * table at adoption time, never again on subsequent publishes.
    */
  def publish(
      spark: SparkSession,
      df: DataFrame,
      table: Table,
      keepGenerations: Int = 2,
  ): Table = {
    require(keepGenerations >= 1, "keepGenerations must be >= 1")
    val cat   = spark.sessionState.catalog
    val db    = table.metadata.database.orElse(table.metadata.schema)
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table.name, db)
    val migrating = cat.tableExists(ident) &&
      cat.getTableMetadata(ident).tableType !=
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW
    val prior = generations(spark, table)
    // on migration the occupying plain table moves into the lower slot so
    // the freshly-written data stays the newest generation
    val oldSlot = prior.lastOption.getOrElse(-1) + 1
    val newSlot = if (migrating) oldSlot + 1 else oldSlot
    val gen     = genTable(table, newSlot)
    overwrite(spark, df, gen)
    if (migrating)
      // one-time: move the plain table aside (metadata-only rename) so the
      // name frees up for the view; this rename + view-create pair is the
      // single non-atomic window, paid only at adoption
      spark.sql(s"ALTER TABLE ${table.qualifiedName} RENAME TO ${genTable(table, oldSlot).qualifiedName}")
    // ALTER VIEW AS = one catalog.alterTable (atomic); CREATE OR REPLACE
    // VIEW would drop-then-create and expose an absence window (see the
    // section comment above)
    if (cat.tableExists(ident) && !migrating)
      spark.sql(s"ALTER VIEW ${table.qualifiedName} AS SELECT * FROM ${gen.qualifiedName}")
    else
      spark.sql(s"CREATE VIEW ${table.qualifiedName} AS SELECT * FROM ${gen.qualifiedName}")
    // reclaim: everything except the newest `keepGenerations` generations
    generations(spark, table).dropRight(keepGenerations)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS ${genTable(table, n).qualifiedName}"))
    table
  }

  /** Current physical generation behind a published name (for callers that
    * need the table, e.g. [[compactPublished]]).
    */
  def publishedGeneration(spark: SparkSession, table: Table): Option[Table] =
    generations(spark, table).lastOption.map(genTable(table, _))

  /** Time-travel read over a published table's retained generations:
    * `generationsBack = 0` is the live generation (what the view serves),
    * `1` is the previous publish, and so on up to `keepGenerations - 1`.
    * Retention is what [[publish]]'s `keepGenerations` left in the catalog —
    * this is snapshot-read over that window, free with the generation
    * scheme (the older physical tables are already there).
    */
  def readGeneration(
      spark: SparkSession,
      table: Table,
      generationsBack: Int = 0,
  ): org.apache.spark.sql.DataFrame = {
    val gens = generations(spark, table)
    require(gens.nonEmpty, s"${table.qualifiedName} has no published generations")
    require(generationsBack >= 0 && generationsBack < gens.size,
      s"generationsBack=$generationsBack out of range: " +
        s"${gens.size} generation(s) retained for ${table.qualifiedName}")
    spark.table(genTable(table, gens(gens.size - 1 - generationsBack)).qualifiedName)
  }

  /** [[compact]] for a PUBLISHED table: rewrites the current generation into
    * size-targeted files as the next generation and flips the view — readers
    * never see the name absent (vs the filesystem swap in [[compact]]).
    * Returns (fileCountBefore, fileCountAfter).
    */
  def compactPublished(
      spark: SparkSession,
      table: Table,
      targetFileBytes: Long = 128L * 1024 * 1024,
      keepGenerations: Int = 2,
  ): (Int, Int) = {
    val cur = publishedGeneration(spark, table).getOrElse(
      throw new IllegalStateException(
        s"${table.qualifiedName} has no published generation — use publish() first"))
    def files(t: Table): Int = {
      val loc = new Path(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t.name,
          t.metadata.database.orElse(t.metadata.schema))).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(loc, true)
      var n  = 0
      while (it.hasNext) {
        val s = it.next().getPath.getName
        if (!s.startsWith("_") && !s.startsWith(".")) n += 1
      }
      n
    }
    val beforeCount = files(cur)
    val df         = spark.table(cur.qualifiedName)
    val totalBytes = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(cur.name,
        cur.metadata.database.orElse(cur.metadata.schema)))
      .stats.map(_.sizeInBytes.toLong)
      .getOrElse {
        val loc = new Path(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(cur.name,
            cur.metadata.database.orElse(cur.metadata.schema))).location)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(loc).getLength
      }
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    publish(spark, df.repartition(targetFiles), table, keepGenerations)
    val afterCount = files(publishedGeneration(spark, table).get)
    (beforeCount, afterCount)
  }
}

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
