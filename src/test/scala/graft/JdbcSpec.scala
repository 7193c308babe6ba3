package graft

import graft.model.{IfExists, MergeConflict, Table}
import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** JDBC round-trip against embedded Derby (in-memory; the JDBC code path is
  * identical for any server-mode database).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write / append / exception / read round-trip") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    Jdbc.write(spark, df, url, "t_roundtrip", IfExists.Replace)
    val back = Jdbc.read(spark, url, "t_roundtrip")
    assert(back.as[(Long, String, Double)].collect().toSet == Set((1L, "a", 1.5), (2L, "b", 2.5)))
    Jdbc.write(spark, Seq((3L, "c", 3.5)).toDF("id", "name", "score"), url, "t_roundtrip", IfExists.Append)
    assert(Jdbc.read(spark, url, "t_roundtrip").count() == 3)
    intercept[Exception] {
      Jdbc.write(spark, df, url, "t_roundtrip", IfExists.Exception)
    }
  }

  test("partitioned read fans out over range predicates; filters push down") {
    val df = (0 until 100).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    Jdbc.write(spark, df, url, "t_part", IfExists.Replace)
    val part = Jdbc.readPartitioned(spark, url, "t_part", "id", 0, 99, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    val filtered = part.where(col("id") > 90)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("id"), scan)
    assert(filtered.count() == 9)
  }

  test("importTable lands a remote table in the Spark catalog idempotently") {
    Jdbc.write(spark, Seq((7L, "x")).toDF("id", "v"), url, "t_imp", IfExists.Replace)
    Jdbc.importTable(spark, url, "t_imp", Table("graft_jdbc_imp"))
    Jdbc.importTable(spark, url, "t_imp", Table("graft_jdbc_imp")) // rerun-safe
    assert(spark.table("graft_jdbc_imp").as[(Long, String)].collect().toSeq == Seq((7L, "x")))
  }

  test("merge strategy=update runs an in-database ANSI MERGE (upsert)") {
    Jdbc.write(spark, Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"),
      url, "t_merge_u", IfExists.Replace)
    val src = Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("id", "name", "score")
    Jdbc.merge(spark, src, url, "t_merge_u", Seq("id"), MergeConflict.Update)
    val back = Jdbc.read(spark, url, "t_merge_u").as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
  }

  test("merge strategy=ignore inserts only new keys") {
    Jdbc.write(spark, Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"),
      url, "t_merge_i", IfExists.Replace)
    val src = Seq((2L, "SHOULD_NOT_LAND", 0.0), (3L, "c", 3.0)).toDF("id", "name", "score")
    Jdbc.merge(spark, src, url, "t_merge_i", Seq("id"), MergeConflict.Ignore)
    val back = Jdbc.read(spark, url, "t_merge_i").as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("merge strategy=exception fails on existing keys, target untouched, stage dropped") {
    Jdbc.write(spark, Seq((1L, "a", 1.0)).toDF("id", "name", "score"),
      url, "t_merge_e", IfExists.Replace)
    val clash = Seq((1L, "dup", 9.0), (4L, "d", 4.0)).toDF("id", "name", "score")
    val e = intercept[IllegalStateException] {
      Jdbc.merge(spark, clash, url, "t_merge_e", Seq("id"), MergeConflict.Exception)
    }
    assert(e.getMessage.contains("already exist"))
    assert(Jdbc.read(spark, url, "t_merge_e").count() == 1) // nothing landed
    val ok = Seq((4L, "d", 4.0)).toDF("id", "name", "score")
    Jdbc.merge(spark, ok, url, "t_merge_e", Seq("id"), MergeConflict.Exception)
    assert(Jdbc.read(spark, url, "t_merge_e").count() == 2)
    // staging tables are cleaned up on both paths (Derby upcases unquoted names)
    val stale = Jdbc.read(spark, url,
      "(SELECT COUNT(*) AS n FROM SYS.SYSTABLES WHERE TABLENAME LIKE 'T_MERGE_E_STAGE_%') probe")
    assert(stale.collect()(0).get(0).toString == "0")
  }

  test("merge canonicalizes caller-cased conflict columns; initUniqueIndex is idempotent") {
    Jdbc.write(spark, Seq((1L, "a")).toDF("id", "name"), url, "t_merge_c", IfExists.Replace)
    val src = Seq((1L, "a2"), (2L, "b")).toDF("id", "name")
    // "ID" must resolve to the actual quoted column "id" before SQL gen
    Jdbc.merge(spark, src, url, "t_merge_c", Seq("ID"), MergeConflict.Update,
      initUniqueIndex = true)
    Jdbc.merge(spark, Seq((3L, "c")).toDF("id", "name"), url, "t_merge_c", Seq("ID"),
      MergeConflict.Update, initUniqueIndex = true) // index already exists -> no-op
    val back = Jdbc.read(spark, url, "t_merge_c").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("dialect SQL: ON CONFLICT (postgres/sqlite/duckdb) and ON DUPLICATE KEY (mysql)") {
    val cols = Seq("id" -> "id", "name" -> "name", "score" -> "score")
    val up = Jdbc.OnConflict.upsertSql("t", "stg", cols, Seq("id"), update = true)
    assert(up ==
      """INSERT INTO t ("id", "name", "score") SELECT "id", "name", "score" FROM stg """ +
        """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "score" = EXCLUDED."score"""")
    val ig = Jdbc.OnConflict.upsertSql("t", "stg", cols, Seq("id"), update = false)
    assert(ig.endsWith("""ON CONFLICT ("id") DO NOTHING"""))
    val my = Jdbc.OnDuplicateKey.upsertSql("t", "stg", cols, Seq("id"), update = true)
    assert(my ==
      "INSERT INTO t (`id`, `name`, `score`) SELECT `id`, `name`, `score` FROM stg " +
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), `score` = VALUES(`score`)")
    val myIg = Jdbc.OnDuplicateKey.upsertSql("t", "stg", cols, Seq("id"), update = false)
    assert(myIg.startsWith("INSERT IGNORE INTO t"))
    // key-only tables degrade to insert-only on every dialect
    val keyOnly = Jdbc.AnsiMerge.upsertSql("t", "stg", Seq("id" -> "id"), Seq("id"), update = true)
    assert(!keyOnly.contains("WHEN MATCHED"))
  }
}
