package graft

import graft.model.{IfExists, Table}
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
}
