package graft

import graft.model._
import graft.ops._

class TransformChecksSpec extends SparkSpec {
  import spark.implicits._

  test("templating: table params become identifiers, scalars become binds") {
    val rendered = Templating.render(
      "SELECT * FROM {{t}} WHERE x > :y AND z = {{ spaced }}",
      Map("t" -> "`tbl`", "spaced" -> "`v`"), Set("y"))
    assert(rendered == "SELECT * FROM `tbl` WHERE x > :y AND z = `v`")
    intercept[IllegalArgumentException](Templating.render("{{missing}}", Map.empty, Set.empty))
  }

  test("transform with DataFrame + scalar params") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val out = Transform.run(spark,
      "SELECT k, v * 2 AS dbl FROM {{in}} WHERE v >= :minv ORDER BY k",
      Map("in" -> df, "minv" -> 2))
    assert(out.as[(String, Int)].collect().toSeq == Seq(("b", 4), ("c", 6)))
  }

  test("transform CTAS materializes and overwrites") {
    val df  = Seq((1, "x")).toDF("id", "v")
    val out = Table("transform_ctas_spec")
    Transform.toTable(spark, "SELECT id, v FROM {{d}}", out, Map("d" -> df))
    assert(spark.table(out.qualifiedName).count() == 1)
    Transform.toTable(spark, "SELECT id FROM {{d}}", out, Map("d" -> df))
    assert(spark.table(out.qualifiedName).columns.toSeq == Seq("id"))
    DropTable(spark, out)
  }

  test("transform_file reads SQL from disk") {
    val dir  = tmpDir()
    val path = s"$dir/q.sql"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "SELECT count(*) AS n FROM {{d}}")
    val out = Table("transform_file_spec")
    Transform.fromFile(spark, path, out, Map("d" -> Seq(1, 2, 3).toDF("x")))
    assert(spark.table(out.qualifiedName).as[Long].collect().toSeq == Seq(3L))
    DropTable(spark, out)
  }

  test("run_raw_sql: response size cap + fail_on_empty + row list format") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val rows = RawSql.run(spark, "SELECT x FROM {{d}} ORDER BY x", Map("d" -> df),
      RawSql.ResultsFormat.RowList, responseSize = 2)
    assert(rows.swap.toOption.get.map(_.getInt(0)) == Seq(1, 2))
    intercept[IllegalStateException] {
      RawSql.run(spark, "SELECT x FROM {{d}} WHERE x > 99", Map("d" -> df), failOnEmpty = true)
    }
  }

  test("query_modifier runs pre/post statements around the body") {
    val qm = QueryModifier(
      preQueries = Seq("SET spark.sql.cbo.enabled=true"),
      postQueries = Seq("SET spark.sql.cbo.enabled=false"))
    val during = qm.runWith(spark)(spark.conf.get("spark.sql.cbo.enabled"))
    assert(during == "true")
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false")
  }

  test("check_column: one-pass stats with bounds and tolerance") {
    val df = Seq(
      (1, Some("a"), 10.0), (2, Some("b"), 20.0), (3, None, 30.0), (3, Some("d"), 40.0),
    ).toDF("id", "name", "score")
    val res = Checks.checkColumn(df, Map(
      "name"  -> Map("null_check" -> Checks.Bound(equalTo = Some(1))),
      "id"    -> Map("unique_check" -> Checks.Bound(equalTo = Some(1)),
                     "distinct_check" -> Checks.Bound(equalTo = Some(3))),
      "score" -> Map("min" -> Checks.Bound(geqTo = Some(10)),
                     "max" -> Checks.Bound(lessThan = Some(41), tolerance = 0.0)),
    ))
    assert(res.forall(_.passed), res.mkString("; "))
    // tolerance: equal_to 9.5 with 10% tolerance admits min=10.0
    val tol = Checks.checkColumn(df, Map(
      "score" -> Map("min" -> Checks.Bound(equalTo = Some(9.5), tolerance = 0.1))))
    assert(tol.head.passed)
    val strict = Checks.checkColumn(df, Map(
      "score" -> Map("min" -> Checks.Bound(equalTo = Some(9.5)))))
    assert(!strict.head.passed)
  }

  test("check_column partition clause filters before checking") {
    val df  = Seq((1, 5.0), (2, -1.0)).toDF("id", "v")
    val res = Checks.checkColumn(df, Map("v" -> Map("min" -> Checks.Bound(geqTo = Some(0)))),
      partitionClause = Some("id = 1"))
    assert(res.head.passed)
  }

  test("check_table: row-wise and aggregate statements in one pass") {
    val df  = Seq((1, 2, 4), (2, 3, 6)).toDF("a", "b", "c")
    val res = Checks.checkTable(df, Map(
      "sum_ok"    -> "a + b < c + 1",     // row-wise -> every()
      "row_count" -> "count(*) = 2",      // aggregate -> pass-through
      "bad"       -> "a > 1",             // fails on first row
    ))
    assert(res("sum_ok") && res("row_count") && !res("bad"))
    intercept[IllegalStateException](Checks.requireTableChecks(df, Map("bad" -> "a > 1")))
  }

  test("cleanup: registry drops tracked temp tables, keeps named ones") {
    val temp  = Table.temp()
    val named = Table("cleanup_named_spec")
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable(temp.qualifiedName)
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable(named.qualifiedName)
    val reg = new TempRegistry
    reg.track(temp); reg.track(named)
    assert(reg.tracked == Seq(temp)) // non-temp not tracked
    val dropped = reg.cleanup(spark)
    assert(dropped == Seq(temp))
    assert(!spark.catalog.tableExists(temp.qualifiedName))
    assert(spark.catalog.tableExists(named.qualifiedName))
    DropTable(spark, named)
  }

  test("Pipeline.run cleans temp tables even on failure") {
    val t = Table.temp()
    intercept[RuntimeException] {
      Pipeline.run(spark) { reg =>
        Seq(1).toDF("x").write.mode("overwrite").saveAsTable(t.qualifiedName)
        reg.track(t)
        throw new RuntimeException("boom")
      }
    }
    assert(!spark.catalog.tableExists(t.qualifiedName))
  }

  test("row_count / fetch / exists helpers") {
    val t = Table("helpers_spec")
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.mode("overwrite").saveAsTable(t.qualifiedName)
    assert(RawSql.rowCount(spark, t) == 2)
    assert(RawSql.fetchAllRows(spark, t, rowLimit = 1).size == 1)
    assert(RawSql.tableExists(spark, t))
    assert(!RawSql.tableExists(spark, Table("nope_spec")))
    assert(RawSql.columnsExist(spark, t, Seq("ID", "v")))
    assert(!RawSql.columnsExist(spark, t, Seq("missing")))
    DropTable(spark, t)
    assert(!RawSql.tableExists(spark, t))
  }
}
