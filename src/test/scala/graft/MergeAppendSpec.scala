package graft

import graft.model._
import graft.ops._

class MergeAppendSpec extends SparkSpec {
  import spark.implicits._

  /** homes-style fixture (FIXTURES.md §A): (sell, list) conflict keys. */
  private def freshTarget(name: String): Table = {
    val t = Table(name)
    Seq(
      (142, 160, 28, 10, "t1"),
      (175, 180, 18, 2, "t2"),
      (129, 132, 13, 6, "t3"),
    ).toDF("sell", "list", "age", "taxes", "who")
      .write.mode("overwrite").saveAsTable(t.qualifiedName)
    t
  }

  private val sourceRows = Seq(
    (142, 160, 99, 11, "s1"), // conflicts with t1
    (300, 310, 55, 12, "s2"), // new
  )
  private def source = sourceRows.toDF("sell", "list", "age", "taxes", "who")

  test("merge ignore: only new keys inserted, existing rows untouched") {
    val t = freshTarget("merge_ignore_spec")
    Merge.mergeDf(spark, source, t, Map.empty, Seq("sell", "list"), MergeConflict.Ignore)
    val out = spark.table(t.qualifiedName).as[(Int, Int, Int, Int, String)].collect().toSet
    assert(out == Set(
      (142, 160, 28, 10, "t1"), (175, 180, 18, 2, "t2"), (129, 132, 13, 6, "t3"),
      (300, 310, 55, 12, "s2")))
    DropTable(spark, t)
  }

  test("merge update: conflicting rows take source values, new keys inserted") {
    val t = freshTarget("merge_update_spec")
    Merge.mergeDf(spark, source, t, Map.empty, Seq("sell", "list"), MergeConflict.Update)
    val out = spark.table(t.qualifiedName).as[(Int, Int, Int, Int, String)].collect().toSet
    assert(out == Set(
      (142, 160, 99, 11, "s1"), (175, 180, 18, 2, "t2"), (129, 132, 13, 6, "t3"),
      (300, 310, 55, 12, "s2")))
    DropTable(spark, t)
  }

  test("merge exception: throws on key conflict, inserts cleanly when disjoint") {
    val t = freshTarget("merge_exc_spec")
    intercept[IllegalStateException] {
      Merge.mergeDf(spark, source, t, Map.empty, Seq("sell", "list"), MergeConflict.Exception)
    }
    val disjoint = Seq((999, 999, 1, 1, "d1")).toDF("sell", "list", "age", "taxes", "who")
    Merge.mergeDf(spark, disjoint, t, Map.empty, Seq("sell", "list"), MergeConflict.Exception)
    assert(spark.table(t.qualifiedName).count() == 4)
    DropTable(spark, t)
  }

  test("merge update with partial column mapping: unmapped target cols keep value on match, NULL on insert") {
    val t = freshTarget("merge_map_spec")
    // reference cross-column test shape: source `taxes` feeds target `age`
    val src = Seq((142, 160, 77), (400, 410, 88)).toDF("sell", "list", "taxes")
    Merge.mergeDf(spark, src, t,
      Map("sell" -> "sell", "list" -> "list", "taxes" -> "age"),
      Seq("sell", "list"), MergeConflict.Update)
    val rows = spark.table(t.qualifiedName)
      .select("sell", "list", "age", "who").as[(Int, Int, Option[Int], Option[String])]
      .collect().toSet
    assert(rows.contains((142, 160, Some(77), Some("t1")))) // matched: age updated, who kept
    assert(rows.contains((400, 410, Some(88), None)))       // inserted: who NULL
    assert(rows.contains((175, 180, Some(18), Some("t2")))) // untouched
    DropTable(spark, t)
  }

  test("merge rejects duplicate conflict keys in source (nondeterministic merge)") {
    val t   = freshTarget("merge_dup_spec")
    val dup = Seq((1, 1, 10, 1, "a"), (1, 1, 20, 2, "b")).toDF("sell", "list", "age", "taxes", "who")
    intercept[IllegalStateException] {
      Merge.mergeDf(spark, dup, t, Map.empty, Seq("sell", "list"), MergeConflict.Update)
    }
    DropTable(spark, t)
  }

  test("merge update is idempotent (same source twice = same state)") {
    val t = freshTarget("merge_idem_spec")
    Merge.mergeDf(spark, source, t, Map.empty, Seq("sell", "list"), MergeConflict.Update)
    val once = spark.table(t.qualifiedName).as[(Int, Int, Int, Int, String)].collect().toSet
    Merge.mergeDf(spark, source, t, Map.empty, Seq("sell", "list"), MergeConflict.Update)
    val twice = spark.table(t.qualifiedName).as[(Int, Int, Int, Int, String)].collect().toSet
    assert(once == twice)
    DropTable(spark, t)
  }

  test("append with column mapping fills unmapped target columns with NULL") {
    val t = freshTarget("append_spec")
    val src = Seq((500, 510)).toDF("s", "l")
    Append.appendDf(spark, src, t, Map("s" -> "sell", "l" -> "list"))
    val row = spark.table(t.qualifiedName)
      .where($"sell" === 500).select("sell", "list", "who")
      .as[(Int, Int, Option[String])].collect()
    assert(row.toSeq == Seq((500, 510, None)))
    DropTable(spark, t)
  }

  test("append without mapping matches columns by name, case-insensitively") {
    val t   = freshTarget("append_auto_spec")
    val src = Seq((600, 610, 33, 3, "x")).toDF("SELL", "LIST", "AGE", "TAXES", "WHO")
    Append.appendDf(spark, src, t)
    assert(spark.table(t.qualifiedName).where($"sell" === 600).count() == 1)
    DropTable(spark, t)
  }
}
