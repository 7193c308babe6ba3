package graft

import graft.model._
import graft.ops._
import org.apache.spark.sql.functions._

class LoadExportSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip: export single file then loadFile with inference") {
    val dir = tmpDir()
    val df  = Seq((1, "alpha"), (2, "béta"), (3, "c,with,commas")).toDF("id", "name")
    val f   = File(s"$dir/sample.csv", Some(FileType.Csv))
    ExportToFile.df(spark, df, f, IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, f)
    assert(back.schema.fields.map(_.name).toSeq == Seq("id", "name"))
    assert(back.as[(Int, String)].collect().toSet == Set((1, "alpha"), (2, "béta"), (3, "c,with,commas")))
  }

  test("ndjson round-trip preserves rows") {
    val dir = tmpDir()
    val df  = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val f   = File(s"$dir/sample.ndjson", Some(FileType.Ndjson))
    ExportToFile.df(spark, df, f, IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, f)
    assert(back.select("id", "name").as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("json array export is a single [...] document; load reads it back") {
    val dir = tmpDir()
    val df  = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val f   = File(s"$dir/sample.json", Some(FileType.Json))
    ExportToFile.df(spark, df, f, IfExists.Replace)
    val txt = scala.io.Source.fromFile(s"$dir/sample.json").mkString
    assert(txt.startsWith("[") && txt.endsWith("]"))
    val back = LoadFile.toDataFrame(spark, f)
    assert(back.select("id", "name").as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("orc round-trip: distributed write, schema'd read-back, filter pushdown") {
    val dir = tmpDir()
    val df  = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("id", "name", "score")
    val f = File(s"$dir/sample_orc", Some(FileType.Orc))
    ExportToFile.df(spark, df, f, IfExists.Replace, singleFile = false)
    val back = LoadFile.toDataFrame(spark, f)
    assert(back.schema.fields.map(_.name).toSeq == Seq("id", "name", "score"))
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0)))
    // predicate reaches the ORC scan (PushedFilters), as with parquet
    val plan = back.where(col("id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"))
    // extension dispatch: .orc files resolve without an explicit filetype
    assert(FileType.fromPath("part-00000.orc").contains(FileType.Orc))
  }

  test("export if_exists=exception fails when target exists; replace overwrites") {
    val dir = tmpDir()
    val df  = Seq((1, "x")).toDF("id", "v")
    val f   = File(s"$dir/out.csv", Some(FileType.Csv))
    ExportToFile.df(spark, df, f, IfExists.Replace)
    intercept[IllegalStateException](ExportToFile.df(spark, df, f, IfExists.Exception))
    ExportToFile.df(spark, df, f, IfExists.Replace) // no throw
  }

  test("pattern load: glob over a directory of csv parts") {
    val dir = tmpDir()
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite")
      .option("header", "true").csv(s"$dir/parts")
    Seq((2, "b")).toDF("id", "v").write.mode("append")
      .option("header", "true").csv(s"$dir/parts")
    val back = LoadFile.toDataFrame(spark,
      File(s"$dir/parts/*.csv", Some(FileType.Csv)))
    assert(back.count() == 2)
  }

  test("nested flatten: a.b -> a_b (json_normalize parity)") {
    val df = Seq((1L, ("n1", 2.5), Tuple1(("deep", 7L)))).toDF("id", "info", "outer")
      .select(col("id"),
        struct(col("info._1").as("name"), col("info._2").as("bal")).as("info"),
        struct(struct(col("outer._1._1").as("s"), col("outer._1._2").as("x")).as("inner")).as("outer"))
    val flat = LoadFile.flatten(df, "_")
    assert(flat.columns.toSeq == Seq("id", "info_name", "info_bal", "outer_inner_s", "outer_inner_x"))
    val r = flat.collect()(0)
    assert(r.getAs[String]("info_name") == "n1")
    assert(r.getAs[Long]("outer_inner_x") == 7L)
  }

  test("capitalization upper/lower") {
    val df = Seq((1, "a")).toDF("Id", "NaMe")
    assert(LoadFile.capitalize(df, Capitalization.Upper).columns.toSeq == Seq("ID", "NAME"))
    assert(LoadFile.capitalize(df, Capitalization.Lower).columns.toSeq == Seq("id", "name"))
    assert(LoadFile.capitalize(df, Capitalization.Original).columns.toSeq == Seq("Id", "NaMe"))
  }

  test("loadFile toTable honors replace/append SaveMode") {
    val dir = tmpDir()
    val f   = File(s"$dir/t.csv", Some(FileType.Csv))
    ExportToFile.df(spark, Seq((1, "a")).toDF("id", "v"), f, IfExists.Replace)
    val t = Table("load_target_spec")
    LoadFile.toTable(spark, f, t, LoadOptions(ifExists = IfExists.Replace))
    LoadFile.toTable(spark, f, t, LoadOptions(ifExists = IfExists.Append))
    assert(spark.table(t.qualifiedName).count() == 2)
    LoadFile.toTable(spark, f, t, LoadOptions(ifExists = IfExists.Replace))
    assert(spark.table(t.qualifiedName).count() == 1)
    DropTable(spark, t)
  }

  test("getFileList lists matching files") {
    val dir = tmpDir()
    new java.io.File(s"$dir/a.csv").createNewFile()
    new java.io.File(s"$dir/b.csv").createNewFile()
    new java.io.File(s"$dir/c.txt").createNewFile()
    assert(GetFileList(spark, s"$dir/*.csv").map(_.split('/').last).sorted == Seq("a.csv", "b.csv"))
    assert(GetFileList(spark, dir).size == 3)
  }

  test("malformed ndjson: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir  = tmpDir()
    val path = s"$dir/dirty.ndjson"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), java.util.Arrays.asList(
      """{"id": 1, "v": "a"}""", """{"id": broken""", """{"id": 2, "v": "b"}""", "garbage"))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt", StringType)))
    // cache first: Spark disallows querying ONLY the corrupt column off the
    // raw file (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val permissive = LoadFile.toDataFrame(spark, graft.model.File(path), LoadOptions(
      readerOptions = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"),
      schema = Some(schema))).cache()
    assert(permissive.where(col("_corrupt").isNotNull).count() == 2)
    assert(permissive.where(col("_corrupt").isNull).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    val dropped = LoadFile.toDataFrame(spark, graft.model.File(path), LoadOptions(
      readerOptions = Map("mode" -> "DROPMALFORMED"),
      schema = Some(StructType(schema.fields.dropRight(1)))))
    assert(dropped.count() == 2)
    val failfast = intercept[Exception] {
      LoadFile.toDataFrame(spark, graft.model.File(path), LoadOptions(
        readerOptions = Map("mode" -> "FAILFAST"),
        schema = Some(StructType(schema.fields.dropRight(1))))).count()
    }
    assert(failfast.getMessage != null)
  }
}
