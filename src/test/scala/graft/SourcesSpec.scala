package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer

import graft.model._
import graft.ops.{DataframeOp, ExportToFile, LoadFile}
import graft.sources.{Remote, Xlsx}
import graft.streaming.StreamingLoad
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP location, xlsx round-trip, and the previously-untested operator
  * surfaces (DataframeOp, StreamingLoad.windowedCounts).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("xlsx round-trip: write then load_file preserves data and infers types") {
    val df = Seq(
      (1L, "alice & <bob>", 1.5),
      (2L, "plain", 2.0),
      (3L, "naïve ünïcode", -0.25),
    ).toDF("id", "name", "score")
    val path = s"${tmpDir()}/out.xlsx"
    ExportToFile.df(spark, df, File(path), IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, File(path))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    val rows = back.as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "alice & <bob>", 1.5), (2L, "plain", 2.0), (3L, "naïve ünïcode", -0.25)))
  }

  test("xlsx read handles blank cells as nulls") {
    // hand-build a sheet with a gap (cell B skipped on row 2)
    val df   = Seq(("a", "x"), ("b", null), ("c", "z")).toDF("k", "v")
    val path = s"${tmpDir()}/gaps.xlsx"
    ExportToFile.df(spark, df, File(path), IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, File(path)).as[(String, Option[String])].collect().sortBy(_._1)
    assert(back.toSeq == Seq(("a", Some("x")), ("b", None), ("c", Some("z"))))
  }

  test("colIndex parses spreadsheet refs") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("C7") == 2)
    assert(Xlsx.colIndex("AA3") == 26)
  }

  test("load_file from an http:// URL stages once then reads distributed") {
    val csv = "id,name\n1,alpha\n2,beta\n"
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv", exchange => {
      val bytes = csv.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.createContext("/missing.csv", exchange => {
      exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = LoadFile.toDataFrame(spark, File(s"http://127.0.0.1:$port/data.csv"))
      assert(df.columns.toSeq == Seq("id", "name"))
      assert(df.count() == 2)
      // staged copy is content-addressed: second load re-uses it
      val again = LoadFile.toDataFrame(spark, File(s"http://127.0.0.1:$port/data.csv"))
      assert(again.count() == 2)
      // a 4xx surfaces as a clear IOException naming the URL
      val err = intercept[java.io.IOException] {
        Remote.fetchToScratch(spark, s"http://127.0.0.1:$port/missing.csv", refetch = true)
      }
      assert(err.getMessage.contains("missing.csv") && err.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("unsupported remote schemes fail fast with the reason") {
    // ftp:// (FtpSpec) and sftp:// (SftpSpec) are supported; gdrive needs
    // real credentials, so it rejects with the reason and a workaround —
    // from EVERY location-consuming operator, not just load_file.
    val e3 = intercept[UnsupportedOperationException] {
      LoadFile.toDataFrame(spark, File("gdrive://folder/data.csv"))
    }
    assert(e3.getMessage.contains("gdrive://"))
    val e4 = intercept[UnsupportedOperationException] {
      graft.ops.GetFileList(spark, "gdrive://folder/")
    }
    assert(e4.getMessage.contains("gdrive://"))
    val e5 = intercept[UnsupportedOperationException] {
      ExportToFile.df(spark, Seq(1).toDF("x"), File("gdrive://folder/out.csv"), IfExists.Replace)
    }
    assert(e5.getMessage.contains("gdrive://"))
  }

  test("a scheme with no registered FileSystem gets an actionable error, not a raw Hadoop one") {
    // wasbs:// without the azure connector jars — the message must name the
    // scheme and the fix (provider jar / fs.<scheme>.impl), reference
    // dispatch files/locations/base.py:139-153
    val e = intercept[UnsupportedOperationException] {
      graft.ops.GetFileList(spark, "wasbs://container@acct.blob.core.windows.net/dir/")
    }
    assert(e.getMessage.contains("wasbs"))
    assert(e.getMessage.contains("provider jar"))
  }

  test("non-file Hadoop scheme (memfs://) drives load/list/export end-to-end") {
    // register the fake scheme, then run the three location-consuming
    // operators through it — the object-store pass-through proof
    spark.sparkContext.hadoopConfiguration.set("fs.memfs.impl", classOf[MemFs].getName)
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"), "id,name\n1,x\n2,y\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.csv"), "id,name\n3,z\n")

    // load: explicit file, then a bare-prefix pattern (exercises
    // resolvePath's prefix→glob logic on the non-file scheme)
    val one = LoadFile.toDataFrame(spark, File(s"memfs://$dir/a.csv"))
    assert(one.count() == 2)
    // extension-less, no filetype → resolvePath's directory branch + type
    // sniff via globStatus, all through the fake scheme
    val pref = LoadFile.toDataFrame(spark, File(s"memfs://$dir"))
    assert(pref.as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y"), (3L, "z")))

    // list: directory listing through the scheme
    val listed = graft.ops.GetFileList(spark, s"memfs://$dir/")
    assert(listed.size == 2 && listed.forall(_.startsWith("memfs:")))

    // export: single-file rename path through the scheme, then read back
    val out = File(s"memfs://$dir/out.csv", Some(FileType.Csv))
    ExportToFile.df(spark, Seq((10L, "w")).toDF("id", "name"), out, IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, out)
    assert(back.as[(Long, String)].collect().toSeq == Seq((10L, "w")))
  }

  test("DataframeOp bridges tables through a user function into a table") {
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .write.mode("overwrite").saveAsTable("graft_dfop_in")
    val out = DataframeOp.toTable(
      spark,
      Seq(Table("graft_dfop_in")),
      dfs => dfs.head.groupBy("tag").agg(count(lit(1)).as("n")),
      Table("graft_dfop_out"),
    )
    val rows = spark.table(out.qualifiedName).as[(String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("a", 2L), ("b", 1L)))
    // rerun must be idempotent (TableIO path)
    DataframeOp.toTable(spark, Seq(Table("graft_dfop_in")),
      dfs => dfs.head.groupBy("tag").agg(count(lit(1)).as("n")), Table("graft_dfop_out"))
    assert(spark.table("graft_dfop_out").count() == 2)
  }

  test("windowedCounts: watermarked tumbling-window counts over a file stream") {
    val dir = tmpDir()
    Seq(
      ("2026-01-01 00:00:10", "click"),
      ("2026-01-01 00:00:20", "click"),
      ("2026-01-01 00:01:05", "view"),
    ).toDF("ts_raw", "event_type")
      .select(col("ts_raw").cast("timestamp").as("ts"), col("event_type"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg    = StreamingLoad.windowedCounts(stream, "ts", "event_type", "1 minute", "10 seconds")
    val q = agg.writeStream
      .format("memory")
      .queryName("wc_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("wc_test")
      .select(col("window.start").cast("string"), col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(
      ("2026-01-01 00:00:00", "click", 2L),
      ("2026-01-01 00:01:00", "view", 1L),
    ))
  }
}
