package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionization closes sessions by gap timeout") {
    // Two input files processed as separate micro-batches
    // (maxFilesPerTrigger=1) so the watermark advances between them and
    // times out the first session.
    val dir = tmpDir()
    Seq(
      ("u1", "2026-01-01 00:00:00"),
      ("u1", "2026-01-01 00:00:20"),
      ("u2", "2026-01-01 00:00:05"),
    ).toDF("user", "ts_raw").select(col("user"), col("ts_raw").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(s"$dir/batch1")
    Seq(
      ("u1", "2026-01-01 02:00:00"), // 2h later → far past u1's gap; advances watermark
    ).toDF("user", "ts_raw").select(col("user"), col("ts_raw").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(s"$dir/batch2")
    // stage parts into one streaming dir with lexicographic batch order
    val streamDir = s"${tmpDir()}/stream"
    new java.io.File(streamDir).mkdirs()
    def stage(src: String, name: String): Unit = {
      val part = new java.io.File(src).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$streamDir/$name"))
    }
    stage(s"$dir/batch1", "0001.parquet")
    stage(s"$dir/batch2", "0002.parquet")

    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false").parquet(streamDir)
    val sessions = Sessionize.sessionize(stream, "user", "ts", gapSeconds = 60, watermark = "5 seconds")
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sess_test").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sess_test")
      .select(col("key"), col("session_start").cast("string"), col("session_end").cast("string"), col("events"))
      .as[(String, String, String, Long)].collect().toSet
    // u1's first session (2 events, 00:00:00–00:00:20) and u2's (1 event)
    // closed when the watermark advanced to ~02:00; u1's 02:00 session is
    // still open (no later watermark) and must NOT be emitted.
    assert(rows == Set(
      ("u1", "2026-01-01 00:00:00", "2026-01-01 00:00:20", 2L),
      ("u2", "2026-01-01 00:00:05", "2026-01-01 00:00:05", 1L),
    ), rows)
  }

  test("batch sessionize applies the same gap rule (boundary cases)") {
    import spark.implicits._
    // gaps: 10 (same), 3599 (same — < gap), 3600 (break — >= gap)
    val ev = Seq(
      (1L, 1000L), (1L, 1010L), (1L, 1010L + 3599L), (1L, 1010L + 3599L + 3600L),
      (2L, 5000L),
    ).toDF("user_id", "sec")
    val out = graft.ops.Sessions.sessionize(ev, "user_id", "sec", gapSeconds = 3600)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1000L, 4609L, 3L),
      (1L, 8209L, 8209L, 1L),
      (2L, 5000L, 5000L, 1L),
    ), out.toString)
  }

  test("funnel enforces step ORDER: a click before the first view does not count") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full funnel
      (2L, "click", 5L), (2L, "view", 10L),                         // click precedes view: stuck at 1
      (3L, "view", 10L), (3L, "purchase", 20L),                     // no click: stuck at 1
      (4L, "error", 1L),                                            // never enters: 0
      (5L, "view", 10L), (5L, "click", 10L),                        // same-second counts (>=): 2
    ).toDF("user_id", "event_type", "sec")
    val out = graft.ops.Sessions.funnel(ev, "user_id", "event_type", "sec",
        Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
  }
}
