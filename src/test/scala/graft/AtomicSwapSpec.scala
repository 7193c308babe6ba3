package graft

import graft.model.Table
import graft.ops.TableIO
import org.apache.spark.sql.functions._

/** The atomicity contract for published tables (SCALE.md "Atomic swap"):
  * a reader racing a rewrite must see the OLD or the NEW generation of a
  * published name — never a missing table, never a partial generation.
  */
class AtomicSwapSpec extends SparkSpec {
  import spark.implicits._

  test("publish flips a view atomically; generations are reclaimed") {
    val t = Table("graft_pub_t")
    TableIO.publish(spark, (1 to 10).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 10)
    TableIO.publish(spark, (1 to 20).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 20)
    TableIO.publish(spark, (1 to 30).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 30)
    // keepGenerations=2: exactly the newest two physical generations remain
    assert(TableIO.generations(spark, t).size == 2)
  }

  test("publish migrates a plain table occupying the name (one-time)") {
    val t = Table("graft_pub_migrate")
    TableIO.overwrite(spark, (1 to 5).toDF("v"), t)
    TableIO.publish(spark, (1 to 15).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 15)
    // the old table body was moved into a generation slot, not dropped
    assert(TableIO.generations(spark, t).size == 2)
    TableIO.publish(spark, (1 to 25).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 25)
  }

  test("readGeneration time-travels over retained generations") {
    val t = Table("graft_pub_tt")
    TableIO.publish(spark, Seq((1, "v1")).toDF("k", "payload"), t)
    TableIO.publish(spark, Seq((1, "v2")).toDF("k", "payload"), t)
    assert(TableIO.readGeneration(spark, t).select("payload").as[String].head() == "v2")
    assert(TableIO.readGeneration(spark, t, generationsBack = 1)
      .select("payload").as[String].head() == "v1")
    // out of retention -> actionable error
    val e = intercept[IllegalArgumentException] {
      TableIO.readGeneration(spark, t, generationsBack = 2)
    }
    assert(e.getMessage.contains("out of range"))
    // unpublished name -> actionable error
    val e2 = intercept[IllegalArgumentException] {
      TableIO.readGeneration(spark, Table("graft_never_published"))
    }
    assert(e2.getMessage.contains("no published generations"))
  }

  test("a reader racing repeated publishes sees old-or-new, never absent") {
    val t = Table("graft_pub_race")
    TableIO.publish(spark, (1 to 1000).map(i => (i, "g0")).toDF("v", "g"), t)
    val stop    = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads    = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          // resolve the published name from scratch each time — this is the
          // path a concurrent job takes; counts must be a complete
          // generation (1000 rows), never 0/partial/absent
          val n = spark.table(t.qualifiedName).count()
          if (n != 1000) failures.add(s"saw $n rows")
          reads.incrementAndGet()
        } catch {
          case e: Throwable =>
            failures.add(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    }, "racing-reader")
    reader.start()
    try {
      (1 to 6).foreach { i =>
        TableIO.publish(spark, (1 to 1000).map(j => (j, s"g$i")).toDF("v", "g"), t)
      }
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(reads.get() > 0, "reader never completed a read")
    assert(failures.isEmpty, s"racing reader failed: ${failures.toArray.mkString("; ")}")
  }

  test("compactPublished rewrites to fewer files without a visibility gap") {
    val t = Table("graft_pub_compact")
    TableIO.publish(spark, (1 to 10000).toDF("v").repartition(32), t)
    val (before, after) = TableIO.compactPublished(spark, t, targetFileBytes = 512L * 1024 * 1024)
    assert(before == 32, s"expected 32 input files, saw $before")
    assert(after < before, s"compaction did not reduce files: $before -> $after")
    assert(spark.table(t.qualifiedName).count() == 10000)
    assert(spark.table(t.qualifiedName).agg(sum("v")).as[Long].head() == 50005000L)
  }
}
