package graft

import graft.model.Table
import graft.ops.TableIO
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serializable injection helpers — top-level object so Spark's closure
  * cleaner never tries to drag the (non-serializable) suite instance into
  * task closures. Counters are JVM-global, which is exactly right in local
  * mode: executor threads share this JVM.
  */
object FailureInjection {
  val p0Attempts = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Partition 0 throws on its FIRST attempt only — the transient task
    * failure (lost executor, OOM-killed container) every production write
    * absorbs via task retry. Other partitions pass through untouched.
    */
  def flaky(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0) {
        p0Attempts.incrementAndGet()
        if (tc.attemptNumber() == 0)
          throw new RuntimeException("injected: partition 0, first attempt")
      }
      it
    }.toDF("v")
  }

  /** Every task of every attempt throws — the unrecoverable-job case (bad
    * input, poisoned code path): the WRITE must fail, the published name
    * must not.
    */
  def alwaysFailing(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { (_: Iterator[Long]) =>
      if (true) throw new RuntimeException("injected: every attempt")
      Iterator.empty[Long]
    }.toDF("v")
  }
}

/** Failure-injection evidence for the atomic-publication contract
  * (`ops/TableOps.scala` publish/generations; AtomicSwapSpec covers the
  * no-failure races): a task failure mid-generation-write retries and
  * converges, a TOTAL write failure leaves the published name serving the
  * old generation completely, and the next good publish recovers — readers
  * never observe a partial table through any of it.
  */
class FailureInjectionSpec extends SparkSpec {
  import spark.implicits._

  test("mid-write task failure: retry converges and the published result is complete") {
    val t = Table("graft_fail_retry")
    TableIO.publish(spark, spark.range(500).toDF("v"), t)
    FailureInjection.p0Attempts.set(0)
    TableIO.publish(spark, FailureInjection.flaky(spark, 1000), t)
    // the injected first attempt really fired AND a retry really ran
    assert(FailureInjection.p0Attempts.get() >= 2,
      s"expected a failed first attempt plus a retry, saw ${FailureInjection.p0Attempts.get()} attempts")
    // the published generation is the COMPLETE retried write, not a partial
    assert(spark.table(t.qualifiedName).count() == 1000)
    assert(spark.table(t.qualifiedName).agg(sum("v")).as[Long].head() == 499500L)
  }

  test("mid-write task failure with a racing reader: old-or-new, never partial or absent") {
    val t = Table("graft_fail_race")
    TableIO.publish(spark, spark.range(500).toDF("v"), t)
    val stop     = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads    = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val n = spark.table(t.qualifiedName).count()
          // a complete old (500) or complete new (1000) generation — a
          // partial write surfacing through the name would land between
          if (n != 500 && n != 1000) failures.add(s"saw $n rows")
          reads.incrementAndGet()
        } catch {
          case e: Throwable =>
            failures.add(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    }, "failure-racing-reader")
    reader.start()
    try TableIO.publish(spark, FailureInjection.flaky(spark, 1000), t)
    finally { stop.set(true); reader.join(30000) }
    assert(reads.get() > 0, "reader never completed a read")
    assert(failures.isEmpty, s"racing reader failed: ${failures.toArray.mkString("; ")}")
    assert(spark.table(t.qualifiedName).count() == 1000)
  }

  test("TOTAL write failure: publish throws, the old generation stays fully readable, recovery converges") {
    val t = Table("graft_fail_total")
    TableIO.publish(spark, spark.range(700).toDF("v"), t)
    val gensBefore = TableIO.generations(spark, t)
    intercept[Throwable] {
      TableIO.publish(spark, FailureInjection.alwaysFailing(spark, 1000), t)
    }
    // the published NAME never flipped: complete old generation, right sum
    assert(spark.table(t.qualifiedName).count() == 700)
    assert(spark.table(t.qualifiedName).agg(sum("v")).as[Long].head() == 244650L)
    // a subsequent good publish converges — the failed attempt poisoned
    // neither the generation accounting nor the view flip
    TableIO.publish(spark, spark.range(900).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 900)
    assert(TableIO.generations(spark, t).size >= gensBefore.size)
  }

  test("TOTAL write failure on plain overwrite: rerun converges from whatever the crash left") {
    // overwrite is documented NON-atomic (publish is the atomic layer) —
    // the contract here is rerunnability: after a failed write, the same
    // call succeeds regardless of partial catalog/filesystem leftovers
    val t = Table("graft_fail_overwrite")
    TableIO.overwrite(spark, spark.range(100).toDF("v"), t)
    intercept[Throwable] {
      TableIO.overwrite(spark, FailureInjection.alwaysFailing(spark, 200), t)
    }
    TableIO.overwrite(spark, spark.range(300).toDF("v"), t)
    assert(spark.table(t.qualifiedName).count() == 300)
  }
}
