package graft

import graft.model.Table
import graft.ops.{HeavyHitters, Sampling, TableIO}
import graft.streaming.StreamingSample
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** (id, w) shapes over [[FailureInjection]]'s injectors — one shared
  * injection mechanism (and one shared attempts counter) for the whole
  * failure-injection family; these wrappers only add the key/weight
  * projection the streaming-sink tests feed. The injected throw fires
  * inside the fold's own jobs (the plans are lazy), not at construction.
  */
object StreamingFailureInjection {
  private def kw(df: DataFrame): DataFrame =
    df.select((col("v") + 1).as("id"), (((col("v") + 1) * 37) % 1000 + 1).as("w"))

  /** Partition 0 throws on its FIRST attempt only — the transient mid-fold
    * task failure a production fold absorbs via task retry.
    */
  def flakyKw(spark: SparkSession, n: Long): DataFrame =
    kw(FailureInjection.flaky(spark, n))

  /** Every task of every attempt throws — the unrecoverable fold (poisoned
    * batch): the fold must fail, the reservoir must not.
    */
  def poisonKw(spark: SparkSession, n: Long): DataFrame =
    kw(FailureInjection.alwaysFailing(spark, n))
}

/** Failure injection for the foreachBatch streaming sinks' replay /
  * crash-mid-fold claims (`StreamingSample` reservoir, `StreamingHitters`
  * hitter store). `FailureInjectionSpec` proves the BATCH publish contract;
  * this spec drives the same failures through the per-micro-batch fold
  * units the sinks call, plus the recovery path a restarted stream takes
  * (replay of the crashed batch) — turning the sinks' scaladoc-argued
  * idempotence claims into executed evidence.
  */
class StreamingFailureSpec extends SparkSpec {
  import spark.implicits._

  private def kw(n: Int) =
    (1 to n).map(i => (i.toLong, ((i * 37) % 1000 + 1).toLong)).toDF("id", "w")

  private def hitterCorpus = (1L to 300L).map { i =>
    val terms = Seq("alpha") ++
      (if (i % 2 == 0) Seq("beta") else Nil) ++
      (if (i % 3 == 0) Seq("gamma") else Nil) ++
      Seq(s"noise$i")
    (i, terms.mkString(" "))
  }.toDF("doc_id", "text")

  test("reservoir: transient task failure mid-fold retries and converges") {
    val res = Table("graft_sfail_res_flaky")
    StreamingSample.mergeBatch(spark, kw(100), "id", "w", 30, res)
    FailureInjection.p0Attempts.set(0)
    // the flaky batch's plan is lazy — the injected throw fires inside the
    // fold's own jobs (pool validation, then the publish generation write;
    // each fresh stage re-attempts partition 0 and retries through)
    StreamingSample.mergeBatch(
      spark, StreamingFailureInjection.flakyKw(spark, 200), "id", "w", 30, res)
    assert(FailureInjection.p0Attempts.get() >= 2,
      s"expected a failed first attempt plus a retry, saw ${FailureInjection.p0Attempts.get()}")
    // the converged reservoir equals the one-pass batch sample over the
    // union corpus — the retried fold lost nothing and duplicated nothing
    val want = Sampling.weightedSample(
      kw(100).unionByName(StreamingFailureInjection.flakyKw(spark, 200)).distinct(),
      "id", "w", 30).as[(Long, Long)].collect().toSet
    val got = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("reservoir: unrecoverable crash mid-fold leaves the previous sample fully live; replay recovers") {
    val res   = Table("graft_sfail_res_crash")
    val wave1 = kw(200).where($"id" <= 150)
    val wave2 = kw(200).where($"id" > 150)
    StreamingSample.mergeBatch(spark, wave1, "id", "w", 30, res)
    val before = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
    assert(before.size == 30)
    // the poisoned batch's plan is lazy: the fold crashes mid-flight (in
    // the pool-validation collect or the generation write, whichever runs
    // it first — both are inside the fold, after the reservoir was read)
    intercept[org.apache.spark.SparkException] {
      StreamingSample.mergeBatch(
        spark, StreamingFailureInjection.poisonKw(spark, 50), "id", "w", 30, res)
    }
    // the reservoir name still serves the COMPLETE previous sample — not
    // empty, not partial, not a mix
    assert(spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet == before)
    // the restarted stream replays the batch that crashed (at-least-once):
    // a good wave2 fold lands the reservoir on exactly the one-pass batch
    // A-ES sample of the full corpus — the crash left no residue
    StreamingSample.mergeBatch(spark, wave2, "id", "w", 30, res)
    val want = Sampling.weightedSample(kw(200), "id", "w", 30)
      .as[(Long, Long)].collect().toSet
    assert(spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet == want)
  }

  test("reservoir: a key re-emitted with a changed weight fails fast (contract enforced)") {
    val res = Table("graft_sfail_res_reweigh")
    StreamingSample.mergeBatch(spark, kw(100), "id", "w", 30, res)
    val sample = spark.table(res.qualifiedName).as[(Long, Long)].collect()
    // re-emit a key the reservoir holds, with a different weight: the merge
    // must refuse rather than let two ranks for one identity compete
    val (k, w) = (sample.head._1, sample.head._2)
    val ex = intercept[IllegalArgumentException] {
      StreamingSample.mergeBatch(
        spark, Seq((k, w + 1L)).toDF("id", "w"), "id", "w", 30, res)
    }
    assert(ex.getMessage.contains("changed"))
    // the refused fold left the reservoir untouched
    assert(spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
      == sample.toSet)
    // same key at the SAME weight is a replay: still a no-op, not an error
    StreamingSample.mergeBatch(spark, Seq((k, w)).toDF("id", "w"), "id", "w", 30, res)
    assert(spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
      == sample.toSet)
  }

  test("hitter store: crash mid-persist leaves the previous summary fully live; replay recovers") {
    val store = Table("graft_sfail_hh_crash")
    val wave1 = hitterCorpus.where($"doc_id" <= 150)
    val wave2 = hitterCorpus.where($"doc_id" > 150)
    HeavyHitters.foldBatchIntoStore(spark, wave1, "text", store, capacity = 64)
    val before = spark.table(store.qualifiedName).collect().toSet
    // inject the crash INSIDE the store's persist path: a failing write to
    // the store's published name (writeStore uses this same TableIO.publish;
    // the old overwrite path would have dropped the accumulated summary
    // here — the round-9 advice failure mode)
    intercept[org.apache.spark.SparkException] {
      TableIO.publish(spark, FailureInjection.alwaysFailing(spark, 50)
        .select(col("v").cast("string").as("term"), col("v").as("cnt"),
          lit(64).as("capacity")), store)
    }
    assert(spark.table(store.qualifiedName).collect().toSet == before,
      "a mid-persist crash must leave the previous generation's summary live")
    // recovery: the restarted stream replays wave2; the recount over the
    // real corpus is exact and the coverage assert holds
    HeavyHitters.foldBatchIntoStore(spark, wave2, "text", store, capacity = 64)
    val got = HeavyHitters.topKTermsFromStore(spark, hitterCorpus, "text", store, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("alpha", 300L), ("beta", 150L), ("gamma", 100L)))
  }

  test("hitter store: crash-then-REPLAY of the same batch keeps the recount exact") {
    val store = Table("graft_sfail_hh_replay")
    val wave1 = hitterCorpus.where($"doc_id" <= 150)
    val wave2 = hitterCorpus.where($"doc_id" > 150)
    HeavyHitters.foldBatchIntoStore(spark, wave1, "text", store, capacity = 64)
    intercept[org.apache.spark.SparkException] {
      TableIO.publish(spark, FailureInjection.alwaysFailing(spark, 50)
        .select(col("v").cast("string").as("term"), col("v").as("cnt"),
          lit(64).as("capacity")), store)
    }
    // at-least-once: the recovered stream replays wave1 (already folded)
    // BEFORE moving on — the summary double-counts, the recount must not
    HeavyHitters.foldBatchIntoStore(spark, wave1, "text", store, capacity = 64)
    HeavyHitters.foldBatchIntoStore(spark, wave2, "text", store, capacity = 64)
    val got = HeavyHitters.topKTermsFromStore(spark, hitterCorpus, "text", store, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("alpha", 300L), ("beta", 150L), ("gamma", 100L)))
  }
}
