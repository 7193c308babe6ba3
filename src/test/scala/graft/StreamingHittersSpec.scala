package graft

import graft.model.Table
import graft.ops.HeavyHitters
import graft.streaming.StreamingHitters
import org.apache.spark.sql.types._

class StreamingHittersSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 300L).map { i =>
    val terms = Seq("alpha") ++
      (if (i % 2 == 0) Seq("beta") else Nil) ++
      (if (i % 3 == 0) Seq("gamma") else Nil) ++
      Seq(s"noise$i")
    (i, terms.mkString(" "))
  }.toDF("doc_id", "text")

  test("streamed store fold: final top-k equals the one-pass batch answer") {
    val dir = tmpDir()
    val src = s"$dir/src"
    new java.io.File(src).mkdirs()
    corpus.where($"doc_id" <= 100).coalesce(1).write.mode("append").parquet(src)
    corpus.where($"doc_id" > 100).coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val store = Table("graft_shh_store")
    StreamingHitters.hitterStoreSink(spark, stream, "text",
      capacity = 64, store, s"$dir/ckpt")
    val streamed = HeavyHitters.topKTermsFromStore(spark, corpus, "text", store, k = 3)
      .as[(String, Long)].collect().toSeq
    val onePass = HeavyHitters.topKTerms(corpus, "text", k = 3, capacity = 64)
      .as[(String, Long)].collect().toSeq
    assert(streamed == Seq(("alpha", 300L), ("beta", 150L), ("gamma", 100L)))
    assert(streamed == onePass)
  }

  test("a replayed batch only widens the summary's margin — recount stays exact") {
    val store = Table("graft_shh_replay")
    val wave  = corpus.where($"doc_id" <= 150)
    HeavyHitters.foldBatchIntoStore(spark, wave, "text", store, capacity = 64)
    HeavyHitters.foldBatchIntoStore(spark, wave, "text", store, capacity = 64) // replay
    HeavyHitters.foldBatchIntoStore(spark, corpus.where($"doc_id" > 150), "text",
      store, capacity = 64)
    // the summary total is inflated by the replay, but the recount over the
    // REAL corpus still returns the exact counts and passes the (now more
    // conservative) coverage assert
    val got = HeavyHitters.topKTermsFromStore(spark, corpus, "text", store, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("alpha", 300L), ("beta", 150L), ("gamma", 100L)))
  }
}
