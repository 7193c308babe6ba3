package graft

import graft.dedup.Dedup
import graft.model.Table
import graft.streaming.StreamingDedup
import org.apache.spark.sql.types._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("dedup-on-ingest: target accumulates only first-seen docs across waves") {
    val dir  = tmpDir()
    val src  = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val target = Table("graft_stream_dedup_t")
    val store  = Table("graft_stream_dedup_s")

    // wave 1: one batch-internal dup (normalization collapses case/ws)
    Seq((1L, "first document body"), (2L, "second document body"),
      (3L, "first  DOCUMENT body")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    StreamingDedup.exactIncrementalSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "text", "doc_id", target, store, ckpt)
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L))

    // wave 2: a cross-wave dup of doc 1 and a genuinely new doc; the same
    // checkpoint resumes, only the new file is processed
    Seq((10L, "FIRST document body"), (11L, "third document body"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.exactIncrementalSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "text", "doc_id", target, store, ckpt)
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 11L))

    // the store holds exactly the admitted fingerprints (3 distinct bodies)
    assert(spark.table(store.qualifiedName).distinct().count() == 3)
  }

  test("curated ingest: contaminated docs dropped, dups suppressed, clean docs land") {
    val dir  = tmpDir()
    val src  = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val target    = Table("graft_stream_cur_t")
    val fpStore   = Table("graft_stream_cur_fp")
    val gramStore = Table("graft_stream_cur_g")
    graft.dedup.IncrementalDedup.buildGramStore(spark,
      Seq((900L, "benchmark question one two three four five six seven eight"))
        .toDF("doc_id", "text"),
      "text", gramStore)

    // wave 1: clean doc, contaminated doc (shares the eval 8-gram), dup pair
    Seq(
      (1L, "a perfectly clean training document body"),
      (2L, "prefix benchmark question one two three four five six seven eight suffix"),
      (3L, "another clean body"),
      (4L, "ANOTHER  clean body"), // exact dup of 3 after normalization
    ).toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.curatedIngestSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "text", "doc_id", target, fpStore, gramStore, ckpt)
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))

    // wave 2: cross-wave dup of 1 + a newly contaminated doc + a new clean doc
    Seq(
      (10L, "a perfectly CLEAN training document body"),
      (11L, "more benchmark question one two three four five six seven eight text"),
      (12L, "fresh clean content for wave two")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    StreamingDedup.curatedIngestSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "text", "doc_id", target, fpStore, gramStore, ckpt)
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 12L))
  }

  test("near-dedup-on-ingest: batch-internal and cross-wave near-dups collapse") {
    val dir  = tmpDir()
    val src  = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val target = Table("graft_stream_near_t")
    val index  = Table("graft_stream_near_i")
    val base = "the quick brown fox jumps over the lazy dog and then naps in " +
      "the warm afternoon sun beside the quiet porch"

    def sink(): Unit = StreamingDedup.nearIncrementalSink(spark,
      spark.readStream.schema(schema).parquet(src),
      "text", "doc_id", target, index, ckpt,
      threshold = 0.6, bands = Dedup.recallExactBands(0.6))

    // wave 1: docs 1/2 are near-dups of each other (one word changed),
    // doc 3 unrelated — batch-internal near dedup keeps min-id 1
    Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),
      (3L, "completely different content about distributed query engines " +
        "and shuffle-free aggregation strategies at scale"),
    ).toDF("doc_id", "text").write.mode("append").parquet(src)
    sink()
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))

    // wave 2: doc 10 is a near-dup of admitted doc 1 (cross-wave, via the
    // persisted index); doc 11 is genuinely new
    Seq(
      (10L, base.replace("dog", "hound")),
      (11L, "a third topic entirely, discussing winnowing fingerprints and " +
        "content-defined chunking for long documents"),
    ).toDF("doc_id", "text").write.mode("append").parquet(src)
    sink()
    assert(spark.table(target.qualifiedName).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 11L))
  }
}
