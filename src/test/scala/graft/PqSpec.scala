package graft

import graft.model.Table
import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.functions._

/** Product-quantization ANN: codebook training, ADC scoring, exact re-rank,
  * and the persisted IVF-PQ index.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered corpus (same shape as AnnIndexSpec): 4 well-separated anchor
    * directions in 16-d, 25 points jittered around each.
    */
  private lazy val corpus = {
    val rnd     = new scala.util.Random(11)
    val anchors = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    (0 until 100).map { i =>
      val a   = anchors(i % 4)
      val vec = a.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries =
    corpus.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))

  private lazy val cb = Pq.train(corpus, "vec_id", "embedding", m = 4, k = 8)

  test("codes are m bytes and deterministic across runs") {
    val codes1 = corpus.select(col("vec_id"), Pq.encode(col("embedding"), cb).as("c"))
      .as[(Long, Array[Byte])].collect().toMap
    val codes2 = corpus.select(col("vec_id"), Pq.encode(col("embedding"), cb).as("c"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes1.values.forall(_.length == 4))
    assert(codes1.keys.forall(id => codes1(id).sameElements(codes2(id))))
    // training twice yields the same codebook (hash-ordered sample + fixed
    // Lloyd rounds)
    val cb2 = Pq.train(corpus, "vec_id", "embedding", m = 4, k = 8)
    assert(cb.flat.sameElements(cb2.flat) && cb.dsub == cb2.dsub)
  }

  test("ragged corpus fails training with a clear dimension message") {
    val ragged = corpus.select(col("vec_id"),
      when(col("vec_id") === 7L, slice(col("embedding"), 1, 8))
        .otherwise(col("embedding")).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Pq.train(ragged, "vec_id", "embedding", m = 4, k = 8)
    }
    assert(e.getMessage.contains("share one dimension"))
  }

  test("ADC score is the LUT sum of the row's codes") {
    val row = corpus
      .select(Pq.encode(col("embedding"), cb).as("codes"),
        Pq.lut(col("embedding"), cb).as("lut"),
        Pq.adcScore(Pq.encode(col("embedding"), cb), Pq.lut(col("embedding"), cb), cb).as("adc"))
      .limit(5)
      .collect()
    row.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      val lut   = r.getSeq[Float](r.fieldIndex("lut"))
      val manual = codes.zipWithIndex.map { case (c, j) => lut(j * cb.k + (c & 0xFF)).toDouble }.sum
      assert(math.abs(manual - r.getAs[Double]("adc")) < 1e-9)
      // self-score approximates cosine(v,v)=1 up to quantization error
      // (k=8 entries per 4-dim subspace ⇒ ~0.88 observed)
      assert(r.getAs[Double]("adc") > 0.8, s"self ADC ${r.getAs[Double]("adc")}")
    }
  }

  test("pqTopK with rerank >= corpus size equals brute force exactly") {
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val viaPq = Pq.pqTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", cb,
        k = 5, rerank = 1000)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(viaPq == exact)
  }

  test("production dial (rerank pool ~ cluster size) keeps high recall on clustered data") {
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Pq.pqTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", cb,
        k = 5, rerank = 25)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("persisted IVF-PQ index: full probe + full rerank equals brute force; buckets prune") {
    val idx = Table("graft_test_pq_idx")
    val cen = Table("graft_test_pq_cen")
    val cbt = Table("graft_test_pq_cb")
    Pq.buildPqIndex(spark, corpus, "vec_id", "embedding", idx, cen, cbt,
      m = 4, k = 8, numCentroids = 8, numBuckets = 8)
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val full = Pq.queryPqIndex(spark, idx, cen, cbt, corpus, "vec_id", "embedding",
        queries, "qid", "embedding", k = 5, nprobe = 8, rerank = 1000)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)

    // partial probe: recall stays high on clustered data, scan prunes buckets
    val partialDf = Pq.queryPqIndex(spark, idx, cen, cbt, corpus, "vec_id", "embedding",
      queries, "qid", "embedding", k = 5, nprobe = 3, rerank = 25)
    val partial = partialDf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactIds = exact.map { case (q, _, n) => (q, n) }
    val recall = exactIds.intersect(partial).size.toDouble / exactIds.size
    assert(recall >= 0.9, s"recall $recall")
    val plan = partialDf.queryExecution.executedPlan.toString()
    val sel  = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt, "scan did not skip any bucket")
  }

  test("streaming ingest: appended batches are query-visible with unchanged codes") {
    import org.apache.spark.sql.types._
    val idx = Table("graft_test_pq_stream")
    val cen = Table("graft_test_pq_stream_cen")
    val cbt = Table("graft_test_pq_stream_cb")
    // seed index on the first half of the corpus
    val seed = corpus.filter(col("vec_id") < 50)
    Pq.buildPqIndex(spark, seed, "vec_id", "embedding", idx, cen, cbt,
      m = 4, k = 8, numCentroids = 8, numBuckets = 8)
    val seedCount = spark.table(idx.qualifiedName).count()

    // stream the second half in two waves through the same checkpoint
    val dir  = tmpDir()
    val src  = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def ingestWave(wave: org.apache.spark.sql.DataFrame): Unit = {
      wave.write.mode("append").parquet(src)
      graft.similarity.Pq.streamingIndexSink(spark,
        spark.readStream.schema(schema).parquet(src),
        "vec_id", "embedding", idx, cen, cbt, ckpt, numBuckets = 8)
    }
    ingestWave(corpus.filter(col("vec_id") >= 50 && col("vec_id") < 75))
    ingestWave(corpus.filter(col("vec_id") >= 75))

    assert(spark.table(idx.qualifiedName).count() == 100)
    assert(seedCount == 50)
    // streamed codes equal batch-encoded codes (same persisted codebook —
    // buildPqIndex trained on the seed deterministically, so retraining on
    // the seed here reproduces it exactly)
    val streamed = spark.table(idx.qualifiedName)
      .filter(col("id") >= 50)
      .select(col("id"), col("codes"))
      .as[(Long, Array[Byte])].collect().toMap
    val seedCb = Pq.train(seed, "vec_id", "embedding", m = 4, k = 8)
    val direct = corpus.filter(col("vec_id") >= 50)
      .select(col("vec_id"), Pq.encode(col("embedding"), seedCb).as("c"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(streamed.keySet == direct.keySet)
    assert(streamed.keys.forall(id => streamed(id).sameElements(direct(id))))

    // the grown index still answers queries over streamed-in rows
    val q2 = corpus.filter(col("vec_id") === 99)
      .select(col("vec_id").as("qid"), col("embedding"))
    val res = Pq.queryPqIndex(spark, idx, cen, cbt, corpus, "vec_id", "embedding",
        q2, "qid", "embedding", k = 3, nprobe = 8, rerank = 1000)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res.contains(99L), s"streamed row not query-visible: $res")
  }

  test("stored index rows carry m-byte codes, not vectors") {
    val idx = Table("graft_test_pq_size")
    val cen = Table("graft_test_pq_size_cen")
    val cbt = Table("graft_test_pq_size_cb")
    Pq.buildPqIndex(spark, corpus, "vec_id", "embedding", idx, cen, cbt,
      m = 4, k = 8, numCentroids = 4, numBuckets = 4)
    val t = spark.table(idx.qualifiedName)
    assert(t.schema.fieldNames.toSet == Set("id", "codes", "cell"))
    assert(t.select(max(length(col("codes")))).as[Int].collect().head == 4)
  }
}
