package graft

import graft.similarity.{Ann, Sq8}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("fit: exact per-dim min/max/step; constant dims get step 0") {
    val df = Seq(
      (1L, Array(0.0f, 2.0f, 5.0f)),
      (2L, Array(1.0f, 2.0f, -5.0f)),
      (3L, Array(0.5f, 2.0f, 0.0f))).toDF("id", "v")
    val got = Sq8.fit(df, "v").orderBy("dim")
      .as[(Long, Double, Double, Double)].collect()
    assert(got(0) == ((1L, 0.0, 1.0, 1.0 / 255.0)))
    assert(got(1) == ((2L, 2.0, 2.0, 0.0)))
    assert(got(2) == ((3L, -5.0, 5.0, 10.0 / 255.0)))
  }

  test("encode: codes in [0,255], extremes map to 0/255, constant dim to 0") {
    val df = Seq(
      (1L, Array(0.0f, 7.0f)),
      (2L, Array(10.0f, 7.0f)),
      (3L, Array(5.0f, 7.0f))).toDF("id", "v")
    val coded = Sq8.encode(df, "v", Sq8.fit(df, "v"))
      .select($"id", $"codes").as[(Long, Seq[Long])].collect().toMap
    assert(coded(1L) == Seq(0L, 0L))
    assert(coded(2L) == Seq(255L, 0L))
    assert(coded(3L) == Seq(128L, 0L)) // round(5/10*255) = round(127.5) = 128
    coded.values.flatten.foreach(c => assert(c >= 0L && c <= 255L))
  }

  test("topKQuantized excludes ragged and null vectors instead of null-poisoning") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.5f)), // ragged: must not appear
      (5L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val got = Sq8.topKQuantized(rows, "id", "v", queryId = 1L, k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("quantized top-k recovers exact-cosine neighbors on a clustered fixture") {
    // two tight clusters; query 100 lives in cluster A — its quantized
    // top-5 must be the other cluster-A members, same as exact cosine
    val rnd = new scala.util.Random(7)
    def around(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.01f)
    val a = Array.fill(16)(1.0f) ++ Array.fill(16)(0.0f)
    val b = Array.fill(16)(0.0f) ++ Array.fill(16)(1.0f)
    val rows = (100L to 105L).map(i => (i, around(a))) ++
      (200L to 205L).map(i => (i, around(b)))
    val df = rows.toDF("id", "v")
    val quant = Sq8.topKQuantized(df, "id", "v", queryId = 100L, k = 5)
      .select("id").as[Long].collect().toSet
    assert(quant == Set(101L, 102L, 103L, 104L, 105L))
    val exact = Ann.bruteForceTopK(df, df.where($"id" === 100L)
        .select($"id".as("qid"), $"v".as("qv")),
      "id", "v", "qid", "qv", k = 6)
      .where($"neighbor_id" =!= 100L).select("neighbor_id").as[Long].collect().toSet
    assert(quant == exact)
  }

  test("dequantize over at-rest codes equals the fused encode-decode roundtrip") {
    // the at-rest path (codes persisted, decoded on read) must agree with
    // sq8Roundtrip bit-for-bit — and reading codes from a TABLE is the one
    // place dequantize is legal (chained onto encode() in one plan it
    // re-triggers the O(dim²) CollapseProject lambda trap its scaladoc
    // documents)
    val df = Seq((1L, Array(0.0f, 7.0f)), (2L, Array(10.0f, 5.0f)),
      (3L, Array(5.0f, 6.0f))).toDF("id", "v")
    val f   = Sq8.fit(df, "v")
    val dir = tmpDir()
    Sq8.encode(df, "v", f).select($"id", $"codes").write.parquet(s"$dir/codes")
    val atRest = Sq8.dequantize(spark.read.parquet(s"$dir/codes"), "codes", f)
      .select($"id", $"__dvec").as[(Long, Seq[Float])].collect().toMap
    val fused = Sq8.sq8Roundtrip(df, "v", f)
      .select($"id", $"__dvec").as[(Long, Seq[Float])].collect().toMap
    assert(atRest == fused)
    assert(atRest(2L) == Seq(10.0f, 5.0f)) // extremes round-trip exactly
  }

  test("topKQuantizedFrame: query-frame results match the in-corpus search per query") {
    val rnd = new scala.util.Random(11)
    def around(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.01f)
    val a = Array.fill(16)(1.0f) ++ Array.fill(16)(0.0f)
    val b = Array.fill(16)(0.0f) ++ Array.fill(16)(1.0f)
    val rows = (100L to 105L).map(i => (i, around(a))) ++
      (200L to 205L).map(i => (i, around(b)))
    val df = rows.toDF("id", "v")
    val queries = df.where($"id".isin(100L, 200L)).select($"id".as("qid"), $"v".as("qv"))
    val frame = Sq8.topKQuantizedFrame(df, "id", "v", queries, "qid", "qv", k = 6)
    // per query: drop the self-match; survivors equal topKQuantized's set
    for (q <- Seq(100L, 200L)) {
      val got = frame.where($"query_id" === q && $"neighbor_id" =!= q)
        .select("neighbor_id").as[Long].collect().toSet
      val single = Sq8.topKQuantized(df, "id", "v", queryId = q, k = 5)
        .select("id").as[Long].collect().toSet
      assert(got == single, s"query $q diverged from the in-corpus search")
    }
    // ragged/null queries are rejected loudly, not silently mis-encoded
    val ragged = Seq((9L, Array(1.0f))).toDF("qid", "qv").unionByName(queries)
    intercept[IllegalArgumentException] {
      Sq8.topKQuantizedFrame(df, "id", "v", ragged, "qid", "qv", k = 3)
    }
  }

  test("fitClipped ignores a planted outlier that collapses the min/max grid") {
    // 50 inliers spread over [0,1] in dim 1, one wild 1000.0 outlier: the
    // min/max fit maps every inlier to code 0 (grid stretched 1000x); the
    // clipped fit keeps the inlier resolution
    val rows = (1 to 50).map(i => (i.toLong, Array(i / 50.0f, 1.0f))) :+
      (99L, Array(1000.0f, 1.0f))
    val df = rows.toDF("id", "v")
    def dim1Codes(fit: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sq8.encode(df.where($"id" < 99L), "v", fit)
        .select(element_at($"codes", 1)).as[Long].collect().toSeq
    val minmax  = dim1Codes(Sq8.fit(df, "v"))
    val clipped = dim1Codes(Sq8.fitClipped(df, "v", pLow = 0.0, pHigh = 0.96))
    // min/max: the outlier owns the range — inliers collapse to code 0
    assert(minmax.distinct.size <= 2, s"expected collapsed codes, got ${minmax.distinct.size}")
    // clipped: inliers keep >40 distinct levels of resolution
    assert(clipped.distinct.size > 40, s"expected spread codes, got ${clipped.distinct.size}")
    clipped.foreach(c => assert(c >= 0L && c <= 255L))
  }

  test("ivfTopK codec=sq8: full-probe search matches float ranking on a clustered fixture") {
    val rnd = new scala.util.Random(13)
    def around(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.01f)
    val a = Array.fill(16)(1.0f) ++ Array.fill(16)(0.0f)
    val b = Array.fill(16)(0.0f) ++ Array.fill(16)(1.0f)
    val rows = (100L to 109L).map(i => (i, around(a))) ++
      (200L to 209L).map(i => (i, around(b)))
    val df = rows.toDF("id", "v")
    val queries = df.where($"id".isin(100L, 200L)).select($"id".as("qid"), $"v".as("qv"))
    // nprobe = numCentroids → every pair meets once; the codec is the only
    // difference from the float path. Within a tight cluster the cosines
    // are near-ties, so int8 rounding may legitimately permute WHICH
    // same-cluster members fill the tail slots — the production claims are
    // (a) every neighbor is same-cluster (the separation that matters is
    // far above int8 resolution), (b) the self-match still ranks first,
    // (c) the two codecs mostly agree. Real-fixture recall is q183's
    // oracle-checked gate.
    val sq8 = Ann.ivfTopK(df, queries, "id", "v", "qid", "qv",
      k = 5, numCentroids = 4, nprobe = 4, codec = "sq8")
    val flt = Ann.ivfTopK(df, queries, "id", "v", "qid", "qv",
      k = 5, numCentroids = 4, nprobe = 4)
    for (q <- Seq(100L, 200L)) {
      val gotS = sq8.where($"query_id" === q).select("neighbor_id").as[Long].collect().toSet
      val gotF = flt.where($"query_id" === q).select("neighbor_id").as[Long].collect().toSet
      assert(gotS.forall(n => (n / 100L) == (q / 100L)), s"query $q left its cluster: $gotS")
      assert(gotF.forall(n => (n / 100L) == (q / 100L)))
      assert((gotS & gotF).size >= 3, s"query $q: sq8 $gotS vs float $gotF")
      val first = sq8.where($"query_id" === q && $"rank" === 1)
        .select("neighbor_id").as[Long].head()
      assert(first == q, s"query $q: self-match not rank 1 (got $first)")
    }
  }
}
