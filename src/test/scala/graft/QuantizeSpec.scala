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
}
