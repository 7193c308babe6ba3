package graft

import graft.ops.Dsir
import org.apache.spark.sql.functions._

/** The scoring op (importanceWeights) is oracle-checked end-to-end by
  * q108; Round7Spec pins its sign behavior. This spec pins the round-10
  * SELECTION step: Gumbel-top-k resampling over logw.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target talks about cats, raw about stocks; doc 12 is target-looking
  private def target = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cat and a cat again"),
    (3L, "cat mat cat mat")).toDF("id", "text")

  private def raw = Seq(
    (10L, "stock price went up today"),
    (11L, "price of the stock fell again"),
    (12L, "the cat sat on the mat"),
    (13L, "stock stock stock price price"),
    (14L, "dividend yield curve inverted")).toDF("id", "text")

  private def scored = Dsir.importanceWeights(raw, target, "id", "text", k = 2)

  test("importanceWeightsFiltered is bit-identical to the two-frame form") {
    // one corpus, target = a predicate over it (the q108/q184 shape): the
    // fused single-scan fit must reproduce the two-frame scores exactly
    val corpus = raw.unionByName(target.select($"id" + 100 as "id", $"text"))
    val twoFrame = Dsir.importanceWeights(
        corpus, corpus.filter($"id" > 100), "id", "text", k = 2)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val fused = Dsir.importanceWeightsFiltered(
        corpus, $"id" > 100, "id", "text", k = 2)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(twoFrame == fused)
    assert(fused.nonEmpty && fused.exists(_._3 != 0.0))
  }

  test("resample rejects a frame that already carries gumbel_key") {
    intercept[IllegalArgumentException] {
      Dsir.resample(scored.withColumn("gumbel_key", lit(0.0)), "id", "logw", 3)
    }
  }

  test("resample is restart-stable and keeps everything when n >= rows") {
    val p1 = Dsir.resample(scored, "id", "logw", 3).select("id").as[Long].collect().toSeq
    val p2 = Dsir.resample(scored, "id", "logw", 3).select("id").as[Long].collect().toSeq
    assert(p1 == p2, "content-derived Gumbel keys must be deterministic")
    assert(Dsir.resample(scored, "id", "logw", 100).count() == 5L)
  }

  test("small tau degrades to hard top-n by weight; the target-like doc dominates") {
    // at tau = 0.01 the weight term is scaled 100x in nats — the Gumbel
    // noise (a few units) cannot flip any ordering on this fixture
    val hard = Dsir.resample(scored, "id", "logw", 2, tau = 0.01)
      .select("id").as[Long].collect().toSeq
    val byW = scored.orderBy(desc("logw"), $"id").limit(2)
      .select("id").as[Long].collect().toSeq
    assert(hard == byW)
    assert(hard.head == 12L, s"target-looking doc must win, got $hard")
  }

  test("gumbel_key is the documented chain: logw*ln2/tau - ln(-ln(u))") {
    val row = Dsir.resample(scored, "id", "logw", 5, tau = 2.0)
      .where($"id" === 12L).select("logw", "gumbel_key").as[(Double, Double)].head()
    val u = (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("12").substring(0, 8), 16)
      .toDouble + 0.5) / 4294967296.0
    val want = row._1 * (math.log(2.0) / 2.0) - math.log(-math.log(u))
    assert(row._2 == want, s"${row._2} vs $want")
  }
}
