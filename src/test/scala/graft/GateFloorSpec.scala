package graft

import org.apache.spark.sql.functions._

/** Regression FLOORS for the materialize-and-measure quality gates (round
  * 12 — VERDICT r11 task 4). The gates (q188/q189/q190) hash-pin one
  * round's divergence reading, which means a future edit could silently
  * DEGRADE approximation quality and the oracle would happily re-hash the
  * worse number. These tests run the exact gate queries on the committed
  * sf0.001 fixture and assert the reading stays above a floor set with
  * margin below the round-12 measurement — so a quality regression fails a
  * spec loudly instead of slipping through as a "new hash".
  *
  * Measured at round 12 on sf0.001 (floors sit well under these):
  *   - q188 bitext pick agreement: 0.40 (both kNN passes approximate at
  *     the 8-cell / nprobe-2 tiny dial — divergence is the expected
  *     reading; the floor guards against it getting WORSE)
  *   - q189 RRF overlap@10: mean 7.4, min 6 (lexical arm anchors fusion)
  *   - q190 trim agreement: 1.00 per group; approx keeps ≤1 extra
  *     boundary-tie row per ~23 kept
  */
class GateFloorSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def gate(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q188 bitext-prod pick agreement holds its floor") {
    val rows = gate("q188_bitext_prod_overlap")
      .agg(avg(col("matched")).as("agree"), count(lit(1)).as("n"))
      .collect()(0)
    assert(rows.getLong(1) > 0, "gate produced no exact picks to compare")
    val agree = rows.getDouble(0)
    assert(agree >= 0.25,
      s"bitext prod/exact pick agreement $agree fell below the 0.25 floor " +
        "(round-12 reading 0.40 at this dial) — the IVF mining path regressed")
  }

  test("q189 RRF-prod fused-top-10 overlap holds its floor") {
    val per = gate("q189_rrf_prod_overlap")
      .select(col("overlap_at_10").cast("double")).collect().map(_.getDouble(0))
    assert(per.length == 5, s"expected 5 query rows, got ${per.length}")
    val mean = per.sum / per.length
    assert(mean >= 5.5,
      s"mean overlap@10 $mean fell below the 5.5 floor (round-12 reading 7.4)")
    assert(per.min >= 4.0,
      s"worst-query overlap@10 ${per.min} fell below the 4 floor (round-12 min 6)")
  }

  test("q185 MMR-over-IVF overlap holds its floor") {
    val per = gate("q185_mmr_prod_overlap")
      .select(col("overlap_at_5").cast("double")).collect().map(_.getDouble(0))
    assert(per.nonEmpty, "gate produced no per-query overlap rows")
    val mean = per.sum / per.length
    info(f"q185 overlap@5: mean $mean%.2f, min ${per.min}%.0f over ${per.length} queries")
    assert(mean >= 2.0,
      s"mean MMR pick overlap@5 $mean fell below the 2.0 floor " +
        "(round-13 reading 2.75 at nprobe=2) — the IVF candidate path regressed")
  }

  test("q186 retrieval nDCG@10 holds its floor") {
    val per = gate("q186_retrieval_ndcg")
      .select(col("ndcg_at_10").cast("double")).collect().map(_.getDouble(0))
    assert(per.length == 5, s"expected 5 query rows, got ${per.length}")
    val mean = per.sum / per.length
    info(f"q186 nDCG@10: mean $mean%.3f, min ${per.min}%.3f")
    // the sf0.001 fixture is tiny (graded relevance is same-source=2 /
    // same-lang=1 over ~60 docs), so absolute nDCG is low by construction;
    // the floor guards the READING against silent degradation, with margin
    assert(mean >= 0.18,
      s"mean nDCG@10 $mean fell below the 0.18 floor (round-13 reading 0.243) " +
        "— BM25 ranking quality regressed")
    assert(per.min >= 0.06,
      s"worst-query nDCG@10 ${per.min} fell below the 0.06 floor (round-13 min 0.110)")
  }

  test("q190 trim approx/exact agreement holds its floor") {
    val rows = gate("q190_trim_prod_agree").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src     = r.getString(r.fieldIndex("source"))
      val nExact  = r.getLong(r.fieldIndex("n_exact")).toDouble
      val nApprox = r.getLong(r.fieldIndex("n_approx")).toDouble
      val nCommon = r.getLong(r.fieldIndex("n_common")).toDouble
      assert(nCommon / nExact >= 0.95,
        s"group $src: approx trim kept only $nCommon of $nExact exact-kept rows")
      // approx may keep extra boundary-tie rows, but never an unbounded drift
      assert(nApprox <= nExact + 5,
        s"group $src: approx kept $nApprox vs exact $nExact — boundary drift")
    }
  }
}
