package graft

import graft.ops.RetrievalEval
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private val w = RetrievalEval.discounts(3)

  test("ndcgAtK matches the hand-computed textbook example") {
    // query 1: retrieved d1(rel 1), d2(unjudged), d3(rel 2); a judged but
    // unretrieved d9(rel 2) participates in the ideal only
    val ranked = Seq((1L, 1, "d1"), (1L, 2, "d2"), (1L, 3, "d3"))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, "d1", 1L), (1L, "d3", 2L), (1L, "d9", 2L))
      .toDF("query_id", "doc_id", "rel")
    val r = RetrievalEval.ndcgAtK(ranked, qrels, k = 3)
      .as[(Long, Long, Double, Double, Double)].head()
    val dcg  = 1.0 * w(0) + 0.0 * w(1) + 2.0 * w(2)
    val idcg = 0.0 + 2.0 * ((0.0 + w(0) + w(1)) - 0.0) + 1.0 * ((w(0) + w(1) + w(2)) - (w(0) + w(1)))
    assert(r._1 == 1L && r._2 == 3L)
    assert(r._3 == math.rint(dcg * 1e6) / 1e6, s"dcg ${r._3}")
    assert(r._4 == math.rint(idcg * 1e6) / 1e6, s"idcg ${r._4}")
    assert(math.abs(r._5 - dcg / idcg) < 1e-6, s"ndcg ${r._5}")
  }

  test("perfect ranking scores 1.0; reversed ranking scores < 1; no judged docs scores 0") {
    val qrels = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "x", 0L))
      .toDF("query_id", "doc_id", "rel")
    val perfect = Seq((1L, 1, "a"), (1L, 2, "b")).toDF("query_id", "rank", "doc_id")
    val p = RetrievalEval.ndcgAtK(perfect, qrels, k = 2)
      .where($"query_id" === 1L).select("ndcg_at_k").as[Double].head()
    assert(p == 1.0)
    val reversed = Seq((1L, 1, "b"), (1L, 2, "a")).toDF("query_id", "rank", "doc_id")
    val rv = RetrievalEval.ndcgAtK(reversed, qrels, k = 2)
      .where($"query_id" === 1L).select("ndcg_at_k").as[Double].head()
    assert(rv < 1.0 && rv > 0.0)
    // query 2 has only rel-0 judgments → idcg 0 → ndcg 0, never a div by 0
    val z = RetrievalEval.ndcgAtK(
      Seq((2L, 1, "x")).toDF("query_id", "rank", "doc_id"), qrels, k = 2)
      .where($"query_id" === 2L)
      .select("n_judged", "idcg_at_k", "ndcg_at_k").as[(Long, Double, Double)].head()
    assert(z == ((0L, 0.0, 0.0)))
  }

  test("ideal saturates at k when a grade has more docs than slots") {
    // 5 grade-2 docs, k=3: ideal = three 2s regardless of the grade-1 pool
    val qrels = ((1 to 5).map(i => (1L, s"g2_$i", 2L)) ++
      (1 to 4).map(i => (1L, s"g1_$i", 1L))).toDF("query_id", "doc_id", "rel")
    val ranked = Seq((1L, 1, "g2_1"), (1L, 2, "g2_2"), (1L, 3, "g2_3"))
      .toDF("query_id", "rank", "doc_id")
    val r = RetrievalEval.ndcgAtK(ranked, qrels, k = 3)
      .select("idcg_at_k", "ndcg_at_k").as[(Double, Double)].head()
    val want = 2.0 * ((0.0 + w(0) + w(1) + w(2)) - 0.0)
    assert(r._1 == math.rint(want * 1e6) / 1e6)
    assert(r._2 == 1.0)
  }

  test("ranks beyond k are ignored; rel beyond the retrieved set only raises the bar") {
    val qrels  = Seq((1L, "a", 1L), (1L, "z", 2L)).toDF("query_id", "doc_id", "rel")
    val ranked = Seq((1L, 1, "a"), (1L, 2, "z")).toDF("query_id", "rank", "doc_id")
    val at1 = RetrievalEval.ndcgAtK(ranked, qrels, k = 1)
      .select("dcg_at_k", "ndcg_at_k").as[(Double, Double)].head()
    // k=1: dcg sees only doc a (rel 1); ideal slot holds the grade-2 doc
    assert(at1._1 == 1.0)
    assert(at1._2 == 0.5)
  }
}
