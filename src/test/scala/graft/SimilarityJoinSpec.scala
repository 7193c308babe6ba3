package graft

import graft.ops.SimilarityJoin
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    def set(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      sa = set(ta); sb = set(tb) if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= t
    } yield (ia, ib)).toSet
  }

  test("prefix-filtered join returns exactly the brute-force pair set") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),   // ~0.8 vs 1
      (3L, "quick brown foxes jump over lazy dogs"),       // low vs 1
      (4L, "completely different content about spark engines"),
      (5L, "completely different content about spark engines indeed"),
      (6L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (7L, ""),                                            // blank: no pairs
      (8L, "single"),
      (9L, "single"))                                      // tiny exact dup
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = SimilarityJoin.jaccardSelfJoin(rows.toDF("id", "text"), "id", "text", t)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteForce(rows, t), s"threshold $t")
    }
  }

  test("jaccard values are the exact set ratios") {
    val rows = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d")).toDF("id", "text")
    val got = SimilarityJoin.jaccardSelfJoin(rows, "id", "text", 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 3.0 / 5.0)
    assert(got((1L, 3L)) == 1.0)
    assert(got((2L, 3L)) == 3.0 / 5.0)
  }

  test("randomized: never misses a qualifying pair (completeness fuzz)") {
    val rnd   = new scala.util.Random(42)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (1L to 60L).map { i =>
      val n = 3 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = SimilarityJoin.jaccardSelfJoin(rows.toDF("id", "text"), "id", "text", 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == bruteForce(rows, 0.6))
  }
}
