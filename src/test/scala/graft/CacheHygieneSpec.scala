package graft

import graft.dedup.Dedup
import graft.similarity.Clustering
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._

/** Round 17 (VERDICT r16 item 4 / ADVICE r16): operators that cache an
  * internal projection must not hand the caller a lazy frame that still
  * references that cache — in a long-lived session every call would pin a
  * corpus-linear projection in the CacheManager forever. The fixed pattern
  * (componentLabels since r16): eager-materialize the small decision set
  * via localCheckpoint (ContextCleaner-collectable), unpersist the cache,
  * return a plan that references only the checkpointed RDD.
  *
  * The assertion is plan-level — "the returned frame references no
  * InMemoryRelation" — because the shared test session runs suites in
  * parallel, so a global CacheManager-empty check would race other suites.
  * No InMemoryRelation in the result plan ⟺ nothing stops the operator's
  * own unpersist from actually freeing the blocks.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cachedLeaves(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.toString }

  private lazy val vecs = {
    val rnd = new scala.util.Random(3)
    val anchors = Array.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    (0 until 80).map { i =>
      val a = anchors(i % 4)
      // every 10th row a near-copy of row i-10 so dedup has real losers
      val jit = if (i % 10 == 9) 1e-4f else 0.1f
      (i.toLong, a.map(x => x + jit * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("Clustering.semDedup returns a cache-free plan (losers checkpointed, cache unpersisted)") {
    val init = Clustering.spreadInit(vecs, "vec_id", "embedding", k = 4)
    val out  = Clustering.semDedup(vecs, "vec_id", "embedding", init, iters = 2, threshold = 0.999)
    assert(out.count() > 0)
    assert(cachedLeaves(out).isEmpty, s"semDedup result still references a cache: ${cachedLeaves(out)}")
  }

  test("Dedup.semanticDedup returns a cache-free plan") {
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding", threshold = 0.999, numCentroids = 4)
    assert(out.count() > 0)
    assert(cachedLeaves(out).isEmpty, s"semanticDedup result still references a cache: ${cachedLeaves(out)}")
  }

  test("Dedup.dedupHash64Transitive returns a cache-free plan") {
    val rows = (0 until 60).map { i =>
      // groups of three sharing a hash + a hamming-1 neighbour
      val h = (i / 3).toLong * 1024L + (if (i % 3 == 2) 1L else 0L)
      (i.toLong, h)
    }.toDF("id", "h")
    val out = Dedup.dedupHash64Transitive(rows, "id", "h", maxHamming = 3)
    assert(out.count() > 0)
    assert(cachedLeaves(out).isEmpty,
      s"dedupHash64Transitive result still references a cache: ${cachedLeaves(out)}")
  }
}
