package graft

import graft.model.Table
import graft.similarity.Ann
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered corpus: 4 well-separated anchor directions in 8-d, 25 points
    * jittered around each — the distribution IVF cells are meant to carve.
    */
  private lazy val corpus = {
    val rnd     = new scala.util.Random(7)
    val anchors = Array.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    (0 until 100).map { i =>
      val a   = anchors(i % 4)
      val vec = a.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def buildIndex(tag: String): (Table, Table) = {
    val idx = Table(s"graft_test_ivf_idx_$tag")
    val cen = Table(s"graft_test_ivf_cen_$tag")
    Ann.buildIvfIndex(spark, corpus, "vec_id", "embedding", idx, cen,
      numCentroids = 8, numBuckets = 8)
    (idx, cen)
  }

  test("full-probe index query equals brute force exactly") {
    val (idx, cen) = buildIndex("full")
    val queries    = corpus.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val viaIndex = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(viaIndex == exact)
  }

  test("partial probe keeps high recall on clustered data and prunes buckets") {
    val (idx, cen) = buildIndex("part")
    val queries    = corpus.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")

    // the probed-cell IN filter must reach the scan as bucket pruning
    val plan = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString()
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt, "scan did not skip any bucket")
  }
}
