package graft

import graft.similarity.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated anchor directions in 8-d, 25 jittered points each —
    * same distribution as AnnIndexSpec's IVF fixture.
    */
  private lazy val corpus = {
    val rnd     = new scala.util.Random(11)
    val anchors = Array.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    (0 until 100).map { i =>
      val a   = anchors(i % 4)
      val vec = a.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, vec.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("kmeans recovers well-separated clusters; assignment plan is shuffle-free") {
    val init = Clustering.spreadInit(corpus, "vec_id", "embedding", k = 4)
    assert(init.length == 4 && init.forall(_.length == 8))
    val (assigned, model) = Clustering.kmeans(corpus, "vec_id", "embedding", init, iters = 5)
    val byId = assigned.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(byId.size == 100)
    // same anchor -> same cluster; the 4 anchors -> 4 distinct clusters
    val groups = (0 until 4).map(g => (0 until 100 by 4).map(i => byId((i + g).toLong)).toSet)
    groups.foreach(s => assert(s.size == 1, s"anchor split across clusters: $s"))
    assert(groups.map(_.head).toSet.size == 4, "anchors collapsed into fewer clusters")
    assert(model.k == 4)

    // the assignment is a pure projection over the centroid literal: no
    // Exchange anywhere in the output plan (the vote/update shuffles live
    // in kmeans' training loop, not in the returned frame)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
    ).toDF("vec_id", "embedding")
    // third centroid points opposite every row: it never wins a vote
    val init = Array(Array(1.0, 0.0), Array(0.8, 0.2), Array(-1.0, 0.0))
    val (_, model) = Clustering.kmeans(tiny, "vec_id", "embedding", init, iters = 2)
    assert(model.centroids(2).toSeq == Seq(-1.0, 0.0), model.centroids(2).toSeq)
  }

  test("semDedup kills exact copies and within-threshold jitter, keeps the smallest id") {
    // corpus + an exact copy at id+1000: every copy must die; the tight
    // jitter inside each anchor blob sits above 0.99 cosine, so with
    // threshold 0.99 each cluster also collapses toward its smallest ids
    val doubled = corpus.unionByName(
      corpus.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val init = Clustering.spreadInit(doubled, "vec_id", "embedding", k = 4)
    val survivors = Clustering.semDedup(doubled, "vec_id", "embedding", init,
        iters = 3, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.forall(_ < 1000L), "an exact copy survived")
    // every anchor keeps at least its smallest-id member
    (0 until 4).foreach(g => assert(survivors.contains(g.toLong), s"anchor $g lost its head"))
    // survivors are pairwise below threshold within each cluster: no two
    // survivors share an anchor AND exceed 0.95 unless in different cells;
    // cheap proxy: the duplicate count is exactly halved or better
    assert(survivors.size <= 100)
  }

  test("updated centroid components are exact 1e-6 quantiles (the replay contract)") {
    val init = Clustering.hashSampleInit(corpus, "vec_id", "embedding", k = 4)
    val (_, model) = Clustering.kmeans(corpus, "vec_id", "embedding", init, iters = 3)
    model.centroids.flatten.foreach { x =>
      assert(x == math.floor(x * 1e6 + 0.5) / 1e6, s"unquantized component $x")
    }
  }
}
