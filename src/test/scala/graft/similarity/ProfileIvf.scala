package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the IVF production twins' slope adjudication
  * (round 14 — VERDICT r13 tasks 1/6). The three flagged twins
  * (q172_mmr_prod, q183_sq8_ivf_prod, q192_bitext_bidi_prod) measured
  * 3.8–4.0× at 3× data on the r13 sf30 sweep while structurally-similar
  * siblings (q137 3.07×, q173 2.68×) stayed linear; every pipeline stage
  * is linear ON PAPER (two-level assignment is O(N·√C), candidates are
  * O(N·nprobe·cellsize)), so the super-linear term must be found by
  * MEASUREMENT, not argued. This main times each stage of the q183 dial
  * separately at one SF — run it at sf10 and sf30 and compare per-stage
  * ratios against the 3× data ratio.
  *
  * Lives in the TEST source set (round 15 — VERDICT r14 task 6): it is a
  * measurement harness, not an operator, and the production jar stays
  * operators-only.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.similarity.ProfileIvf"
  * Heap note (ADVICE r14): local-mode driver memory is the forked JVM's
  * -Xmx, fixed at launch — setting spark.driver.memory via .config() here
  * would be a no-op. Size the heap with SPARK_DRIVER_MEM=96g (build.sbt
  * threads it into javaOptions) when profiling sf30.
  */
object ProfileIvf {
  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r  = f
    System.err.println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-profile-ivf")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    System.err.println(s"[profile] sfDir=$dir")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

    val e = tbl("embeddings")
    val n = time("corpus count")(e.count())
    val c = math.max(8L, n / 256L).toInt
    System.err.println(s"[profile] n=$n centroids=$c")

    // warm the JVM/codegen once with a tiny end-to-end pass
    time("warmup (full q183 dial, 100 queries)") {
      val q = e.filter(col("vec_id") < 100).select(col("vec_id").as("qid"), col("embedding"))
      Ann.ivfTopK(e, q, "vec_id", "embedding", "qid", "embedding",
        k = 10, numCentroids = c, nprobe = 2, codec = "sq8").count()
    }

    // ---- stage 1: deterministic centroid sample (TakeOrdered over N) ----
    val cents = time("sampleCentroids")(
      Ann.sampleCentroids(e, "vec_id", "embedding", c))

    // ---- stage 2: corpus-side cell assignment (two-level at this C) ----
    val (reps, members) = time("buildTwoLevel (driver)")(Ann.buildTwoLevel(cents))
    val assignExpr = graft.functions.NativeFunctions.nearestCentroidsTwoLevel(
      col("embedding"), reps, members, cents, 1, wprobe = 2)
    time("corpus cell assign (count distinct cell)") {
      e.select(element_at(assignExpr, 1).as("cell")).groupBy("cell").count().count()
    }

    // ---- stage 3: SQ8 fit over the corpus ----
    val fit = time("Sq8.fit + collectFit") {
      val f = Sq8.fit(e.where(col("embedding").isNotNull && size(col("embedding")) === 64),
        "embedding")
      Sq8.collectFit(f)
    }
    System.err.println(s"[profile] fit dim=${fit._3}")

    // ---- stage 4: candidate volume (the probe join, no scoring) ----
    val queries = e.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val nq = time("query count")(queries.count())
    System.err.println(s"[profile] queries=$nq")
    val corpusCells = e.select(col("vec_id").as("__nid"), col("embedding").as("__nvec"),
      element_at(assignExpr, 1).as("cell"))
    val queryCells = queries.select(col("qid").as("query_id"), col("embedding").as("__qvec"),
      explode(graft.functions.NativeFunctions.nearestCentroidsTwoLevel(
        col("embedding"), reps, members, cents, 2, wprobe = 2)).as("cell"))
    val pairs = time("candidate pair count (join only)") {
      corpusCells.select(col("__nid"), col("cell"))
        .join(broadcast(queryCells.select(col("query_id"), col("cell"))), Seq("cell"))
        .count()
    }
    System.err.println(s"[profile] candidate pairs=$pairs (pairs/query=${pairs / math.max(1L, nq)})")

    // cell-size skew: Σp² term that drives candidate volume
    val skew = corpusCells.groupBy("cell").count()
      .agg(sum(col("count") * col("count")).as("ss"), count(lit(1)).as("cells"),
        max(col("count")).as("maxcell")).collect()(0)
    System.err.println(s"[profile] cells=${skew.getLong(1)} maxCell=${skew.getLong(2)} " +
      f"sumSq=${skew.getLong(0)} (balanced would be ${n.toDouble * n / c}%.0f)")

    // ---- stage 5: scoring + topK over candidates (the full float path) ----
    time("ivfTopK float (full)") {
      Ann.ivfTopK(e, queries, "vec_id", "embedding", "qid", "embedding",
        k = 10, numCentroids = c, nprobe = 2).count()
    }

    // ---- stage 6: the exact q183 dial (sq8) ----
    time("ivfTopK sq8 (full q183 dial)") {
      Ann.ivfTopK(e, queries, "vec_id", "embedding", "qid", "embedding",
        k = 10, numCentroids = c, nprobe = 2, codec = "sq8").count()
    }

    // ---- stage 7: the q172 dial (mmr tail on top of ivf candidates) ----
    time("mmrRerankIvf (full q172 dial)") {
      Ann.mmrRerankIvf(e, queries, "vec_id", "embedding", "qid", "embedding",
        candidateK = 20, k = 5, lambda = 0.7, numCentroids = c, nprobe = 2).count()
    }

    // ---- stage 8 (round 15): assign-at-ingest vs assign-per-sweep ----
    // the at-rest layout's two headline numbers: the one-time ingest cost
    // (centroids + fit + codes + bucketed write) and the steady-state
    // query-batch cost against the layout — compare the latter with
    // stage 6 (the in-flight dial that re-assigns the corpus per call)
    val idx = graft.model.Table("graft_profile_atrest_idx")
    val cen = graft.model.Table("graft_profile_atrest_cen")
    val fitT = graft.model.Table("graft_profile_atrest_fit")
    time("buildIvfIndex sq8 (one-time ingest)") {
      Ann.buildIvfIndex(spark, e, "vec_id", "embedding", idx, cen,
        numCentroids = c, numBuckets = 32, codec = "sq8", fitTable = Some(fitT))
    }
    time("queryIvfIndex sq8 (at-rest steady state)") {
      Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
        k = 10, nprobe = 2, candidateJoin = "shuffle", fitTable = Some(fitT)).count()
    }

    // ---- stage 9: the q192 dial (bidirectional bitext via knnJoin) ----
    time("minePairsIvfBidirectional (full q192 dial)") {
      val xc = e.where(col("vec_id") % 2 === 0).select(col("vec_id").as("id"), col("embedding").as("v"))
      val yc = e.where(col("vec_id") % 2 =!= 0).select(col("vec_id").as("id"), col("embedding").as("v"))
      val cy = math.max(8L, yc.count() / 256L).toInt
      Bitext.minePairsIvfBidirectional(xc, yc, "id", "v", "id", "v", k = 4,
        numCentroids = cy, nprobe = 2, strategy = "union", marginThreshold = 1.0).count()
    }

    spark.stop()
  }
}
