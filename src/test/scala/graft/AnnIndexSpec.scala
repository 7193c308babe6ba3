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

  test("sq8 at-rest index at the exact probe dial equals the in-flight sq8 ivfTopK") {
    // same fit, same decoded-space scoring, same cells ⇒ the at-rest path
    // (build codes+cells once, query the layout) and the per-call path
    // must agree set-for-set — the q193 gate's hash-parity claim
    val idx = Table("graft_test_ivf_idx_sq8")
    val cen = Table("graft_test_ivf_cen_sq8")
    val fit = Table("graft_test_ivf_fit_sq8")
    Ann.buildIvfIndex(spark, corpus, "vec_id", "embedding", idx, cen,
      numCentroids = 8, numBuckets = 8, codec = "sq8", fitTable = Some(fit))
    val queries = corpus.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
    val atRest = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
        k = 5, nprobe = 8, fitTable = Some(fit))
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val inFlight = Ann.ivfTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding",
        k = 5, numCentroids = 8, nprobe = 8, codec = "sq8")
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(atRest == inFlight,
      s"only-atrest=${(atRest -- inFlight).take(5)} only-inflight=${(inFlight -- atRest).take(5)}")
    assert(atRest.nonEmpty)
    // an sq8 index without its fit must fail loudly, never score raw codes
    val ex = intercept[IllegalArgumentException] {
      Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 8)
    }
    assert(ex.getMessage.contains("fitTable"))
  }

  test("index-query candidateJoin strategies agree, and shuffle never forces a broadcast") {
    // the round-14 ivfTopK dial, wired through the at-rest path (round 15 —
    // VERDICT r14 task 4): a corpus-proportional query batch must be able
    // to pair by cell exchange instead of a data-proportional broadcast
    val (idx, cen) = buildIndex("dial")
    val queries    = corpus.select(col("vec_id").as("qid"), col("embedding"))
    def run(strategy: String) =
      Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
          k = 3, nprobe = 2, candidateJoin = strategy)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
        .as[(Long, Long, Double)].collect().toSet
    val b = run("broadcast")
    val s = run("shuffle")
    assert(b == s, s"strategies disagree: only-b=${(b -- s).take(5)} only-s=${(s -- b).take(5)}")
    // with auto-broadcast off, the shuffle dial's plan must contain NO
    // broadcast exchange — nothing in the operator forces one
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
          k = 3, nprobe = 2, candidateJoin = "shuffle")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoop"),
        s"shuffle dial still plans a broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pre-assigned query path: a persisted assignment table answers identically to on-the-fly assignment") {
    // round 16 (VERDICT r15 task 3): assignToIndex → persist bucketed by
    // cell → queryIvfIndexAssigned must give the same answer as the
    // assign-per-call path, through the full write/read round trip
    val (idx, cen) = buildIndex("preassign")
    val queries    = corpus.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding"))
    val qas        = Table("graft_test_ivf_qas_preassign")
    graft.ops.TableIO.overwriteBucketed(spark,
      Ann.assignToIndex(spark, cen, queries, "qid", "embedding", nprobe = 3),
      qas, Seq("cell"), 8, Seq("cell"))
    val viaTable = Ann.queryIvfIndexAssigned(spark, idx, spark.table(qas.qualifiedName), k = 5)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val direct = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaTable == direct)
    assert(viaTable.nonEmpty)
  }

  test("at-rest knnJoin (pre-assigned corpus, excludeSelf) equals in-flight knnJoin at the same dial") {
    // the q137 twin's quality pin (round 16 — VERDICT r15 task 1): the
    // deterministic centroid sample makes the at-rest layout's cells
    // IDENTICAL to knnJoin's per-call assignment, so at the same
    // (C, nprobe) dial the candidate pairs — and hence the top-k — match
    // set-for-set, cosines included
    val (idx, cen) = buildIndex("knnar")
    val qas = Table("graft_test_ivf_qas_knnar")
    graft.ops.TableIO.overwriteBucketed(spark,
      Ann.assignToIndex(spark, cen, corpus, "vec_id", "embedding", nprobe = 3),
      qas, Seq("cell"), 8, Seq("cell"))
    def atRest() = Ann.queryIvfIndexAssigned(spark, idx, spark.table(qas.qualifiedName),
      k = 3, candidateJoin = "shuffle", excludeSelf = true)
    val ar = atRest()
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val inFlight = Ann.knnJoin(corpus, corpus, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, numCentroids = 8, nprobe = 3, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(ar == inFlight,
      s"only-atrest=${(ar -- inFlight).take(5)} only-inflight=${(inFlight -- ar).take(5)}")
    assert(ar.nonEmpty)
    // the self-join twin must never force a data-proportional broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = atRest().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoop"),
        s"at-rest knnJoin twin still plans a broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("appendToIvfIndex grows an sq8 index comparably: exact-dial query equals fixed-fit in-flight search") {
    // build on the even half (fit + centroids freeze there), append the
    // odd half against the persisted fit — the grown index at the exact
    // probe dial must equal ivfTopK over the FULL corpus with that same
    // fit (at nprobe = C every pair meets once, so cells don't matter and
    // the only arithmetic is the shared decoded-space scoring)
    val idx = Table("graft_test_ivf_idx_append")
    val cen = Table("graft_test_ivf_cen_append")
    val fit = Table("graft_test_ivf_fit_append")
    val evens = corpus.filter(col("vec_id") % 2 === 0)
    val odds  = corpus.filter(col("vec_id") % 2 =!= 0)
    Ann.buildIvfIndex(spark, evens, "vec_id", "embedding", idx, cen,
      numCentroids = 8, numBuckets = 8, codec = "sq8", fitTable = Some(fit))
    Ann.appendToIvfIndex(spark, odds, "vec_id", "embedding", idx, cen,
      numBuckets = 8, fitTable = Some(fit))
    assert(spark.table(idx.qualifiedName).count() == 100L)
    val queries = corpus.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
    val grown = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
        k = 5, nprobe = 8, fitTable = Some(fit))
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val inFlight = Ann.ivfTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding",
        k = 5, numCentroids = 8, nprobe = 8, codec = "sq8",
        codecFit = Some(spark.table(fit.qualifiedName)))
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(grown == inFlight,
      s"only-grown=${(grown -- inFlight).take(5)} only-inflight=${(inFlight -- grown).take(5)}")
    assert(grown.nonEmpty)

    // frozen-fit dims contract: a ragged append row is EXCLUDED, never
    // lo-padded into the grid
    val ragged = Seq((999L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    Ann.appendToIvfIndex(spark, ragged, "vec_id", "embedding", idx, cen,
      numBuckets = 8, fitTable = Some(fit))
    assert(spark.table(idx.qualifiedName).where(col("id") === 999L).count() == 0L)

    // guards: append before build fails; sq8 append without its fit fails
    val exMissing = intercept[IllegalArgumentException] {
      Ann.appendToIvfIndex(spark, odds, "vec_id", "embedding",
        Table("graft_test_ivf_idx_nope"), cen, numBuckets = 8, fitTable = Some(fit))
    }
    assert(exMissing.getMessage.contains("must exist"))
    val exFit = intercept[IllegalArgumentException] {
      Ann.appendToIvfIndex(spark, odds, "vec_id", "embedding", idx, cen, numBuckets = 8)
    }
    assert(exFit.getMessage.contains("fitTable"))
  }

  test("appendToIvfIndex grows a float index: exact-dial query equals brute force over the full corpus") {
    val idx = Table("graft_test_ivf_idx_appendf")
    val cen = Table("graft_test_ivf_cen_appendf")
    val evens = corpus.filter(col("vec_id") % 2 === 0)
    val odds  = corpus.filter(col("vec_id") % 2 =!= 0)
    Ann.buildIvfIndex(spark, evens, "vec_id", "embedding", idx, cen,
      numCentroids = 8, numBuckets = 8)
    Ann.appendToIvfIndex(spark, odds, "vec_id", "embedding", idx, cen, numBuckets = 8)
    val queries = corpus.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
    val grown = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding", k = 5, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(grown == exact)
  }

  test("sq8 build rejects mixed-width and empty-vector corpora (dims contract at build time)") {
    val mixed = corpus.unionByName(Seq((998L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val exMixed = intercept[IllegalArgumentException] {
      Ann.buildIvfIndex(spark, mixed, "vec_id", "embedding",
        Table("graft_test_ivf_idx_mixed"), Table("graft_test_ivf_cen_mixed"),
        numCentroids = 8, numBuckets = 8, codec = "sq8",
        fitTable = Some(Table("graft_test_ivf_fit_mixed")))
    }
    assert(exMixed.getMessage.contains("exactly one vector dimensionality"))
    val withEmpty = corpus.unionByName(Seq((997L, Seq.empty[Float])).toDF("vec_id", "embedding"))
    val exEmpty = intercept[IllegalArgumentException] {
      Ann.buildIvfIndex(spark, withEmpty, "vec_id", "embedding",
        Table("graft_test_ivf_idx_empty"), Table("graft_test_ivf_cen_empty"),
        numCentroids = 8, numBuckets = 8, codec = "sq8",
        fitTable = Some(Table("graft_test_ivf_fit_empty")))
    }
    assert(exEmpty.getMessage.contains("empty vectors"))
  }

  test("two-level assignment (C >= threshold) keeps knnJoin recall on clustered data") {
    // C = 64 crosses Ann.TwoLevelThreshold, so assignment runs through the
    // O(√C) group hierarchy — the constant-cell-size production path. On
    // the 4-anchor clustered corpus the probed cells still carve the
    // anchors, so recall vs exact brute force must stay high even though
    // per-row assignment only scans ~2√C of the 64 centroids.
    val exact = Ann.bruteForceTopK(corpus, corpus.select(col("vec_id").as("qid"), col("embedding")),
        "vec_id", "embedding", "qid", "embedding", k = 4)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").desc)))
      .where(col("rk") <= 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val twoLevel = Ann.knnJoin(corpus, corpus, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, numCentroids = 64, nprobe = 8, excludeSelf = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(twoLevel).size.toDouble / exact.size
    assert(recall >= 0.85, s"two-level recall $recall")
  }

  test("knnJoin exact dial equals per-row brute force; partial probe keeps recall; no broadcast of either side") {
    val exact = Ann.bruteForceTopK(corpus, corpus.select(col("vec_id").as("qid"), col("embedding")),
        "vec_id", "embedding", "qid", "embedding", k = 4)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").desc)))
      .where(col("rk") <= 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val full = Ann.knnJoin(corpus, corpus, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, numCentroids = 8, nprobe = 8, excludeSelf = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)

    val partialDf = Ann.knnJoin(corpus, corpus, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, numCentroids = 8, nprobe = 3, excludeSelf = true)
    val partial = partialDf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall  = exact.intersect(partial).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // nothing in the operator FORCES a broadcast: with auto-broadcast off
    // (both sides "large"), the pair join planwise degrades to a shuffle
    // join on the cell key — the corpus×corpus shape
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ann.knnJoin(corpus, corpus, "vec_id", "embedding", "vec_id", "embedding",
          k = 3, numCentroids = 8, nprobe = 3, excludeSelf = true)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** The clustered corpus with its generating anchor index as the label —
    * leave-one-out kNN over well-separated clusters must recover it.
    */
  private lazy val labeled =
    corpus.withColumn("label", (col("vec_id") % 4).cast("int"))

  test("leave-one-out kNN classification recovers cluster labels (exact dial)") {
    val qs = labeled.select(col("vec_id").as("qid"), col("embedding"))
    val pred = Ann.knnClassify(labeled, qs, "vec_id", "embedding", "label", "qid", "embedding",
        k = 10, numCentroids = 8, nprobe = 8, excludeSelf = true)
      .as[(Long, Int, Long)].collect()
    assert(pred.length == 100)
    pred.foreach { case (qid, label, votes) =>
      assert(label == (qid % 4).toInt, s"query $qid predicted $label")
      // 25-member clusters, k=10: every neighbor comes from the same cluster
      assert(votes == 10L, s"query $qid votes $votes")
    }
  }

  test("IVF production dial agrees with exact classification on clustered data") {
    val qs = labeled.select(col("vec_id").as("qid"), col("embedding"))
    val prod = Ann.knnClassify(labeled, qs, "vec_id", "embedding", "label", "qid", "embedding",
        k = 10, numCentroids = 8, nprobe = 2, excludeSelf = true)
      .select("query_id", "label").as[(Long, Int)].collect().toMap
    assert(prod.size == 100)
    val agree = prod.count { case (qid, label) => label == (qid % 4).toInt }
    assert(agree >= 90, s"agreement $agree/100")
  }

  test("vote tie-break is deterministic: votes DESC, then label ASC") {
    // query 7 sees two labels with 2 votes each -> the smaller label wins
    val nbrs = Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L))
      .toDF("query_id", "neighbor_id")
    val labels = Seq((1L, 9), (2L, 9), (3L, 4), (4L, 4)).toDF("id", "lab")
    val out = Ann.voteLabels(nbrs, labels, "id", "lab")
      .as[(Long, Int, Long)].collect()
    assert(out.toSeq == Seq((7L, 4, 2L)))
  }

  test("MMR re-rank trades the redundant near-dup for a diverse candidate") {
    // A is the top hit, B is A's near-copy, C is diverse: plain top-2 takes
    // (A, B); MMR at lambda=0.5 must take (A, C) because B's redundancy
    // penalty (cos to A ~ 1) erases its relevance edge.
    val corpus = Seq(
      (1L, Array(1f, 0f)),         // A: sim .981
      (2L, Array(0.999f, -0.01f)), // B ~ A: sim .979, cos(B,A) ~ 1 -> score < 0
      (3L, Array(0.6f, 0.8f)),     // C diverse: sim .745, cos(C,A) = .6 -> score .07
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Array(1f, 0.2f))).toDF("qid", "embedding")
    val picks = Ann.mmrRerank(corpus, q, "vec_id", "embedding", "qid", "embedding",
        candidateK = 3, k = 2, lambda = 0.5)
      .orderBy("pick").select("selected_id").as[Long].collect()
    assert(picks.toSeq == Seq(1L, 3L))
    // sanity: plain top-2 WOULD have taken the near-dup
    val plain = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", "qid", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(plain.toSeq == Seq(1L, 2L))
  }

  test("RRF fusion: doc in both lists outranks single-list docs; ties break to smaller id") {
    val lex = Seq((1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 102L))
      .toDF("query_id", "rank", "doc_id")
    val sem = Seq((1L, 1L, 101L), (1L, 2L, 103L))
      .toDF("query_id", "rank", "doc_id")
    val out = graft.ops.TermStats.rrfFuse(lex, sem, "doc_id", k = 10)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    // 101 appears in both lists (1/62 + 1/61) and must lead
    assert(out.head._3 == 101L)
    assert(math.abs(out.head._4 - math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    assert(out.map(_._3).toSeq == Seq(101L, 100L, 103L, 102L))
    // 100 (lex rank 1) vs 103 (sem rank 2): 1/61 > 1/62
  }
}
