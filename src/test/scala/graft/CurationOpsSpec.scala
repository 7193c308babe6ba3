package graft

import graft.dedup.Dedup
import graft.model.Table
import graft.ops.TableIO
import org.apache.spark.sql.functions._

/** Corpus-curation operators added in round 5b: keep-best transitive dedup,
  * C4-style boilerplate-line removal, and table compaction.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // Three exact-duplicate clusters by construction: texts are near-identical
  // variants well above the 0.5 Jaccard threshold within a cluster and
  // unrelated across clusters.
  private def dupCorpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // longest of cluster {1,2,3}
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (10L, "one two three four five six seven eight"),
    (11L, "one two three four five six seven eight nine"), // longest of {10,11}
    (20L, "lonely unique document with no duplicate partner at all"),
  ).toDF("id", "text")

  test("dedupNearKeepBest keeps the longest copy per component, min-id keeps everything else") {
    val out = Dedup.dedupNearKeepBest(dupCorpus, "id", "text",
      orderBy = Seq(length(col("text")).desc),
      threshold = 0.5, bands = Dedup.recallExactBands(0.5))
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 11L, 20L))
    // contrast: min-id survivor rule picks 1 and 10 instead
    val minId = Dedup.dedupNearTransitive(dupCorpus, "id", "text",
      threshold = 0.5, bands = Dedup.recallExactBands(0.5))
    assert(minId.select("id").as[Long].collect().toSet == Set(1L, 10L, 20L))
  }

  test("dedupNearKeepBest tie-breaks equal ranks on ascending id") {
    val tied = Seq(
      (5L, "same words in this duplicated sentence body here"),
      (4L, "same words in this duplicated sentence body here"),
    ).toDF("id", "text")
    val out = Dedup.dedupNearKeepBest(tied, "id", "text",
      orderBy = Seq(length(col("text")).desc),
      threshold = 0.5, bands = Dedup.recallExactBands(0.5))
    assert(out.select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("stripBoilerplateLines removes frequent lines, keeps order, empties all-boilerplate docs") {
    val docs = Seq(
      (1L, "unique opening one\nSUBSCRIBE NOW\nunique closing one"),
      (2L, "unique opening two\nSUBSCRIBE NOW\nunique closing two"),
      (3L, "SUBSCRIBE NOW\nCOOKIE BANNER"),
      (4L, "COOKIE BANNER\nreal content here"),
      (5L, "only original content in this one"),
    ).toDF("doc_id", "text")
    // n=5 docs, cutoff = max(2, ceil(0.01*5)) = 2: SUBSCRIBE (3 docs) and
    // COOKIE (2 docs) go; everything else stays in original order.
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text")
      .select(col("doc_id"), col("__clean")).as[(Long, String)].collect().toMap
    assert(out(1L) == "unique opening one\nunique closing one")
    assert(out(2L) == "unique opening two\nunique closing two")
    assert(out(3L) == "") // every line was boilerplate; row survives
    assert(out(4L) == "real content here")
    assert(out(5L) == "only original content in this one")
  }

  test("stripBoilerplateLines plan: frequent-line set broadcasts; line shuffle keys are hashes") {
    val docs = (1 to 50).map(i => (i.toLong, s"unique $i\nSUBSCRIBE")).toDF("doc_id", "text")
    val out  = Dedup.stripBoilerplateLines(docs, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    // the frequent set joins the exploded lines as a broadcast anti-join —
    // the corpus-sized side must NOT shuffle for the membership test
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    // frequency aggregation groups by the md5 hash, not line text
    assert(plan.contains("md5"), plan)
  }

  test("dedupNearKeepBest plan: ranking window partitions by component label, not the corpus") {
    val out = Dedup.dedupNearKeepBest(dupCorpus, "id", "text",
      orderBy = Seq(length(col("text")).desc),
      threshold = 0.5, bands = Dedup.recallExactBands(0.5))
    val plan = out.queryExecution.optimizedPlan.toString
    // the window's partition spec is the CC label — only rows that joined a
    // component enter it; the pass-through side is a left-anti join
    assert(plan.contains("windowspecdefinition(__cc_label"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("stripBoilerplateLines never strips blank lines (paragraph structure)") {
    // the empty line occurs in ALL docs — far past the cutoff — yet must stay
    val docs = Seq(
      (1L, "para one\n\npara two"),
      (2L, "intro\n\noutro"),
      (3L, "a\n\nb"),
      (4L, "x\n\ny"),
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text")
      .select(col("doc_id"), col("__clean")).as[(Long, String)].collect().toMap
    assert(out(1L) == "para one\n\npara two")
    assert(out(3L) == "a\n\nb")
  }

  test("termStats: blank documents contribute no phantom empty-string term") {
    val docs = Seq((1L, "real words"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = graft.ops.TermStats.termStats(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set((1L, "real", 1L, 1L), (1L, "words", 1L, 1L)))
  }

  test("bm25TopK: hand-computed scores, idf ordering, rank tie-break, no dictionary shuffle") {
    // 4 docs: "cat" is rare (df=1), "dog" common (df=3). A query for both
    // must rank the cat doc first despite equal tf.
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "dog bird fish"),
      (3L, "dog fish fish"),
      (4L, ""),
    ).toDF("doc_id", "text")
    val qs  = Seq((10L, "cat dog")).toDF("qid", "qtext")
    val out = graft.ops.TermStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(1L, 3L, 2L), out.mkString(", "))

    // hand-check doc 1's score: N=4 (empty doc counts), avgdl=9/4,
    // dl=3, tf=1 for both terms; df(cat)=1, df(dog)=3
    def idf(df: Double)        = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))
    val expected = BigDecimal(idf(1) * w(1, 3) + idf(3) * w(1, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head._4 - expected) < 1e-9, s"${out.head._4} vs $expected")

    // docs 2 and 3 tie on "dog" tf=1 and dl=3 -> equal scores; the
    // deterministic tie-break is id DESC
    val dogOnly = out.filter(r => r._3 == 2L || r._3 == 3L)
    assert(dogOnly.map(_._4).distinct.length == 1)
    assert(dogOnly.head._3 == 3L)

    // the probe-vocabulary broadcast must prune the token stream BEFORE
    // the tf aggregation: no plan node aggregates the full dictionary
    val plan = graft.ops.TermStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    val bcastPos = plan.indexOf("BroadcastHashJoin")
    assert(bcastPos >= 0, plan)
  }

  test("compact resolves tables in a non-current database") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_compact_db")
    val t  = Table("graft_compact_dbq", graft.model.Metadata(database = Some("graft_compact_db")),
      temp = false)
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    TableIO.overwrite(spark, df.repartition(16), t)
    val (before, after) = TableIO.compact(spark, t, targetFileBytes = 512L * 1024 * 1024)
    assert(before == 16 && after == 1, s"before=$before after=$after")
    assert(spark.table(t.qualifiedName).count() == 1000)
    // no backup directory lingers after a clean compact
    val dbRoot = TableIO.managedLocation(spark, t).getParent
    val fs     = dbRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(dbRoot).exists(_.getPath.getName.contains("__precompact")))
  }

  test("stripBoilerplateLines counts documents, not occurrences") {
    // the repeated line appears 3 times but inside ONE document — below the
    // 2-distinct-docs cutoff, so it must survive
    val docs = Seq(
      (1L, "echo line\necho line\necho line"),
      (2L, "something else entirely"),
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text")
      .select(col("doc_id"), col("__clean")).as[(Long, String)].collect().toMap
    assert(out(1L) == "echo line\necho line\necho line")
  }

  test("semanticDedup collapses planted duplicate embeddings, keeps distinct ones") {
    // 3 exact-duplicate trios + 30 well-separated singleton vectors
    def unit(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(16)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n).toSeq
    }
    val dups = (0 until 3).flatMap { g =>
      val v = unit(100 + g)
      Seq((g * 10L, v), (g * 10L + 1, v), (g * 10L + 2, v))
    }
    val singles = (0 until 30).map(i => (1000L + i, unit(i)))
    val df = (dups ++ singles).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.99, numCentroids = 8)
    val kept = out.select("vec_id").as[Long].collect().toSet
    // every dup trio keeps exactly its min id; all singles survive
    assert(kept.intersect(Set(0L, 1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L)) == Set(0L, 10L, 20L))
    assert(singles.map(_._1).toSet.subsetOf(kept))
  }

  test("semanticDedup: empty input passes through; string ids dedup without a silent no-op") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(empty, "vec_id", "embedding").count() == 0)
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val strIds = Seq(("doc-a", v), ("doc-b", v), ("doc-z", Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(strIds, "vec_id", "embedding",
      threshold = 0.99, numCentroids = 2)
      .select("vec_id").as[String].collect().toSet
    assert(kept == Set("doc-a", "doc-z")) // min-id survivor among the dup pair
  }

  test("connectedComponents and transitive dedup work on string ids") {
    val pairs = Seq(("b", "c"), ("a", "b")).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(labels == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("compact rewrites a fragmented table to the size-targeted file count, rows intact") {
    val t  = Table("graft_compact_t")
    val df = (0 until 10000).map(i => (i.toLong, s"value_$i")).toDF("id", "v")
    TableIO.overwrite(spark, df.repartition(40), t)
    val warehouse = spark.table(t.qualifiedName)
    assert(warehouse.inputFiles.length == 40)
    val (before, after) = TableIO.compact(spark, t, targetFileBytes = 512L * 1024 * 1024)
    assert(before == 40 && after == 1, s"before=$before after=$after")
    val back = spark.table(t.qualifiedName)
    assert(back.inputFiles.length == 1)
    assert(back.count() == 10000)
    assert(back.agg(sum("id")).as[Long].head() == (0 until 10000).map(_.toLong).sum)
  }

  test("termStats: exact tf/df with hapax pruning and map-side partials in-plan") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "Apple  date"), // case + run-of-spaces normalization
    ).toDF("doc_id", "text")
    val all = graft.ops.TermStats.termStats(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(all == Set(
      (1L, "apple", 2L, 2L), (1L, "banana", 1L, 2L),
      (2L, "banana", 1L, 2L), (2L, "cherry", 1L, 1L),
      (3L, "apple", 1L, 2L), (3L, "date", 1L, 1L)))
    val pruned = graft.ops.TermStats.termStats(docs, "doc_id", "text", minDf = 2)
    assert(pruned.select("term").distinct().as[String].collect().toSet == Set("apple", "banana"))
    // both aggregations must run partial (map-side) before the exchange
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), plan)
  }

  test("compact preserves hive partitions and prunes after the rewrite") {
    val t  = Table("graft_compact_part")
    val df = (0 until 2000).map(i => (i.toLong, s"p${i % 4}", i * 1.0)).toDF("id", "part", "x")
    TableIO.overwrite(spark, df.repartition(32), t, partitionBy = Seq("part"))
    val (before, after) = TableIO.compact(spark, t, targetFileBytes = 512L * 1024 * 1024)
    assert(after < before, s"before=$before after=$after")
    val pruned = spark.table(t.qualifiedName).where(col("part") === "p1")
    assert(pruned.count() == 500)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part"), plan)
  }

  test("Profile.diff classifies added/removed/changed/unchanged; normalization-stable") {
    val v1 = Seq((1L, "same text"), (2L, "will change"), (3L, "will vanish"),
      (4L, "Case  And WS")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "did change"), (5L, "brand new"),
      (4L, "case and ws")).toDF("doc_id", "text")
    val got = graft.ops.Profile.diff(v1, v2, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    // doc 4 differs only by case/whitespace — fingerprint normalizes it away
    assert(got == Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("TermStats.ngramNovelty: duplicated docs score 0, unique docs 1") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),   // exact twin of 1 → both score 0
      (3L, "alpha beta gamma delta epsilon"),
    ).toDF("doc_id", "text")
    val out = graft.ops.TermStats.ngramNovelty(docs, "doc_id", "text", k = 3)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("Profile.histogram clamps out-of-range into edge bins and conserves counts") {
    val df = Seq(-10.0, 0.0, 5.0, 14.9, 15.0, 29.9, 35.0, 99.0).toDF("v")
    val h = graft.ops.Profile.histogram(df, "v", min = 0.0, max = 30.0, bins = 2)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1).toSeq
    // bins: [0,15) and [15,30); -10 clamps low, 35/99 clamp high
    assert(h == Seq((0, 0.0, 15.0, 4L), (1, 15.0, 30.0, 4L)))
  }

  test("Dedup.splitLeakage reports only pairs that cross the split boundary") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "train"),
      (2L, "alpha beta gamma delta epsilon zeta", "test"),  // leak with 1
      (3L, "alpha beta gamma delta epsilon zeta", "train"), // same-split dup of 1 — NOT a leak
      (4L, "totally different words here now ok", "test"),
    ).toDF("doc_id", "text", "split")
    val out = Dedup.splitLeakage(docs, "doc_id", "text", "split",
        threshold = 0.8, bands = Dedup.recallExactBands(0.8))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 3L)))
  }

  test("Sampling.sampleExact returns exactly n, stable across partitionings, no global sort") {
    val a = graft.ops.Sampling.sampleExact(
      (0 until 500).map(_.toLong).toDF("id").repartition(13), "id", 20)
    val b = graft.ops.Sampling.sampleExact(
      (0 until 500).map(_.toLong).toDF("id").coalesce(1), "id", 20)
    assert(a.count() == 20)
    assert(a.select("id").as[Long].collect().toSet == b.select("id").as[Long].collect().toSet)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
