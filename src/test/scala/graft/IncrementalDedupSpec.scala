package graft

import graft.dedup.{Dedup, IncrementalDedup}
import graft.model.Table
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "Completely different content about training data pipelines at scale with spark"),
    (3L, "Another unrelated document mentioning embeddings and similarity search methods"),
  ).toDF("doc_id", "text")

  test("exact incremental: drops store hits and batch-internal dups, keeps new docs") {
    val store = Table("graft_test_inc_store")
    IncrementalDedup.buildFingerprintStore(spark, corpus, "text", store)
    val batch = Seq(
      (10L, "the  QUICK brown fox jumps over the lazy dog near the river bank today"), // = corpus 1 normalized
      (11L, "A genuinely new document that the corpus has never seen before"),
      (12L, "A genuinely new DOCUMENT that the corpus has never seen   before"), // batch dup of 11
      (13L, "Another new body of text arriving in this batch"),
    ).toDF("doc_id", "text")
    val out = IncrementalDedup.dedupExactIncremental(spark, batch, "text", "doc_id", store)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(11L, 13L))
    assert(out.columns.toSeq == Seq("doc_id", "text")) // helper columns dropped
  }

  test("exact incremental: store update makes the next batch see prior survivors") {
    val store = Table("graft_test_inc_store2")
    IncrementalDedup.buildFingerprintStore(spark, corpus, "text", store)
    val batch1 = Seq((10L, "First wave document body unique to batch one")).toDF("doc_id", "text")
    val out1   = IncrementalDedup.dedupExactIncremental(spark, batch1, "text", "doc_id", store)
    assert(out1.count() == 1)
    // same body arrives again in batch 2 -> dropped against the UPDATED store
    val batch2 = Seq(
      (20L, "first wave DOCUMENT body unique to batch one"),
      (21L, "Second wave document body never seen anywhere"),
    ).toDF("doc_id", "text")
    val out2 = IncrementalDedup.dedupExactIncremental(spark, batch2, "text", "doc_id", store)
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(21L))
  }

  test("exact incremental: updateStore=false leaves the store untouched") {
    val store = Table("graft_test_inc_store3")
    IncrementalDedup.buildFingerprintStore(spark, corpus, "text", store)
    val before = spark.table(store.qualifiedName).count()
    val batch  = Seq((10L, "Ephemeral probe document not to be remembered")).toDF("doc_id", "text")
    val out = IncrementalDedup.dedupExactIncremental(
      spark, batch, "text", "doc_id", store, updateStore = false)
    assert(out.count() == 1)
    assert(spark.table(store.qualifiedName).count() == before)
  }

  test("near incremental: near-dups of indexed corpus drop, fresh docs survive") {
    val index = Table("graft_test_inc_lsh")
    val bands = Dedup.recallExactBands(0.6)
    IncrementalDedup.buildLshIndex(spark, corpus, "doc_id", "text", index, bands = bands)
    val batch = Seq(
      // near-dup of corpus 1 (one word appended)
      (10L, "The quick brown fox jumps over the lazy dog near the river bank today indeed"),
      // genuinely fresh
      (11L, "Entirely novel subject matter with no lexical overlap whatsoever here"),
    ).toDF("doc_id", "text")
    val out = IncrementalDedup.dedupNearIncremental(
      spark, batch, corpus, "doc_id", "text", index, threshold = 0.6, bands = bands)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(11L))
  }

  test("near incremental: index update makes the next batch dedup against admitted docs") {
    val index = Table("graft_test_inc_lsh2")
    val bands = Dedup.recallExactBands(0.6)
    IncrementalDedup.buildLshIndex(spark, corpus, "doc_id", "text", index, bands = bands)
    val batch1 = Seq(
      (10L, "Fresh arrival about orchestrating large distributed dataflow graphs efficiently"),
    ).toDF("doc_id", "text")
    val corpusPlus = corpus.unionByName(batch1) // caller's ingest step
    val out1 = IncrementalDedup.dedupNearIncremental(
      spark, batch1, corpus, "doc_id", "text", index, threshold = 0.6, bands = bands)
    assert(out1.count() == 1)
    // batch 2 carries a near-dup of batch 1's survivor -> dropped via the appended index
    val batch2 = Seq(
      (20L, "Fresh arrival about orchestrating large distributed dataflow graphs efficiently today"),
      (21L, "Wholly distinct text concerning cryptographic hash families and banding"),
    ).toDF("doc_id", "text")
    val out2 = IncrementalDedup.dedupNearIncremental(
      spark, batch2, corpusPlus, "doc_id", "text", index, threshold = 0.6, bands = bands)
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(21L))
  }

  test("substringDupPairs: exact dial finds planted shared runs, nothing else") {
    val shared = "this exact forty-plus character passage is copied verbatim between documents"
    val docs = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"totally different opening here $shared and another ending"),
      (3L, "no overlap at all in this document body which talks about other things entirely"),
      (4L, "short doc"),
      (5L, "short doc"), // whole-text window match for sub-minLen docs
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupPairs(docs, "doc_id", "text", minLen = 40)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (4L, 5L)))
  }

  test("substringDupPairs: winnow dial catches guaranteed-length runs and verifies exactly") {
    val long = "a sufficiently long shared passage that comfortably exceeds the guarantee " +
      "threshold of minLen plus window minus one characters in normalized form"
    val docs = Seq(
      (1L, s"alpha $long omega"),
      (2L, s"beta $long psi"),
      (3L, "entirely unrelated content with no repeated windows of any meaningful length here"),
    ).toDF("doc_id", "text")
    val exact  = Dedup.substringDupPairs(docs, "doc_id", "text", minLen = 40)
      .as[(Long, Long)].collect().toSet
    val winnow = Dedup.substringDupPairs(docs, "doc_id", "text", minLen = 40, winnowWindow = 4)
      .as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)))
    assert(winnow.contains((1L, 2L))) // run >= minLen+w-1: guaranteed caught
    assert(winnow.subsetOf(exact))    // verify step admits no false pairs
  }

  test("removeSharedSubstrings cuts the shared span from all carriers, only that") {
    val shared = "this exact forty-plus character passage is copied verbatim between documents"
    val docs = Seq(
      (1L, s"Prefix One $shared suffix one"),
      (2L, s"opening two $shared Closing Two"),
      (3L, "no overlap at all in this document body which talks about other things entirely"),
    ).toDF("doc_id", "text")
    val out = Dedup.removeSharedSubstrings(docs, "doc_id", "text", minLen = 40)
      .as[(Long, String)].collect().toMap
    // every doc present; the unshared doc passes through normalized-uncut
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L) == "no overlap at all in this document body which talks about other things entirely")
    // the shared passage is gone from both carriers, their unique flanks remain
    for (id <- Seq(1L, 2L)) {
      assert(!out(id).contains("copied verbatim"), s"doc $id kept shared text")
    }
    assert(out(1L).startsWith("prefix one") && out(1L).endsWith("suffix one"))
    assert(out(2L).startsWith("opening two") && out(2L).endsWith("closing two"))
  }

  test("removeSharedSubstrings winnow dial: guaranteed-length runs still fully cut") {
    val long = "a sufficiently long shared passage that comfortably exceeds the guarantee " +
      "threshold of minLen plus window minus one characters in normalized form"
    val docs = Seq(
      (1L, s"alpha $long omega"),
      (2L, s"beta $long psi"),
      (3L, "entirely unrelated content with no repeated windows of any meaningful length here"),
    ).toDF("doc_id", "text")
    val exact = Dedup.removeSharedSubstrings(docs, "doc_id", "text", minLen = 40)
      .as[(Long, String)].collect().toMap
    val winnow = Dedup.removeSharedSubstrings(docs, "doc_id", "text", minLen = 40,
      winnowWindow = 4).as[(Long, String)].collect().toMap
    // the run is >= minLen+w-1, so the winnow prefilter must find both
    // carriers and the cut equals the exact dial's cut
    assert(winnow(1L) == exact(1L) && winnow(2L) == exact(2L))
    assert(!winnow(1L).contains("guarantee"))
    assert(winnow(3L) == exact(3L))
  }

  test("production dial candidate volume: winnowed keys a small fraction of every-window keys") {
    // the q92/q93 rationale made measurable: on the real documents fixture,
    // the winnowWindow=4 dial must emit ~2/(w+1) ≈ 40% of the verification
    // dial's exploded window keys (winnowing's expected density) — that
    // ratio IS the 100 TB candidate-volume saving
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.NativeFunctions
    val every = docs.select(sum(size(NativeFunctions.windowHashes64(col("text"), 40))))
      .first().getLong(0)
    val winnowed = docs.select(sum(size(NativeFunctions.winnowFingerprints(col("text"), 40, 4))))
      .first().getLong(0)
    assert(every > 0 && winnowed > 0)
    val ratio = winnowed.toDouble / every
    assert(ratio < 0.5, f"winnowed/every = $ratio%.3f — production dial isn't thinning candidates")
  }

  test("contaminatedThreshold applies both the count and fraction dials") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, evalText), // one eval doc (id % 5 == 0 convention not used here)
      // shares >= 2 grams with eval (long overlap)
      (2L, s"$evalText and some extra trailing words beyond the overlap region"),
      // exactly one shared 8-gram: below minShared=2
      (3L, "alpha beta gamma delta epsilon zeta eta theta completely different tail " +
        "of words that never appeared in the evaluation corpus at all whatsoever"),
      (4L, "nothing in common with the benchmark text in any of its sliding windows"),
    ).toDF("doc_id", "text")
    val ev = docs.where($"doc_id" === 1L)
    val flagged = Dedup.contaminatedThreshold(docs, ev, "doc_id", "text",
      k = 8, minShared = 2).select("id").as[Long].collect().toSet
    assert(flagged == Set(1L, 2L))
    // a high fraction dial clears the long doc whose overlap is proportionally small
    val strict = Dedup.contaminatedThreshold(docs, ev, "doc_id", "text",
      k = 8, minShared = 2, minFraction = 0.9).select("id").as[Long].collect().toSet
    assert(strict == Set(1L))
  }

  test("bloom decontamination equals exact decontamination") {
    val docs = (1L to 60L).map { i =>
      val body =
        if (i % 7 == 0) s"shared evaluation passage number ${i % 3} repeated verbatim across documents one two three four five six"
        else s"unique training document $i with its own content padding tokens alpha beta gamma delta epsilon zeta"
      (i, body)
    }.toDF("doc_id", "text")
    val ev      = docs.filter(col("doc_id") % 14 === 0)
    val exact   = Dedup.contaminated(docs, ev, "doc_id", "text", k = 8)
    val bloomed = Dedup.contaminatedBloom(docs, ev, "doc_id", "text", k = 8)
    assert(bloomed.as[Long].collect().toSet == exact.as[Long].collect().toSet)
    assert(bloomed.count() > 0) // the planted shared passages are caught
  }

  test("bloom prefilter keeps plan codegen-compatible and drops non-eval grams") {
    // unrelated docs: every gram should be bloom-negative at fpp=0.01, so
    // the verify-join input is (almost) empty — spot the filter in the plan
    val docs = Seq(
      (1L, "completely distinct first body of running text for the filter check"),
      (2L, "second unrelated body with different vocabulary entirely for testing"),
    ).toDF("doc_id", "text")
    val ev  = Seq((9L, "an eval passage sharing nothing with the training docs at all ok")).toDF("doc_id", "text")
    val out = Dedup.contaminatedBloom(docs, ev, "doc_id", "text", k = 8)
    assert(out.count() == 0)
  }

  test("hash64 incremental: near-index items drop, survivors extend the index") {
    val idx = Table("graft_test_h64_index")
    IncrementalDedup.buildHash64Index(spark,
      Seq((1L, 0x0L)).toDF("id", "h"), "id", "h", idx, maxHamming = 3)
    // 0x3 is hamming 2 from the stored 0x0 → dropped; 0xFFFF is hamming 16 → kept
    val s1 = IncrementalDedup.dedupHash64Incremental(spark,
      Seq((10L, 0x3L), (11L, 0xFFFFL)).toDF("id", "h"), "id", "h", idx, maxHamming = 3)
    assert(s1.select("id").as[Long].collect().toSet == Set(11L))
    // cross-batch: 0xFFFC is hamming 2 from the ADMITTED 0xFFFF → dropped
    val s2 = IncrementalDedup.dedupHash64Incremental(spark,
      Seq((20L, 0xFFFCL)).toDF("id", "h"), "id", "h", idx, maxHamming = 3)
    assert(s2.count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS ${idx.qualifiedName}")
  }
}
