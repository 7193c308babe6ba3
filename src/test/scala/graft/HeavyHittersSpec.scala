package graft

import graft.ops.{FuzzyJoin, HeavyHitters}
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("topKTerms equals the exact full-dictionary top-k (with tie-break)") {
    val docs = Seq(
      (1L, "a a a a b b b c c d"),
      (2L, "b b a a c e e e e e"),
      (3L, "f g h a b"),
    ).toDF("doc_id", "text")
    val got = HeavyHitters.topKTerms(docs, "text", k = 4, capacity = 64)
      .as[(String, Long)].collect().toSeq
    // exact counts: a=7 b=6 e=5 c=3 d=1 f=1 g=1 h=1
    assert(got == Seq(("a", 7L), ("b", 6L), ("e", 5L), ("c", 3L)))
  }

  test("topKTerms ties break deterministically by term") {
    val docs = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val got = HeavyHitters.topKTerms(docs, "text", k = 2, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 2L), ("y", 2L)))
  }

  test("under-capacity corpora fail loudly instead of silently approximating") {
    // 12 distinct terms, capacity 2, k 2 and near-uniform counts: the MG
    // coverage bound (kth > N/(cap+1)) cannot hold, so at the DEFAULT
    // (autoGrow off — capacity is a HARD memory contract, round 12: a
    // caller who sized capacity as a memory bound must opt in to growth)
    // the op must refuse
    val docs = Seq((1L, (1 to 12).map(i => s"t$i t$i").mkString(" "))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topKTerms(docs, "text", k = 2, capacity = 2)
    }
    assert(e.getMessage.contains("raise capacity"))
  }

  test("autoGrow=true heals an under-provisioned capacity and stays exact") {
    // same unprovable dial as above with the self-heal OPT-IN: the retry
    // ladder (2 -> 8 -> 32) reaches the no-eviction census regime, where
    // the result is exact by construction — self-healed, never approximate
    // (found by the sf10 sweep: the coverage relation is data-dependent,
    // a dial proven at one decade can fail the proof at the next)
    val docs = Seq((1L, ((1 to 12).map(i => s"t$i t$i") :+ "big big big").mkString(" ")))
      .toDF("doc_id", "text")
    val got = HeavyHitters.topKTerms(docs, "text", k = 2, capacity = 2, autoGrow = true)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("big", 3L), ("t1", 2L)))
  }

  test("fewer than k distinct terms with a large token count is exact, not an error") {
    // 3 distinct terms repeated 40x each: N=120 >> capacity+1, but the
    // sketch never evicts (3 <= capacity), so the candidate set is the full
    // dictionary and a <k-row result is provably exact — no spurious throw
    val docs = Seq((1L, Seq.fill(40)("aa bb cc").mkString(" "))).toDF("doc_id", "text")
    val got = HeavyHitters.topKTerms(docs, "text", k = 5, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("aa", 40L), ("bb", 40L), ("cc", 40L)))
  }

  test("topKNgrams counts word bigrams exactly; short docs produce no grams") {
    val docs = Seq(
      (1L, "the quick brown fox the quick red fox"),
      (2L, "the quick brown dog"),
      (3L, "solo"), // 1 token < n: contributes nothing
      (4L, "  "),   // empty: contributes nothing
    ).toDF("doc_id", "text")
    val got = HeavyHitters.topKNgrams(docs, "text", n = 2, k = 3, capacity = 64)
      .as[(String, Long)].collect().toSeq
    // "the quick"=3, "quick brown"=2, then ties at 1 break by term asc
    assert(got == Seq(("the quick", 3L), ("quick brown", 2L), ("brown dog", 1L)))
  }

  test("topKNgrams n=1 degenerates to topKTerms") {
    val docs = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val uni  = HeavyHitters.topKNgrams(docs, "text", n = 1, k = 3, capacity = 16)
      .as[(String, Long)].collect().toSeq
    val terms = HeavyHitters.topKTerms(docs, "text", k = 3, capacity = 16)
      .as[(String, Long)].collect().toSeq
    assert(uni == terms && uni == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("empty corpus yields an empty result") {
    val docs = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(HeavyHitters.topKTerms(docs, "text", k = 3, capacity = 8).count() == 0)
  }

  test("fuzzySelfJoin finds within-block pairs under the distance bound only") {
    val rows = Seq(
      (1L, "red widget"),  // dist(1,2)=1  same block "red"
      (2L, "red widgey"),
      (3L, "red sprocket"), // dist to widget = 6 > 2
      (4L, "blue widget"),  // different block — never compared to 1/2
      (5L, "blue widgett"), // dist(4,5)=1
    ).toDF("id", "name")
    val got = FuzzyJoin.fuzzySelfJoin(rows, "id", "name",
        split(col("name"), " ").getItem(0), maxDistance = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("fuzzySelfJoin bucket cap truncates a hot block deterministically") {
    // 6 identical-block rows, cap 3: only ids 1..3 survive into the join
    val rows = (1L to 6L).map(i => (i, s"k name$i")).toDF("id", "name")
    val got = FuzzyJoin.fuzzySelfJoin(rows, "id", "name",
        split(col("name"), " ").getItem(0), maxDistance = 2, maxBucketSize = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.flatMap(p => Set(p._1, p._2)).subsetOf(Set(1L, 2L, 3L)))
    assert(got.nonEmpty) // name1..name3 are within 1 edit of each other
  }

  test("incremental hitter store: batch split is invisible to the final top-k") {
    import graft.model.Table
    val docs = (1L to 400L).map { i =>
      // zipf-ish: "alpha" everywhere, "beta" every 2nd, ... plus unique noise
      val terms = Seq("alpha") ++
        (if (i % 2 == 0) Seq("beta") else Nil) ++
        (if (i % 4 == 0) Seq("gamma") else Nil) ++
        Seq(s"noise$i")
      (i, terms.mkString(" "))
    }.toDF("doc_id", "text")
    val store = Table("graft_hh_inc_store")
    HeavyHitters.buildHitterStore(spark, docs.where($"doc_id" <= 150), "text", store,
      capacity = 64)
    HeavyHitters.appendHitterStore(spark, docs.where($"doc_id" > 150), "text", store,
      capacity = 64)
    val inc = HeavyHitters.topKTermsFromStore(spark, docs, "text", store, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(inc == Seq(("alpha", 400L), ("beta", 200L), ("gamma", 100L)))
    // one-pass answer agrees
    val onePass = HeavyHitters.topKTerms(docs, "text", k = 3, capacity = 64)
      .as[(String, Long)].collect().toSeq
    assert(inc == onePass)
  }

  test("incremental hitter store: capacity mismatch on append is a hard error") {
    import graft.model.Table
    val docs  = Seq((1L, "a b c")).toDF("doc_id", "text")
    val store = Table("graft_hh_inc_capchk")
    HeavyHitters.buildHitterStore(spark, docs, "text", store, capacity = 32)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.appendHitterStore(spark, docs, "text", store, capacity = 64)
    }
    assert(e.getMessage.contains("capacity=32"))
  }
}
