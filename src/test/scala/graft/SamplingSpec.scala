package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hashSplit assigns every row, fractions land near the cuts") {
    val split  = Sampling.hashSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform: 80/10/10 ± a few percent at n=2000
    assert(math.abs(counts("train") - 1600L) < 120, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 80, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 200L) < 80, s"test=${counts("test")}")
  }

  test("hashSplit is deterministic and independent of partitioning") {
    val a = Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 1.0))
      .orderBy("id").as[(Long, String)].collect()
    val b = Sampling.hashSplit(ids.repartition(13), "id", Seq("a" -> 0.5, "b" -> 1.0))
      .orderBy("id").as[(Long, String)].collect()
    assert(a.sameElements(b))
  }

  test("sampleByHash keeps roughly the requested fraction, stable across runs") {
    val s1 = Sampling.sampleByHash(ids, "id", 0.25)
    val n  = s1.count()
    assert(math.abs(n - 500L) < 80, s"n=$n")
    assert(s1.collect().map(_.getLong(0)).toSet ==
      Sampling.sampleByHash(ids.repartition(7), "id", 0.25).collect().map(_.getLong(0)).toSet)
  }

  test("sampleByGroup caps each group at n with deterministic members") {
    val df = Seq.tabulate(300)(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val s  = Sampling.sampleByGroup(df, Seq("g"), "id", n = 5)
    val perGroup = s.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ == 5))
    val again = Sampling.sampleByGroup(df.repartition(11), Seq("g"), "id", n = 5)
    assert(s.orderBy("g", "id").collect().sameElements(again.orderBy("g", "id").collect()))
  }

  test("tokenBudget admits per-group prefixes within budget, deterministically") {
    val df = Seq.tabulate(60)(i => (s"g${i % 2}", i.toLong, 10L + i % 7))
      .toDF("g", "id", "toks")
    val s = Sampling.tokenBudget(df, "g", "id", "toks", Map("g0" -> 100L), defaultBudget = 55L)
    val sums = s.groupBy("g").sum("toks").as[(String, Long)].collect().toMap
    assert(sums("g0") <= 100L && sums("g1") <= 55L)
    // the admitted set is a PREFIX of the hash order: adding the next doc
    // in that order must overflow the budget
    val ordered = df.withColumn("b", Sampling.hashBucket($"id"))
      .orderBy($"g", $"b", $"id").as[(String, Long, Long, String)].collect()
    for ((g, budget) <- Seq(("g0", 100L), ("g1", 55L))) {
      val inOrder = ordered.filter(_._1 == g).map(r => (r._2, r._3))
      val kept    = s.where($"g" === g).select("id").as[Long].collect().toSet
      val prefix  = inOrder.scanLeft(0L)(_ + _._2).tail.zip(inOrder)
        .takeWhile(_._1 <= budget).map(_._2._1).toSet
      assert(kept == prefix, s"group $g")
    }
    // partitioning-independent
    val again = Sampling.tokenBudget(df.repartition(13), "g", "id", "toks",
      Map("g0" -> 100L), defaultBudget = 55L)
    assert(s.orderBy("g", "id").collect().sameElements(again.orderBy("g", "id").collect()))
  }

  test("hexCut formats the fraction boundary as 8 lowercase hex chars") {
    assert(Sampling.hexCut(0.8) == "cccccccc")
    assert(Sampling.hexCut(0.9) == "e6666666")
    assert(Sampling.hexCut(0.0) == "00000000")
    // keep-all sentinel: strictly greater than every 8-hex bucket, so
    // fraction 1.0 keeps even keys hashing to exactly "ffffffff"
    assert(Sampling.hexCut(1.0) == "g")
    assert("ffffffff" < Sampling.hexCut(1.0))
  }

  test("fraction 1.0 keeps every row, including buckets of exactly ffffffff") {
    val df = Seq("k1", "k2", "k3").toDF("id")
      .union(Seq("__sentinel__").toDF("id"))
    assert(Sampling.sampleByHash(df, "id", 1.0).count() == df.count())
    // direct unit check of the comparison the filter performs
    assert("ffffffff" < "g" && "00000000" < "g")
  }

  test("epochMixture: whole copies exact, fractional copy ~frac, epoch indices dense") {
    val df = (0 until 400).map(i =>
      (i.toLong, if (i < 200) "hq" else "bulk")).toDF("doc_id", "source")
    val out = Sampling.epochMixture(df, "source", "doc_id",
      Map("hq" -> 2.5, "bulk" -> 0.25))
    val byGroup = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // hq: exactly 2 copies each + ~50% a third; bulk: ~25% one copy
    assert(byGroup("hq") >= 400 && byGroup("hq") <= 600)
    assert(math.abs(byGroup("hq") - 500.0) < 60, s"hq=${byGroup("hq")}")
    assert(math.abs(byGroup("bulk") - 50.0) < 25, s"bulk=${byGroup("bulk")}")
    // per-doc epochs are 0..copies-1 with no gaps
    val perDoc = out.filter(col("source") === "hq")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max(col("epoch")).as("mx"))
      .as[(Long, Long, Long)].collect()
    assert(perDoc.forall { case (_, n, mx) => mx == n - 1 && (n == 2 || n == 3) })
    // deterministic across runs
    val again = Sampling.epochMixture(df, "source", "doc_id",
      Map("hq" -> 2.5, "bulk" -> 0.25))
    assert(again.except(out).count() == 0 && out.except(again).count() == 0)
  }

  test("epochMixture: zero epochs drops the group; default applies to unlisted groups") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "source")
    val out = Sampling.epochMixture(df, "source", "doc_id", Map("a" -> 0.0), defaultEpochs = 2.0)
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((2L, "b", 0L), (2L, "b", 1L), (3L, "c", 0L), (3L, "c", 1L)))
  }

  test("weightedSample: exact n, deterministic under repartitioning") {
    val df = (1L to 1000L).map(i => (i, (i % 7 + 1) * 10)).toDF("doc_id", "w")
    val a  = Sampling.weightedSample(df, "doc_id", "w", 50).as[(Long, Long)].collect().toSeq
    val b  = Sampling.weightedSample(df.repartition(13), "doc_id", "w", 50)
      .as[(Long, Long)].collect().toSeq
    assert(a.length == 50 && a == b)
  }

  test("weightedSample: scaling every weight by a constant keeps the same sample") {
    // u^(1/(c*w)) is a monotone transform of u^(1/w), so A-ES ranks are
    // order-invariant under global weight scaling
    val df = (1L to 500L).map(i => (i, i % 11 + 1)).toDF("doc_id", "w")
    val base   = Sampling.weightedSample(df, "doc_id", "w", 40).as[(Long, Long)].collect().map(_._1)
    val scaled = Sampling.weightedSample(
      df.withColumn("w", col("w") * 1000), "doc_id", "w", 40)
      .as[(Long, Long)].collect().map(_._1)
    assert(base.toSeq == scaled.toSeq)
  }

  test("weightedSamplePerGroup: exact n per stratum, whole group when smaller, consistent ranks") {
    val df = ((1L to 100L).map(i => (i, "big", i % 5 + 1)) ++
      (201L to 203L).map(i => (i, "tiny", 1L))).toDF("doc_id", "grp", "w")
    val out = Sampling.weightedSamplePerGroup(df, "grp", "doc_id", "w", 10)
      .as[(Long, String, Long)].collect()
    assert(out.count(_._2 == "big") == 10)
    assert(out.count(_._2 == "tiny") == 3) // whole group when smaller than n
    // within-group selection must agree with the ungrouped sampler run on
    // that group alone (same rank formula, same tie-break)
    val bigOnly = Sampling.weightedSample(df.filter(col("grp") === "big"), "doc_id", "w", 10)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(out.filter(_._2 == "big").map(_._1).toSet == bigOnly)
  }

  test("weightedSample: heavy-weight rows dominate; zero/negative/null excluded") {
    // 500 rows at weight 1, 500 at weight 100: the heavy half should own
    // almost all of a 50-row sample (deterministic given the fixture)
    val df = (1L to 1000L).map(i => (i, if (i <= 500) 1L else 100L)).toDF("doc_id", "w")
    val picked = Sampling.weightedSample(df, "doc_id", "w", 50).as[(Long, Long)].collect()
    assert(picked.count(_._2 == 100L) >= 45, picked.count(_._2 == 100L).toString)

    val withBad = df.union(Seq((2001L, 0L), (2002L, -5L)).toDF("doc_id", "w"))
      .union(Seq(2003L).toDF("doc_id").withColumn("w", lit(null).cast("long")))
    val ids = Sampling.weightedSample(withBad, "doc_id", "w", 1000)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(!ids.exists(_ >= 2001L))
    assert(ids.size == 1000)
  }

  private def waterfill(rows: Seq[(String, Long)], w: Map[String, Long], b: Long) =
    Sampling.budgetWaterfill(rows.toDF("g", "tok"), "g", "tok", w, b)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("budgetWaterfill: saturation redistributes surplus, zero-weight gets 0") {
    // avail: a=10, b=1000, c=77 (unweighted); weights a=1, b=1; budget 100
    val got = waterfill(
      Seq(("a", 4L), ("a", 6L), ("b", 1000L), ("c", 77L)),
      Map("a" -> 1L, "b" -> 1L), 100L)
    // a saturates at 10; its surplus flows to b: alloc_b = floor(1*t/2)
    // with t from (100-10)*2/1 = 180 → 90; c carries weight 0 → 0
    assert(got("a") == ((10L, 1L, 10L)))
    assert(got("b") == ((1000L, 1L, 90L)))
    assert(got("c") == ((77L, 0L, 0L)))
  }

  test("budgetWaterfill: everything fits → alloc = avail; proportional when nothing fits") {
    val fits = waterfill(Seq(("a", 10L), ("b", 20L)), Map("a" -> 3L, "b" -> 1L), 1000L)
    assert(fits("a")._3 == 10L && fits("b")._3 == 20L)
    // a zero-weight group under an AMPLE budget still allocates 0 — the
    // null-tStar path must not hand it `avail` (round-9 advice: budget 1400
    // over weighted avail 1307 + an unweighted 100 must allocate 1307, not
    // 1407)
    val amply = waterfill(
      Seq(("a", 100L), ("b", 300L), ("c", 7L), ("d", 900L), ("z", 100L)),
      Map("a" -> 2L, "b" -> 5L, "c" -> 1L, "d" -> 1L), 1400L)
    assert(amply("z") == ((100L, 0L, 0L)))
    assert(amply.values.map(_._3).sum == 1307L)
    // budget far below every availability: pure proportional split
    val prop = waterfill(Seq(("a", 10000L), ("b", 10000L)), Map("a" -> 3L, "b" -> 1L), 100L)
    assert(prop("a")._3 == 75L && prop("b")._3 == 25L)
  }

  test("budgetWaterfill: total allocation never exceeds min(budget, total avail)") {
    for (b <- Seq(0L, 5L, 50L, 500L, 5000L)) {
      val got = waterfill(
        Seq(("a", 100L), ("b", 300L), ("c", 7L), ("d", 900L)),
        Map("a" -> 2L, "b" -> 5L, "c" -> 1L, "d" -> 1L), b)
      val total = got.values.map(_._3).sum
      assert(total <= math.min(b, 1307L), s"budget $b allocated $total")
      // floors lose at most one token per weighted group
      assert(total >= math.min(b, 1307L) - 4, s"budget $b allocated only $total")
      got.values.foreach { case (avail, _, alloc) => assert(alloc <= avail && alloc >= 0) }
    }
  }
}
