package graft

import graft.functions.TextFunctions
import graft.model._
import graft.ops._
import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._

/** Round-4 additions: winnowing fingerprints, stream-style interval join
  * semantics, partition pruning, rollup/set-op surfaces.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("winnowing: shared passage of length >= w+k-1 shares a fingerprint") {
    // k=8, w=4 → guarantee threshold is 11 chars; the planted common passage
    // is much longer, the rest of each doc is disjoint.
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta gamma $common delta epsilon"),
      (2L, s"unrelated prefix words $common zz suffix tail"),
      (3L, "completely different content with no overlap at all here"),
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      explode(TextFunctions.winnowFingerprints(col("text"), k = 8, w = 4)).as("fp"))
    val byDoc = fps.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty, "shared passage must share a fingerprint")
    // doc 3 shares no 11+ char passage with doc 1 — overlap should be absent
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("winnowing: short text yields exactly one whole-text fingerprint") {
    val one = Seq((1L, "tiny")).toDF("doc_id", "text")
      .select(TextFunctions.winnowFingerprints(col("text"), k = 8, w = 4).as("fps"))
      .collect()(0).getSeq[String](0)
    assert(one.length == 1)
  }

  test("winnowing is deterministic and partitioning-independent") {
    val docs = (1 to 50).map(i => (i.toLong, s"document number $i with some repeated filler text " * 3))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      docs.repartition(parts)
        .select(col("doc_id"), explode(TextFunctions.winnowFingerprints(col("text"))).as("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run(1) == run(7))
  }

  test("intervalJoin semantics (batch plan): only rows within the lag window match") {
    val left = Seq((1L, 10L, 1000L), (1L, 11L, 5000L), (2L, 12L, 1000L))
      .toDF("lk", "lid", "lsec").select(col("lk"), col("lid"), col("lsec").cast("timestamp").as("lts"))
    val right = Seq((1L, 20L, 995L), (1L, 21L, 800L), (1L, 22L, 1001L), (2L, 23L, 999L), (3L, 24L, 1000L))
      .toDF("rk", "rid", "rsec").select(col("rk"), col("rid"), col("rsec").cast("timestamp").as("rts"))
    // same join expression StreamJoin builds, exercised on batch frames
    val out = left.join(right,
      expr("lk = rk AND rts >= lts - interval 100 seconds AND rts <= lts"), "inner")
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    // (10,20): 995 in [900,1000] ✓; (10,21): 800 too old ✗; (10,22): future ✗;
    // (12,23): 999 in [900,1000] ✓; key 3 never joins
    assert(out == Set((10L, 20L), (12L, 23L)))
  }

  test("partitioned write prunes partitions on the filter column") {
    val df = Seq(("A", 1), ("A", 2), ("B", 3), ("C", 4)).toDF("status", "v")
    val t  = Table("round4_part_prune")
    TableIO.overwrite(spark, df, t, partitionBy = Seq("status"))
    val q    = spark.table(t.qualifiedName).where(col("status") === "B")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("isnotnull(status"),
      s"expected partition filters in scan:\n$scan")
    assert(q.select("v").as[Int].collect().toSeq == Seq(3))
    DropTable(spark, t)
  }

  test("rollup matches manual union of grouping levels") {
    val df = Seq(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0)).toDF("a", "b", "v")
    val roll = df.rollup(col("a"), col("b")).agg(sum("v").as("s"))
      .select(coalesce(col("a"), lit("ALL")).as("a"), coalesce(col("b"), lit("ALL")).as("b"), col("s"))
      .as[(String, String, Double)].collect().toSet
    val expected = Set(
      ("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0),
      ("x", "ALL", 3.0), ("y", "ALL", 3.0), ("ALL", "ALL", 6.0))
    assert(roll == expected)
  }

  test("contaminated finds exactly the train docs sharing an 8-word shingle with eval") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val train = Seq(
      (1L, s"prefix words here $base and a tail"),   // contains the eval passage
      (2L, "totally disjoint text with other words entirely distinct tokens"),
      (3L, base),                                     // exact eval doc
    ).toDF("doc_id", "text")
    val eval = Seq((100L, base)).toDF("doc_id", "text")
    val ids = graft.dedup.Dedup.contaminated(train, eval, "doc_id", "text", k = 8)
      .as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("repeatedShingleFraction: unique text 0, fully repeated text > 0") {
    val df = Seq(
      (1L, "a b c d e f"),                 // all 3-shingles distinct
      (2L, "x y z x y z x y z x y z"),     // heavy repetition
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextFunctions.repeatedShingleFraction(col("text"), 3).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(out(2L) > 0.5)
  }

  test("mixture keeps per-group fractions deterministically") {
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "xx")).toDF("id", "grp")
    val kept = Sampling.mixture(df, "grp", "id", Map("en" -> 0.5, "xx" -> 0.1))
    val counts = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("en") - 1000L) < 150, s"en kept ${counts("en")}")
    assert(math.abs(counts("xx") - 200L) < 80, s"xx kept ${counts.getOrElse("xx", 0L)}")
    // deterministic: same rows on re-run regardless of partitioning
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.mixture(df.repartition(7), "grp", "id", Map("en" -> 0.5, "xx" -> 0.1))
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("packGreedy: budget boundaries, oversized docs, per-group reset, determinism") {
    val df = Seq(
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 10L),  // 60+50 > 100 → pack split after id1? 60+50=110>100 → id2 opens pack 1; +10=60 stays
      ("a", 4L, 250L),                                  // oversized → own pack
      ("a", 5L, 5L),                                    // 250+5 > 100 → new pack
      ("b", 6L, 30L), ("b", 7L, 30L),                   // fresh counter per group
    ).toDF("grp", "id", "tokens")
    val out = Packing.packGreedy(df, "grp", "id", "tokens", budget = 100L)
      .select("grp", "id", "pack_id").as[(String, Long, Long)].collect()
      .map { case (g, i, p) => (g, i) -> p }.toMap
    assert(out(("a", 1L)) == 0 && out(("a", 2L)) == 1 && out(("a", 3L)) == 1)
    assert(out(("a", 4L)) == 2 && out(("a", 5L)) == 3)
    assert(out(("b", 6L)) == 0 && out(("b", 7L)) == 0)
    // partitioning-independent
    val re = Packing.packGreedy(df.repartition(5), "grp", "id", "tokens", budget = 100L)
      .select("grp", "id", "pack_id").as[(String, Long, Long)].collect()
      .map { case (g, i, p) => (g, i) -> p }.toMap
    assert(re == out)
  }

  test("approx_count_distinct stays within the default rsd envelope") {
    val df  = (1 to 10000).map(i => i % 997).toDF("k")
    val row = df.agg(approx_count_distinct("k").as("a"), countDistinct("k").as("e")).collect()(0)
    val (a, e) = (row.getLong(0), row.getLong(1))
    assert(math.abs(a - e).toDouble / e <= 0.15, s"approx $a vs exact $e")
  }
}
