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

  test("approx_count_distinct stays within the default rsd envelope") {
    val df  = (1 to 10000).map(i => i % 997).toDF("k")
    val row = df.agg(approx_count_distinct("k").as("a"), countDistinct("k").as("e")).collect()(0)
    val (a, e) = (row.getLong(0), row.getLong(1))
    assert(math.abs(a - e).toDouble / e <= 0.15, s"approx $a vs exact $e")
  }
}
