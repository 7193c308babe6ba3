package graft

import graft.ops.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._

class AsofRangeSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    ("A", 10L, "t1"),
    ("A", 25L, "t2"),
    ("A", 5L, "t0"),  // before any quote
    ("B", 50L, "t3"),
  ).toDF("sym", "tts", "trade_id")

  private val quotes = Seq(
    ("A", 10L, 1L, 100.0), // tied with t1's ts — visible (<=)
    ("A", 10L, 2L, 101.0), // same ts, greater tiebreak — must win
    ("A", 20L, 3L, 102.0),
    ("B", 60L, 4L, 103.0), // after B's only trade
  ).toDF("sym", "qts", "qid", "px")

  test("asof join picks latest quote at-or-before, max tiebreak on ties") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("sym"), leftTs = "tts",
        rightTs = "qts", rightCols = Seq("qid", "px"), rightTieBreak = "qid")
      .select("trade_id", "qid", "px")
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    assert(out("t0") == (None, None))                 // no quote yet
    assert(out("t1") == (Some(2L), Some(101.0)))      // tie at ts=10 → qid 2
    assert(out("t2") == (Some(3L), Some(102.0)))      // latest <= 25 is ts=20
    assert(out("t3") == (None, None))                 // B's quote is later
  }

  test("asof join plan has one exchange and no cross product") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("sym"), leftTs = "tts",
      rightTs = "qts", rightCols = Seq("qid", "px"), rightTieBreak = "qid")
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size >= 1)
  }

  test("asof join rejects colliding right payload names") {
    intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, quotes.withColumnRenamed("qid", "trade_id"),
        Seq("sym"), "tts", "qts", Seq("trade_id"), "trade_id")
    }
  }

  private val points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, -5.0)).toDF("pid", "v")
  private val ivs = Seq(
    (10L, 0.0, 10.0),   // catches 5.0 (and boundary 10 would too)
    (20L, 10.0, 20.0),  // catches 15.0
    (30L, -10.0, 30.0), // catches all four (spans many bins)
    (40L, 26.0, 27.0),  // catches none
    (50L, 9.0, 4.0),    // inverted — dropped
  ).toDF("iid", "lo", "hi")

  test("range join matches exactly the BETWEEN pairs, once each") {
    val out = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", binWidth = 8.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    val expected = Seq((1L, 10L), (2L, 20L), (1L, 30L), (2L, 30L), (3L, 30L), (4L, 30L))
    assert(out.sorted == expected.sorted) // no duplicate emissions
  }

  test("range join drops intervals wider than maxBinsPerInterval") {
    val out = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi",
        binWidth = 8.0, maxBinsPerInterval = 3)
      .select("iid").distinct().as[Long].collect().toSet
    assert(!out.contains(30L)) // 40-unit interval spans 6 bins > 3
    assert(out == Set(10L, 20L))
  }

  test("range join plan is an equi-join, not a nested loop") {
    val out  = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", binWidth = 8.0)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
