package graft

import graft.model.Table
import graft.ops.{Profile, Sketches}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("incremental sketch store: append equals rebuild equals exact (coupon regime)") {
    val df = (0 until 2000).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
    val t1 = Table("graft_test_hll_a")
    val t2 = Table("graft_test_hll_b")
    // two-batch append
    Sketches.buildDistinctStore(spark, df.filter(col("id") < 800), "grp", "id", t1, lgK = 14)
    Sketches.appendDistinctStore(spark, df.filter(col("id") >= 800), "grp", "id", t1, lgK = 14)
    // single-shot
    Sketches.buildDistinctStore(spark, df, "grp", "id", t2, lgK = 14)
    val inc  = Sketches.estimateDistinct(spark, t1).as[(String, Double)].collect().toMap
    val one  = Sketches.estimateDistinct(spark, t2).as[(String, Double)].collect().toMap
    assert(inc == one)
    // 500 distinct per group is inside the lgK=14 exact regime
    // (probed: lgK=12 unions go approximate at ~500, lgK=14 holds past 1000)
    assert(inc.values.forall(_ == 500.0), inc.toString)
    // the store holds one sketch row per (group, batch)
    assert(spark.table(t1.qualifiedName).count() == 8)
  }

  test("overlapping batches do not double-count (sketch union is a set union)") {
    val t = Table("graft_test_hll_c")
    val a = (0 until 300).map(i => (i.toLong, "g")).toDF("id", "grp")
    val b = (150 until 450).map(i => (i.toLong, "g")).toDF("id", "grp")
    Sketches.buildDistinctStore(spark, a, "grp", "id", t, lgK = 14)
    Sketches.appendDistinctStore(spark, b, "grp", "id", t, lgK = 14)
    val est = Sketches.estimateDistinct(spark, t).as[(String, Double)].collect().head._2
    assert(est == 450.0, s"est $est")
  }

  test("append at a different lgK than the store is a hard error, not a downgrade") {
    val t = Table("graft_test_hll_lgk")
    val a = (0 until 100).map(i => (i.toLong, "g")).toDF("id", "grp")
    Sketches.buildDistinctStore(spark, a, "grp", "id", t, lgK = 14)
    val e = intercept[IllegalArgumentException] {
      Sketches.appendDistinctStore(spark, a, "grp", "id", t, lgK = 12)
    }
    assert(e.getMessage.contains("lgK=14"))
  }

  test("Profile.drift flags only the metrics that moved beyond threshold") {
    val v1 = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val v2 = (1 to 900).map(i => (i.toLong, i.toDouble)).toDF("id", "v") // -10% rows
    val out = Profile.drift(v1, v2, Seq("v"), maxRelChange = 0.05)
      .as[(String, String, Double, Double, Double, Boolean)].collect()
      .map(r => r._2 -> r).toMap
    assert(!out("row_cnt")._6 && out("row_cnt")._5 == 0.1)
    assert(!out("distinct_cnt")._6)
    assert(out("null_frac")._6) // 0 -> 0
    assert(!out("mean")._6)     // mean moved ~-5.3%
  }
}
