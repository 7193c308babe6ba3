package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join output on a skewed key") {
    // 10k rows of one hot key + a long tail
    val big = ((0 until 10000).map(i => ("hot", i.toLong)) ++ (0 until 100).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 100).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("k", "name")
    val plain  = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // left join keeps unmatched big-side rows exactly once
    val bigExtra = big.union(Seq(("nomatch", 1L)).toDF("k", "v"))
    val lj = Skew.saltedJoin(bigExtra, small, Seq("k"), salts = 8, joinType = "left")
    assert(lj.filter(col("k") === "nomatch").count() == 1)
  }

  test("saltedAgg two-phase merge equals direct aggregation") {
    val df = ((0 until 5000).map(i => ("hot", i % 7)) ++ Seq(("cold", 42))).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8)(
      _.agg(sum("v").as("ps"), count(lit(1)).as("pn")),
      _.agg(sum("ps").as("s"), sum("pn").as("n")),
    )
    val d = direct.as[(String, Long, Long)].collect().toSet
    val s = salted.as[(String, Long, Long)].collect().toSet
    assert(d == s)
  }
}
