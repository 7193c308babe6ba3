package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (builder's brief: "skewed keys → salting or
  * AQE skew-join").
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default since Spark 3.2): it splits oversized shuffle partitions of
  * sort-merge joins at runtime. Salting is for the cases AQE cannot see or
  * split — a hot key inside one shuffle partition of a streaming stateful
  * op, a broadcast-ineligible join under a non-AQE session, or a groupBy
  * whose single hot key must spread across reducers before a non-algebraic
  * aggregate.
  */
object Skew {

  /** Skew-safe equi-join: salt the big side's key with `salts` buckets and
    * replicate the small side once per bucket, so one hot key's rows spread
    * over `salts` reducers instead of one. Costs `salts`× the small side's
    * shuffle volume — use for moderate-size right sides that are too big to
    * broadcast but small enough to replicate.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner",
  ): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val bigS   = big.withColumn("__graft_salt", (rand(42) * salts).cast("int"))
    val smallS = small.withColumn("__graft_salt", explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }

  /** Two-phase salted aggregation for a non-algebraic-looking agg that IS
    * mergeable (e.g. collect_set under a size cap, approx sketches): phase 1
    * groups by (keys, salt) with `partial`, phase 2 merges by keys with
    * `merge`. For plain algebraic aggs (sum/count/min/max/avg) Spark's
    * map-side partial aggregation already does this — don't salt those.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
  )(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
  ): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salted  = df.withColumn("__graft_salt", (rand(42) * salts).cast("int"))
    val phase1  = partial(salted.groupBy((keys :+ "__graft_salt").map(col): _*))
    merge(phase1.groupBy(keys.map(col): _*))
  }

  /** Key-skew report: the top-N heaviest keys with their row share — the
    * measurement read BEFORE reaching for [[saltedJoin]]/[[saltedAgg]]
    * (salting an unskewed key only adds shuffle volume; the report says
    * whether and how hard to salt). One count aggregate + a distributed
    * top-N (`TakeOrdered`); `total` is one count job. Output:
    * `(key, n, share)` ranked by n DESC with a key tie-break.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val total = df.count()
    df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
      .select(col("key"), col("n"),
        round(col("n").cast("double") / math.max(1L, total), 6).as("share"))
  }
}
