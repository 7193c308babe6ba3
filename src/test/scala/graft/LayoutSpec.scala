package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order clustering: Morton math, quantile bucketing under skew, and the
  * quantitative file-locality property the layout exists for.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Int, b: Int, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1).toLong << (2 * i + 1)
      z |= ((b >> i) & 1).toLong << (2 * i)
    }
    z
  }

  test("zValue matches the reference Morton interleave") {
    val df = Seq((0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 12))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.zValue(Seq(col("a"), col("b")), bits = 8).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 8), s"($a,$b)") }
  }

  test("uniformBucket spans [0, 2^bits) and clamps out-of-range values") {
    val df = Seq(-5.0, 0.0, 49.9, 99.9, 150.0).toDF("v")
    val got = df.select(Layout.uniformBucket(col("v"), 0.0, 100.0, 8)).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 127, 255, 255))
    // a value FAR above max (a key offset by fixture replication) must
    // clamp, not CAST_OVERFLOW: the clamp runs in double space before the
    // int cast (found by the round-11 sf10 sweep, q157)
    val far = Seq(2.0e10, -3.0e18).toDF("v")
      .select(Layout.uniformBucket(col("v"), 0.0, 100.0, 8)).as[Int].collect().toSeq
    assert(far == Seq(255, 0))
  }

  test("quantileBuckets equi-populates buckets under heavy skew") {
    val skewed = (0 until 4000).map(i => math.pow(i.toDouble / 40.0, 3)).toDF("v")
    val bucketed = skewed.select(Layout.quantileBuckets(skewed, "v", bits = 4).as("bk"))
    val counts = bucketed.groupBy("bk").count().as[(Int, Long)].collect().toMap
    assert(counts.keys.min >= 0 && counts.keys.max <= 15)
    // every bucket within 3x of the ideal 250
    assert(counts.values.forall(c => c > 80 && c < 750), counts.toString)
  }

  test("z-order files are narrow on BOTH dimensions; single-column sort is not") {
    // two independent uniform dims
    val rnd = new scala.util.Random(17)
    val df = (0 until 8000).map(_ => (rnd.nextInt(256), rnd.nextInt(256))).toDF("x", "y")

    def avgWidthPerFile(data: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val path = s"${tmpDir()}/layout"
      data.write.parquet(path)
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(dim)) - min(col(dim))).as("w"))
        .select(avg(col("w"))).as[Double].collect().head
      perFile
    }

    val z = Layout.zValue(Seq(
      Layout.uniformBucket(col("x"), 0, 256, 8),
      Layout.uniformBucket(col("y"), 0, 256, 8)), bits = 8)
    val zClustered = Layout.clusterByZ(df, z, numFiles = 16)
    val bySortX = df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))

    val zWidthX = avgWidthPerFile(zClustered, "x")
    val zWidthY = avgWidthPerFile(zClustered, "y")
    val sWidthX = avgWidthPerFile(bySortX, "x")
    val sWidthY = avgWidthPerFile(bySortX, "y")

    // sort-by-x: x razor-thin, y spans ~everything; z-order: BOTH narrow
    assert(sWidthX < 40, s"sort x width $sWidthX")
    assert(sWidthY > 200, s"sort y width $sWidthY")
    assert(zWidthX < 128 && zWidthY < 128, s"z widths $zWidthX / $zWidthY")
    assert(zWidthY < sWidthY / 2, s"z must beat single-sort on the other dim: $zWidthY vs $sWidthY")
  }

  test("2-D range filter reads a fraction of the z-clustered files (scan-metric pruning)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    // rows the parquet scan MATERIALIZED — after row-group min/max skipping,
    // before the residual Filter; each small file is one row group, so this
    // is the files-read evidence the layout exists for
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "no FileSourceScanExec in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val rnd = new scala.util.Random(29)
    val df = (0 until 8000).map(_ => (rnd.nextInt(256), rnd.nextInt(256), rnd.nextLong()))
      .toDF("x", "y", "payload")
    val z = Layout.zValue(Seq(
      Layout.uniformBucket(col("x"), 0, 256, 8),
      Layout.uniformBucket(col("y"), 0, 256, 8)), bits = 8)

    val zPath = s"${tmpDir()}/zclustered"
    val uPath = s"${tmpDir()}/unclustered"
    Layout.clusterByZ(df, z, numFiles = 16).write.parquet(zPath)
    df.repartition(16).write.parquet(uPath) // same file count, random layout

    def filtered(path: String) = spark.read.parquet(path)
      .where(col("x") < 64 && col("y") < 64) // top-left 1/16 quadrant
    // both layouts return the same answer...
    assert(filtered(zPath).count() == filtered(uPath).count())
    val zRows = scannedRows(filtered(zPath))
    val uRows = scannedRows(filtered(uPath))
    // ...but the random layout materializes every row group (all rows),
    // while z-order prunes to the row groups covering the quadrant
    assert(uRows == 8000L, s"unclustered scan read $uRows")
    assert(zRows <= uRows / 3, s"z-clustered scan read $zRows of $uRows — no pruning?")
  }
}
