package graft

import graft.model.Table
import graft.ops.TableIO
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    TableIO.overwriteBucketed(spark, left, Table("graft_bkt_left"), Seq("k"), 8, Seq("k"))
    TableIO.overwriteBucketed(spark, right, Table("graft_bkt_right"), Seq("k"), 8, Seq("k"))
    val joined = spark.table("graft_bkt_left")
      .join(spark.table("graft_bkt_right"), Seq("k"))
      .where(col("k") >= 0) // keep it a sort-merge join shape
    val plan = joined.queryExecution.executedPlan.toString
    // disable broadcast to force the join to show its shuffle behavior
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j2 = spark.table("graft_bkt_left").join(spark.table("graft_bkt_right"), Seq("k"))
      val p2 = j2.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange hashpartitioning"), p2)
      assert(j2.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // rerun is idempotent (prepareCreate path)
    TableIO.overwriteBucketed(spark, left, Table("graft_bkt_left"), Seq("k"), 8)
    assert(spark.table("graft_bkt_left").count() == 1000)
  }

  test("partitioned table: filters on the partition column prune the scan") {
    import graft.model.{File => GFile, IfExists}
    import graft.ops.{LoadFile, LoadOptions}
    val dir = tmpDir()
    (0 until 300).map(i => (i.toLong, s"type${i % 3}", i * 1.0)).toDF("id", "etype", "v")
      .write.mode("overwrite").parquet(dir)
    LoadFile.toTable(spark, GFile(dir), Table("graft_part_events"),
      LoadOptions(ifExists = IfExists.Replace, partitionBy = Seq("etype")))
    val q    = spark.table("graft_part_events").where(col("etype") === "type1")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("etype"), scan)
    assert(q.count() == 100)
    assert(q.select(countDistinct("id")).as[Long].collect().head == 100)
    // partition layout on disk: one dir per etype value
    val loc = TableIO.managedLocation(spark, Table("graft_part_events"))
    val dirs = new java.io.File(loc.toUri.getPath).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("etype=type0", "etype=type1", "etype=type2"), dirs.toSeq)
  }

  test("bucketed aggregation on the bucket key skips the exchange") {
    val df = (0 until 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    TableIO.overwriteBucketed(spark, df, Table("graft_bkt_agg"), Seq("k"), 4)
    val agg  = spark.table("graft_bkt_agg").groupBy("k").agg(sum("v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(agg.count() == 50)
  }

  test("window dedup over a fingerprint-bucketed table runs with zero exchange") {
    // the q50 dedup-at-rest shape: bucket layout provides the hash
    // distribution the window needs
    val df = (0 until 300).map(i => (i.toLong, s"doc body ${i % 60}")).toDF("id", "text")
      .withColumn("fp", md5(col("text")))
    TableIO.overwriteBucketed(spark, df, Table("graft_bkt_dedup"), Seq("fp"), 4, Seq("fp", "id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("id"))
    val dedup = spark.table("graft_bkt_dedup")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    val plan = dedup.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(dedup.count() == 60)
  }
}
