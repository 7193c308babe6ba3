package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Table
import graft.similarity.Ann

/** Dev tool (round 16 plan evidence): dumps the ROUND-15 shape of the
  * q183 at-rest steady state — `Ann.queryIvfIndex` with INLINE query
  * assignment (centroid collect + per-row two-level cellAssign + explode)
  * over the same persisted index tables the round-16 slot reads. The
  * round-16 slot replaced this with a pre-assigned, co-bucketed query
  * table ([[Ann.assignToIndex]] at ingest + [[Ann.queryIvfIndexAssigned]]
  * steady state); `plans/r16/q183_sq8_ivf_atrest_{before,after}.txt` is
  * the diff. Run AFTER a bench/RunOne has built the index for the SF:
  *   runMain graft.PlanDumpR16 [sfDir]
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val e   = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Table(s"graft_q183_atrest_idx_$tag")
    val cen = Table(s"graft_q183_atrest_cen_$tag")
    val fit = Table(s"graft_q183_atrest_fit_$tag")
    val queries = e.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    // catalog entries are session-scoped: (re)build the index exactly as the
    // q183_sq8_ivf_atrest slot's ingest block does, so the explained steady
    // state reads the identical layout
    if (!Seq(idx, cen, fit).forall(t => spark.catalog.tableExists(t.qualifiedName))) {
      val c = math.max(8L, e.count() / 256L).toInt
      Ann.buildIvfIndex(spark, e, "vec_id", "embedding", idx, cen,
        numCentroids = c, numBuckets = 32, codec = "sq8", fitTable = Some(fit))
    }
    val df = Ann.queryIvfIndex(spark, idx, cen, queries, "qid", "embedding",
        k = 10, nprobe = 2, candidateJoin = "shuffle", fitTable = Some(fit))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
    println("=== R15-SHAPE PLAN START ===")
    df.explain("formatted")
    println("=== R15-SHAPE PLAN END ===")
    val t0 = System.nanoTime()
    val n  = df.count()
    println(f"[plandump] rows=$n steady-state ${(System.nanoTime() - t0) / 1e9}%.2fs (r15 inline-assign shape)")
    spark.stop()
  }
}
