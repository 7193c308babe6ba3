package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Dev-only (round 16): dump the EXECUTED plans of the connected-components
  * loop (its rounds materialize inside the operator, so no caller-level
  * explain can show them) plus the final plan of a named query, via a
  * QueryExecutionListener. Usage:
  *   runMain graft.PlanDumpCCR16 [sfDir] [alsoExplain...]
  */
object PlanDumpCCR16 {
  def main(args: Array[String]): Unit = {
    val dir   = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var n = 0
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        n += 1
        println(s"\n===== CC job $n ($funcName) =====")
        println(qe.explainString(org.apache.spark.sql.execution.ExtendedMode).take(8000))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 === 0)
    val b = d.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" chain link one two three")).as("text"))
    val corpus = d.unionByName(b)
    val pairs = graft.dedup.Dedup.nearDupPairsMinHash(corpus, "doc_id", "text",
      threshold = 0.5, bands = 32)
    graft.dedup.Dedup.connectedComponents(pairs).count()
    Thread.sleep(3000)
    spark.stop()
    sys.exit(0)
  }
}
