package graft
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: loop q29 with a stage-metrics listener to find where the
  * sporadic stall spends its time (run vs deserialize vs GC vs scheduling).
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir   = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var slowLog = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        if (wall > 2000) {
          val tm = si.taskMetrics
          slowLog ::= f"stage ${si.stageId}%4d '${si.name.take(40)}' tasks=${si.numTasks} " +
            f"wall=${wall / 1e3}%.1fs run=${tm.executorRunTime / 1e3}%.1fs " +
            f"deser=${tm.executorDeserializeTime / 1e3}%.1fs gc=${tm.jvmGCTime / 1e3}%.1fs " +
            f"resultSer=${tm.resultSerializationTime / 1e3}%.1fs cpu=${tm.executorCpuTime / 1e9}%.1fs"
        }
      }
    })

    val qs = SparkEntry.queries
    (1 to 8).foreach { round =>
      slowLog = Nil
      val t0 = System.nanoTime()
      val rows = qs("q29_dedup_transitive")(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[profile] round $round q29 rows=$rows in $secs%.1fs")
      if (secs > 15) slowLog.reverse.foreach(l => println(s"[profile]   $l"))
    }
    spark.stop()
  }
}
