package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (Spark startup dominates test
  * wall-clock otherwise).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    // local[threads, maxTaskFailures]: retries ON (plain local[4] pins
    // maxFailures to 1) so FailureInjectionSpec can prove a mid-write task
    // failure retries and converges — the cluster default behavior.
    val s = SparkSession.builder()
      .master("local[4, 3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"/root/repo/target/test-warehouse-${java.util.UUID.randomUUID().toString.take(8)}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def tmpDir(): String = {
    val d = s"/root/repo/target/test-tmp/${java.util.UUID.randomUUID().toString.take(12)}"
    new java.io.File(d).mkdirs()
    d
  }
}
