package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (Spark startup dominates test
  * wall-clock otherwise).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
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
