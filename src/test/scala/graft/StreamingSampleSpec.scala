package graft

import graft.model.Table
import graft.ops.Sampling
import graft.streaming.StreamingSample
import org.apache.spark.sql.types._

class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, ((i * 37) % 1000 + 1).toLong)).toDF("id", "w")

  test("reservoir over any batch split equals the one-pass batch A-ES sample") {
    val full  = corpus(500)
    val batch = Sampling.weightedSample(full, "id", "w", 50)
      .as[(Long, Long)].collect().toSet
    // three different splits, including a skewed one — merge-closure means
    // batch boundaries can't matter
    val splits = Seq(
      Seq(full.where($"id" % 3 === 0), full.where($"id" % 3 === 1), full.where($"id" % 3 === 2)),
      Seq(full.where($"id" <= 10), full.where($"id" > 10)),
      Seq(full.where($"id" % 2 === 0), full.where($"id" % 2 =!= 0)))
    splits.zipWithIndex.foreach { case (waves, i) =>
      val res = Table(s"graft_ssamp_mc_$i")
      waves.foreach(w => StreamingSample.mergeBatch(spark, w, "id", "w", 50, res))
      val got = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
      assert(got == batch, s"split $i diverged from the batch sample")
    }
  }

  test("replaying a micro-batch is a no-op (deterministic ranks + key dedup)") {
    val full = corpus(200)
    val res  = Table("graft_ssamp_replay")
    val wave = full.where($"id" <= 150)
    StreamingSample.mergeBatch(spark, wave, "id", "w", 30, res)
    val before = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
    StreamingSample.mergeBatch(spark, wave, "id", "w", 30, res) // replay
    val after = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
    assert(after == before)
    assert(after.size == 30)
  }

  test("under-full corpus: reservoir holds every eligible row, excludes w<=0/null") {
    val rows = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 10L))
      .toDF("id", "w").withColumn("w", org.apache.spark.sql.functions
        .when($"id" === 1L, null).otherwise($"w").cast("long"))
    // id=1 null weight, id=2 zero, id=3 negative → only id=4 eligible
    val res = Table("graft_ssamp_small")
    StreamingSample.mergeBatch(spark, rows, "id", "w", 100, res)
    assert(spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
      == Set((4L, 10L)))
  }

  test("end-to-end file stream: two triggers, final reservoir = batch sample") {
    val dir = tmpDir()
    val src = s"$dir/src"
    new java.io.File(src).mkdirs()
    val full = corpus(300)
    full.where($"id" % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    full.where($"id" % 2 =!= 0).coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(StructField("id", LongType), StructField("w", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val res = Table("graft_ssamp_e2e")
    StreamingSample.weightedReservoirSink(
      spark, stream, "id", "w", 40, res, s"$dir/ckpt")
    val got = spark.table(res.qualifiedName).as[(Long, Long)].collect().toSet
    val want = Sampling.weightedSample(full, "id", "w", 40)
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
