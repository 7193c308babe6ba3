package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def imgs = Seq(
    (1L, "abcdefghij" * 10),   // 100 bytes
    (2L, "x"),                 // 1 byte
    (3L, ""),                  // empty payload
  ).toDF("id", "payload").select(col("id"), encode(col("payload"), "UTF-8").as("bytes"))

  test("decodeImageMeta appends a typed struct; schema + values deterministic") {
    val out = Multimodal.decodeImageMeta(imgs, "bytes")
    assert(out.schema("meta").dataType == Multimodal.imageMetaSchema)
    val r = out.select(col("id"), col("meta.width"), col("meta.height"), col("meta.channels"), col("meta.format"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 101, (100 * 31 % 761) + 1, 3, "fake")))
    assert(r(2) == ((3L, 1, 1, 3, "fake"))) // empty payload → 1×1
  }

  test("extractFeatures: fixed dim, unit norm, deterministic per payload") {
    val out  = Multimodal.extractFeatures(imgs, "bytes", dim = 8, batchSize = 2)
    val rows = out.select(col("id"), col("features")).as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.forall(_._2.length == 8))
    rows.foreach { case (_, f) =>
      val norm = math.sqrt(f.map(v => v.toDouble * v).sum)
      assert(math.abs(norm - 1.0) < 1e-4)
    }
    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(imgs, "bytes", dim = 8).select(col("id"), col("features"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.map(_._2.toList).toSeq == again.map(_._2.toList).toSeq)
  }

  test("resizeImage emits exactly targetBytes; sampleFrames emits `frames` slices") {
    val resized = Multimodal.resizeImage(imgs, "bytes", "small", targetBytes = 16)
    assert(resized.schema("small").dataType == BinaryType)
    val sizes = resized.select(octet_length(col("small"))).as[Int].collect()
    assert(sizes.toSet == Set(16))
    val framed = Multimodal.sampleFrames(imgs.filter(col("id") === 1), "bytes", frames = 4)
    val fr     = framed.select(col("frames")).as[Seq[Array[Byte]]].collect().head
    assert(fr.length == 4)
    assert(fr.map(_.length).sum == 100) // slices cover the payload
  }

  test("repartitionForPayload sizes partitions by payload bytes") {
    val big = (0 until 64).map(i => (i.toLong, Array.fill(1024)(i.toByte))).toDF("id", "bytes")
    val out = Multimodal.repartitionForPayload(big, "bytes", targetPartitionBytes = 8 * 1024)
    assert(out.rdd.getNumPartitions == 8) // 64 KiB / 8 KiB
  }

  test("metadata-only projection prunes the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    imgs.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select(col("id")).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("bytes"), plan)
  }
}
