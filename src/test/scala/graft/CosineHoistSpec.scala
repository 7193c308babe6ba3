package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Round 17: the ANN pair loops hoist the two cosine self-dots to per-row
  * norm columns ([[Ann.cosineWithNorms]]), and `HashImpl.cosineF` fuses its
  * three dot walks into one pass. Both claims are "bit-identical by
  * construction"; these tests pin them mechanically — raw double equality
  * (null-safe, NaN-safe via <=>) between the hoisted form and the original
  * expression across random, zero-norm, ragged, and null vectors.
  */
class CosineHoistSpec extends graft.SparkSpec {
  import spark.implicits._

  test("cosineWithNorms(q, n, |q|, |n|) <=> cosine(q, n) on adversarial vectors") {
    val rnd = new scala.util.Random(29)
    def vec(n: Int) = (0 until n).map(_ => (rnd.nextFloat() * 4 - 2)).toArray
    val rows: Seq[(Array[Float], Array[Float])] =
      (0 until 300).map { i =>
        i % 6 match {
          case 0 => (vec(64), vec(64))                        // plain
          case 1 => (Array.fill(64)(0.0f), vec(64))           // zero left norm
          case 2 => (vec(64), Array.fill(64)(0.0f))           // zero right norm
          case 3 => (vec(17), vec(64))                        // ragged
          case 4 => (null, vec(64))                           // null left
          case _ => (vec(64), null)                           // null right
        }
      } :+ ((Array.fill(8)(0.0f), Array.fill(8)(0.0f)))       // both zero
    val df = rows.toDF("q", "n")
      .withColumn("orig", VectorFunctions.cosine(col("q"), col("n")))
      .withColumn("hoisted", Ann.cosineWithNorms(col("q"), col("n"),
        Ann.normOfVec(col("q")), Ann.normOfVec(col("n"))))
    val bad = df.where(!(col("orig") <=> col("hoisted"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("knnJoin / bruteForceTopK results unchanged by the hoist (oracle shape)") {
    val rnd = new scala.util.Random(31)
    val e = (0 until 200).map { i =>
      (i.toLong, (0 until 16).map(_ => rnd.nextFloat()).toArray)
    }.toDF("vec_id", "embedding")
    val knn = Ann.knnJoin(e, e, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, numCentroids = 4, nprobe = 4, excludeSelf = true)
    val brute = Ann.bruteForceTopK(e, e.select(col("vec_id").as("qid"), col("embedding")),
      "vec_id", "embedding", "qid", "embedding", k = 4)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").desc)))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("int"), col("neighbor_id"), col("cosine"))
    assert(knn.exceptAll(brute).isEmpty && brute.exceptAll(knn).isEmpty,
      "knnJoin at the exact dial must equal brute force after the hoist")
  }
}
