package graft

import graft.similarity.Bitext
import org.apache.spark.sql.functions._

class BitextSpec extends SparkSpec {
  import spark.implicits._

  test("each source mines its planted translation; margins exceed the noise floor") {
    val rnd = new scala.util.Random(19)
    def oneHot(i: Int) = Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    def noisy(v: Array[Float]) = v.map(x => x + rnd.nextFloat() * 0.02f)
    val xs = (0 to 5).map(i => (i.toLong, oneHot(i))).toDF("id", "v")
    val ys = (0 to 5).map(i => (100L + i, noisy(oneHot(i)))).toDF("id", "v")
    val mined = Bitext.minePairs(xs, ys, xs, "id", "v", "id", "v", k = 3)
      .select("x_id", "y_id", "margin").as[(Long, Long, Double)].collect()
    mined.foreach { case (x, y, m) =>
      assert(y == 100L + x, s"x=$x mined y=$y instead of its translation")
      // a true pair's cosine (~1) dwarfs its orthogonal-neighborhood
      // normalizers, so the ratio margin clears 1 with room
      assert(m > 1.2, s"x=$x margin $m")
    }
    assert(mined.length == 6)
  }

  test("margin matches the hand-computed Artetxe-Schwenk ratio on a fixed fixture") {
    // x1=(1,0,0,0); candidates y_a, y_b both at cosine 0.95 to x1; second
    // x-corpus row x2 lies exactly on y_b's direction
    val x1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val x2 = Array(0.95f, 0.0f, 0.3122499f, 0.0f)
    val ya = Array(0.95f, 0.3122499f, 0.0f, 0.0f)
    val yb = Array(0.95f, 0.0f, 0.3122499f, 0.0f)
    val xq = Seq((1L, x1)).toDF("id", "v")
    val xc = Seq((1L, x1), (2L, x2)).toDF("id", "v")
    val yc = Seq((10L, ya), (11L, yb)).toDF("id", "v")
    val got = Bitext.marginScores(xq, yc, xc, "id", "v", "id", "v", k = 2)
      .select("y_id", "cosine", "margin").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d  = a.zip(b).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val na = math.sqrt(a.map(p => p.toDouble * p.toDouble).sum)
      val nb = math.sqrt(b.map(p => p.toDouble * p.toDouble).sum)
      d / (na * nb)
    }
    val degX  = (cos(x1, ya) + cos(x1, yb)) / 4.0 // x1's two candidates (tie broken, both seen)
    val degYa = (cos(ya, x1) + cos(ya, x2)) / 4.0
    val degYb = (cos(yb, x2) + cos(yb, x1)) / 4.0 // x2 IS y_b's direction: cos 1
    assert(math.abs(got(10L)._3 - cos(x1, ya) / (degX + degYa)) < 1e-9)
    assert(math.abs(got(11L)._3 - cos(x1, yb) / (degX + degYb)) < 1e-9)
    // equal raw cosine, denser target neighborhood → LOWER margin: the hub
    // demotion that raw cosine mining cannot express
    assert(math.abs(got(10L)._2 - got(11L)._2) < 1e-6)
    assert(got(10L)._3 > got(11L)._3)
  }

  test("mining is deterministic across reruns and repartitioning") {
    val rnd = new scala.util.Random(23)
    val xs = (1 to 30).map(i => (i.toLong,
      Array.fill(8)(rnd.nextFloat()))).toDF("id", "v")
    val ys = (101 to 140).map(i => (i.toLong,
      Array.fill(8)(rnd.nextFloat()))).toDF("id", "v")
    val a = Bitext.minePairs(xs, ys, xs, "id", "v", "id", "v", k = 4)
      .orderBy("x_id").as[(Long, Long, Double, Double)].collect().toSeq
    val b = Bitext.minePairs(xs.repartition(7), ys.repartition(3), xs,
        "id", "v", "id", "v", k = 4)
      .orderBy("x_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
