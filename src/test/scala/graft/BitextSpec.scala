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

  test("margin demotes the hub raw cosine would mine (the paper's core property)") {
    // two orthogonal sources; each has a true translation at cosine 0.65,
    // and a HUB sits at cosine ~0.707 to BOTH sources — raw-cosine argmax
    // picks the hub for every source, margin must not: the hub's own
    // neighborhood is dense (close to both x's), so its normalizer is
    // nearly double a true translation's
    val x0  = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val x1  = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val y0  = Array(0.65f, 0.0f, 0.7599342f, 0.0f)
    val y1  = Array(0.0f, 0.65f, 0.0f, 0.7599342f)
    val hub = Array(0.70710677f, 0.70710677f, 0.0f, 0.0f)
    val xs  = Seq(1L -> x0, 2L -> x1).toDF("id", "v")
    val ys  = Seq(10L -> y0, 11L -> y1, 12L -> hub).toDF("id", "v")
    // raw cosine prefers the hub for both sources…
    val rawPick = similarity.Ann.bruteForceTopK(ys, xs, "id", "v", "id", "v", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(rawPick == Map(1L -> 12L, 2L -> 12L), s"fixture broken: raw picks $rawPick")
    // …margin mines the true translations
    val mined = Bitext.minePairs(xs, ys, xs, "id", "v", "id", "v", k = 2)
      .select("x_id", "y_id").as[(Long, Long)].collect().toMap
    assert(mined == Map(1L -> 10L, 2L -> 11L), s"margin picked $mined")
  }

  test("bidirectional strategies: intersection ⊆ direction ⊆ union; threshold prunes") {
    val x0  = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val x1  = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val y0  = Array(0.65f, 0.0f, 0.7599342f, 0.0f)
    val y1  = Array(0.0f, 0.65f, 0.0f, 0.7599342f)
    val hub = Array(0.70710677f, 0.70710677f, 0.0f, 0.0f)
    val xs  = Seq(1L -> x0, 2L -> x1).toDF("id", "v")
    val ys  = Seq(10L -> y0, 11L -> y1, 12L -> hub).toDF("id", "v")
    def pairs(strategy: String, thr: Double = 0.0): Set[(Long, Long)] =
      Bitext.minePairsBidirectional(xs, ys, "id", "v", "id", "v", k = 2,
          strategy = strategy, marginThreshold = thr)
        .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    val fwd = pairs("forward"); val bwd = pairs("backward")
    val inter = pairs("intersection"); val uni = pairs("union")
    assert(fwd == Set(1L -> 10L, 2L -> 11L))
    // backward mines per-Y: the true pairs, plus the hub paired to some x
    assert(Set(1L -> 10L, 2L -> 11L).subsetOf(bwd) && bwd.size == 3)
    assert(inter == fwd.intersect(bwd) && uni == fwd.union(bwd))
    assert(inter.subsetOf(fwd) && fwd.subsetOf(uni) && bwd.subsetOf(uni))
    // the hub pair's margin (~1.02) falls below a 1.2 acceptance cut;
    // the true pairs (~1.3) survive — union + threshold = clean pairs
    assert(pairs("union", thr = 1.2) == Set(1L -> 10L, 2L -> 11L))
    intercept[IllegalArgumentException] { pairs("both") }
  }

  test("IVF bidirectional mining at full probe equals the exact form") {
    val rnd = new scala.util.Random(31)
    val xs = (1 to 24).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat()))).toDF("id", "v")
    val ys = (101 to 132).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat()))).toDF("id", "v")
    for (strategy <- Seq("forward", "intersection", "union")) {
      val exact = Bitext.minePairsBidirectional(xs, ys, "id", "v", "id", "v",
          k = 3, strategy = strategy, marginThreshold = 1.0)
        .orderBy("x_id", "y_id").as[(Long, Long, Double, Double)].collect().toSeq
      val ivf = Bitext.minePairsIvfBidirectional(xs, ys, "id", "v", "id", "v",
          k = 3, numCentroids = 4, nprobe = 4, strategy = strategy, marginThreshold = 1.0)
        .orderBy("x_id", "y_id").as[(Long, Long, Double, Double)].collect().toSeq
      assert(exact.nonEmpty, s"fixture produced no $strategy pairs at threshold 1.0")
      assert(exact == ivf, s"full-probe IVF diverged from exact for $strategy")
    }
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
