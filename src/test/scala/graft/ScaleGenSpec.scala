package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of ScaleGen's replica-transform families — these are what
  * make an sfN probe evidence about SCALE rather than about a different
  * corpus (SCALE.md "sf1 scale probe"): per-replica maps must be bijective
  * (intra-replica similarity structure exactly isomorphic) and pairwise
  * collision-free (cross-replica overlap stays noise at any replica count).
  */
class ScaleGenSpec extends AnyFunSuite {

  test("letterMap is the identity for replica 0") {
    val (from, to) = ScaleGen.letterMap(0)
    assert(from === to)
  }

  test("letterMap is a bijection on a-zA-Z with case structure preserved") {
    for (r <- Seq(1, 7, 26, 27, 52, 99)) {
      val (from, to) = ScaleGen.letterMap(r)
      assert(from.length === 52 && to.length === 52)
      assert(to.toSeq.sorted === from.toSeq.sorted, s"replica $r not a bijection")
      // lower half maps to lower, upper half to upper, same permutation
      val (lo, hi) = (to.substring(0, 26), to.substring(26))
      assert(lo.forall(_.isLower) && hi.forall(_.isUpper))
      assert(hi.map(_.toLower) === lo)
    }
  }

  test("letterMap family has no verbatim twins at distances that break a Caesar design") {
    // a rotation design collides at distance 26; the permutation family must not
    val maps = (0 to 120).map(r => ScaleGen.letterMap(r)._2)
    assert(maps.distinct.size === maps.size)
    // and two distinct replicas agree on only ~1 of 26 letters on average
    val agree = for (a <- 1 to 50; b <- (a + 1) to 51) yield
      maps(a).zip(maps(b)).count { case (x, y) => x == y } / 2 // both cases counted
    assert(agree.sum.toDouble / agree.size < 3.0)
  }

  test("letterMap is deterministic across calls (reproducible corpora)") {
    assert(ScaleGen.letterMap(42) === ScaleGen.letterMap(42))
  }

  test("signVector: ±1 entries, deterministic, pairwise distinct") {
    val vs = (1 to 100).map(r => ScaleGen.signVector(r, 64).toSeq)
    assert(vs.forall(_.forall(s => s == 1.0f || s == -1.0f)))
    assert(vs.distinct.size === vs.size)
    assert(ScaleGen.signVector(5, 64).toSeq === ScaleGen.signVector(5, 64).toSeq)
  }
}
