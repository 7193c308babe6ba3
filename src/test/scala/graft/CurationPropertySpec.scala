package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Property tests pinning the distributed curation operators to naive
  * in-memory reference implementations on randomized corpora — the same
  * spot-the-divergence harness Round5Spec uses for the native text
  * expressions.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 15): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(r.passed, r.status.toString)
  }

  // ---------- boilerplate removal vs naive ----------

  private val lineGen: Gen[String] =
    Gen.oneOf(Gen.oneOf("SUBSCRIBE", "COOKIES", "FOOTER"), // plantable boilerplate
      Gen.choose(0, 10000).map(n => s"unique line $n"),
      Gen.const("")) // blank lines must never strip
  private val docGen: Gen[String]  = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))
  private val corpusGen: Gen[List[String]] = Gen.chooseNum(2, 20).flatMap(n => Gen.listOfN(n, docGen))

  private def naiveStrip(docs: Seq[(Long, String)], maxDocFrac: Double, minDocs: Long): Map[Long, String] = {
    val cutoff = math.max(minDocs, math.ceil(maxDocFrac * docs.size).toLong)
    val docFreq = docs.flatMap { case (id, t) => t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val frequent = docFreq.filter(_._2 >= cutoff).keySet
    docs.map { case (id, t) => id -> t.split("\n", -1).filterNot(frequent).mkString("\n") }.toMap
  }

  test("stripBoilerplateLines equals the naive reference on random corpora") {
    check(forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.stripBoilerplateLines(docs.toDF("doc_id", "text"), "doc_id", "text",
          maxDocFrac = 0.3, minDocs = 2)
        .select(col("doc_id"), col("__clean")).as[(Long, String)].collect().toMap
      val want = naiveStrip(docs, maxDocFrac = 0.3, minDocs = 2)
      got == want
    })
  }

  // ---------- keep-best transitive dedup vs naive union-find ----------

  /** Word corpus with planted duplicate chains so the near-dup graph is
    * non-trivial: base docs plus suffix-mutated copies.
    */
  private val keepBestCorpusGen: Gen[List[(Long, String)]] = for {
    nBase <- Gen.chooseNum(2, 6)
    bases <- Gen.listOfN(nBase, Gen.chooseNum(0, 3).map { v =>
      s"alpha bravo charlie delta echo foxtrot golf hotel variant$v word$v"
    })
    dupped = bases.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), (100L + i, t + " extra tail"), (200L + i, t + " extra tail more"))
    }
  } yield dupped

  private def naiveShingles(t: String, k: Int = 3): Set[String] = {
    val toks = t.trim.toLowerCase.split("\\s+").toSeq
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  private def naiveKeepBest(docs: Seq[(Long, String)], threshold: Double): Set[Long] = {
    val ids = docs.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = naiveShingles(ta); sb = naiveShingles(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= threshold
    } parent(find(a)) = find(b)
    docs.groupBy { case (id, _) => find(id) }.values.map { grp =>
      grp.maxBy { case (id, t) => (t.length, -id) }._1 // longest text, min-id tie-break
    }.toSet
  }

  test("dedupNearKeepBest equals naive union-find + argmax on planted duplicate chains") {
    check(forAll(keepBestCorpusGen) { docs =>
      val got = Dedup.dedupNearKeepBest(docs.toDF("doc_id", "text"), "doc_id", "text",
          orderBy = Seq(length(col("text")).desc),
          threshold = 0.5, bands = Dedup.recallExactBands(0.5))
        .select("doc_id").as[Long].collect().toSet
      got == naiveKeepBest(docs, 0.5)
    }, minTests = 10)
  }

  // ---------- term stats vs naive counts ----------

  private val termDocGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("apple", "banana", "cherry", "date", "Apple", "  "))).map(_.mkString(" "))

  test("termStats equals naive tf/df maps on random corpora") {
    check(forAll(Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, termDocGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.ops.TermStats.termStats(docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, String, Long, Long)].collect().toSet
      val naiveTf = docs.flatMap { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        toks.groupBy(identity).map { case (term, xs) => (id, term, xs.length.toLong) }
      }
      val naiveDf = naiveTf.groupBy(_._2).map { case (term, xs) => term -> xs.size.toLong }
      val want = naiveTf.map { case (id, term, tf) => (id, term, tf, naiveDf(term)) }.toSet
      got == want
    })
  }
}
