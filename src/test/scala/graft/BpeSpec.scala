package graft

import graft.functions.BpeImpl
import graft.model.Table
import graft.ops.{Bpe, BpeModel}
import org.apache.spark.sql.functions._

/** BPE training + application: the Sennrich et al. toy corpus, round-trip
  * properties, and the persisted-model path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val toyCounts = Array[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("toy corpus learns the classic merges in order") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 3)
    // pair counts round 1: (e,s)=9 (s,t)=9 (t,</w>)=9 — lexicographic
    // tie-break picks (e,s); then (es,t)=9; then (est,</w>)=9
    assert(model.merges == IndexedSeq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("encoder segments a word exactly as training left it") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 3)
    assert(BpeImpl.bpeWord("newest", model.ranks).toSeq == Seq("n", "e", "w", "est</w>"))
    assert(BpeImpl.bpeWord("widest", model.ranks).toSeq == Seq("w", "i", "d", "est</w>"))
    assert(BpeImpl.bpeWord("low", model.ranks).toSeq == Seq("l", "o", "w", "</w>"))
  }

  test("round-trip: concatenated symbols minus the marker reconstruct the word") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 3)
    val rnd   = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val w = (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val joined = BpeImpl.bpeWord(w, model.ranks).mkString("")
      assert(joined == w + BpeImpl.EndOfWord, s"round-trip broke for '$w': $joined")
    }
  }

  test("zero merges: every word counts as chars + 1 marker") {
    val model = BpeModel(IndexedSeq.empty)
    val df    = Seq((1L, "ab cde  f"), (2L, ""), (3L, "   ")).toDF("id", "t")
    val out = df.select(col("id"), model.countTokens(col("t")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> ((2 + 1) + (3 + 1) + (1 + 1)).toLong, 2L -> 0L, 3L -> 0L))
  }

  test("merges reduce the corpus token count, never below word count") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"the quick brown fox ${i % 7} jumps over the lazy dog")).toDF("doc_id", "text")
    val m0   = BpeModel(IndexedSeq.empty)
    val m    = Bpe.train(docs, "text", numMerges = 50, maxTerms = 1000)
    val base = docs.select(sum(m0.countTokens(col("text")))).as[Long].collect().head
    val bpe  = docs.select(sum(m.countTokens(col("text")))).as[Long].collect().head
    val nWords = docs.select(sum(size(graft.functions.TextFunctions.tokens(col("text")))))
      .as[Long].collect().head
    assert(bpe < base, s"merges should shrink counts: $bpe vs $base")
    assert(bpe >= nWords, s"a word is never fewer than 1 token: $bpe vs $nWords")
  }

  test("training is deterministic and save/load round-trips") {
    val docs = Seq.tabulate(30)(i => (i.toLong, s"alpha beta gamma delta ${i % 5}")).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, "text", numMerges = 40, maxTerms = 100)
    val m2 = Bpe.train(docs, "text", numMerges = 40, maxTerms = 100)
    assert(m1.merges == m2.merges)
    val t = Table("graft_test_bpe_model")
    Bpe.saveModel(spark, m1, t)
    val m3 = Bpe.loadModel(spark, t)
    assert(m3.merges == m1.merges)
  }

  test("tokenize column output matches the per-word kernel") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 3)
    val out = Seq((1L, "Newest LOW")).toDF("id", "t")
      .select(model.tokenize(col("t"))).as[Seq[String]].collect().head
    assert(out == Seq("n", "e", "w", "est</w>", "l", "o", "w", "</w>"))
  }
}
