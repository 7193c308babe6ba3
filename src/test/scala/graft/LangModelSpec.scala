package graft

import graft.ops.LangModel
import org.apache.spark.sql.functions._

/** Hand-computed add-one bigram LM scores (q97's machinery). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("self-scored corpus: hand-computed counts and bits") {
    // corpus: c1 = {a:3, b:2, c:1}, V=3; c12 = {(a,b):2, (b,a):1, (b,c):1}
    val d = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val out = LangModel.scoreBigram(d, d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc1: P(b|a)=(2+1)/(3+3)=.5 -> 1 bit; P(a|b)=(1+1)/(2+3)=.4 -> 1.32193
    assert(out(0) === ((1L, 3L, 2L, 0L, BigDecimal((1.0 + 1.3219280948873622) / 2)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // doc2: P(b|a)=.5 -> 1; P(c|b)=(1+1)/(2+3)=.4 -> 1.32193
    assert(out(1)._5 === out(0)._5)
  }

  test("held-out doc: unseen bigrams counted and smoothed, not dropped") {
    val train = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val docs  = Seq((3L, "c c c")).toDF("doc_id", "text")
    val out = LangModel.scoreBigram(train, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
    // both (c,c) bigrams unseen: P=(0+1)/(1+3)=.25 -> 2 bits each
    assert(out.head === ((3L, 3L, 2L, 2L, 2.0)))
  }

  test("degenerate docs: empty and one-token score 0 with zero bigrams") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val docs  = Seq((4L, "a"), (5L, "   ")).toDF("doc_id", "text")
    val out = LangModel.scoreBigram(train, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((4L, 1L, 0L, 0L, 0.0)))
    assert(out(1)._3 === 0L)
    assert(out(1)._5 === 0.0)
  }

  test("OOV first token: unigram count 0 still smooths via vocab size") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val docs  = Seq((6L, "z a")).toDF("doc_id", "text")
    // (z,a): c12=0, c1(z)=0, V=2 -> P=1/2 -> 1 bit, unseen=1
    val out = LangModel.scoreBigram(train, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.head === ((6L, 2L, 1L, 1L, 1.0)))
  }

  test("model bounds at/above the natural size change nothing") {
    val d = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val full    = LangModel.scoreBigram(d, d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val bounded = LangModel.scoreBigram(d, d, "doc_id", "text", maxVocab = 3, maxBigrams = 3)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(bounded == full)
  }

  test("pruned model: dropped entries score as unseen with V = pruned vocab") {
    // c1 = {a:3, b:2, c:1}; top-2 vocab keeps {a,b}, V=2
    // c12 = {(a,b):2, (b,a):1, (b,c):1}; top-1 keeps (a,b)
    val train = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val docs  = Seq((3L, "a b c")).toDF("doc_id", "text")
    val out = LangModel.scoreBigram(train, docs, "doc_id", "text",
        maxVocab = 2, maxBigrams = 1)
      .as[(Long, Long, Long, Long, Double)].collect()
    // (a,b): kept, P=(2+1)/(3+2)=.6; (b,c): pruned -> unseen, P=(0+1)/(2+2)=.25
    val bits = (-math.log(0.6) / math.log(2) + 2.0) / 2
    assert(out.head === ((3L, 3L, 2L, 1L,
      BigDecimal(bits).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("top-K pruning breaks count ties by key, deterministically") {
    // b and c tie at count 1: maxVocab=2 must keep {a, b} (key asc on ties)
    val train = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val docs  = Seq((2L, "c a")).toDF("doc_id", "text")
    // (c,a): bigram unseen either way; c1(c)=0 iff c was pruned -> P=1/(0+2)
    val out = LangModel.scoreBigram(train, docs, "doc_id", "text", maxVocab = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.head._5 === 1.0) // -log2(1/2): proves c1(c)=0, i.e. c pruned not b
  }

  test("approx perplexity buckets agree with exact terciles away from threshold ties") {
    val rnd   = new scala.util.Random(23)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docs = (0 until 300).map { i =>
      val len = 8 + rnd.nextInt(20)
      (i.toLong, (0 until len).map(_ => words(rnd.nextInt(words.size))).mkString(" "),
        s"g${i % 2}")
    }.toDF("doc_id", "text", "grp")
    val train  = docs.filter(col("doc_id") % 3 =!= 0)
    val exact  = LangModel.perplexityBuckets(train, docs, "doc_id", "text", "grp")
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    val approx = LangModel.perplexityBucketsApprox(train, docs, "doc_id", "text", "grp")
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= (exact.size * 0.9).toInt, s"agreement $agree/${exact.size}")
    // buckets are roughly thirds in both
    val sizes = approx.values.groupBy(identity).map(_._2.size)
    assert(sizes.forall(s => s > 50 && s < 150), sizes.toString)
  }
}
