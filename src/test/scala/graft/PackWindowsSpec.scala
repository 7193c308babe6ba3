package graft

import graft.ops.{Bpe, BpeModel, Packing}
import org.apache.spark.sql.functions._

/** Concat-and-chunk context-window packing + BPE id encoding. */
class PackWindowsSpec extends SparkSpec {
  import spark.implicits._

  // ---- encodeIds ------------------------------------------------------------

  test("encodeIds maps symbols to stable ids with specials reserved") {
    val model = Bpe.trainFromCounts(
      Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 3)
    // alphabet: d,e,i,l,n,o,r,s,t,w → ids 3..12; </w>=13; es=14, est=15, est</w>=16
    val ids = Seq((1L, "low")).toDF("id", "t")
      .select(model.encodeIds(col("t"))).as[Seq[Int]].collect().head
    // low → l,o,w,</w>
    val l = 3 + model.alphabet.indexOf("l")
    val o = 3 + model.alphabet.indexOf("o")
    val w = 3 + model.alphabet.indexOf("w")
    assert(ids == Seq(l, o, w, 3 + model.alphabet.size))
    // unknown char → UNK=1
    val unk = Seq((1L, "xyz?")).toDF("id", "t")
      .select(model.encodeIds(col("t"))).as[Seq[Int]].collect().head
    assert(unk.contains(BpeModel.UnkId))
    assert(model.vocabSize == 3 + model.alphabet.size + 1 + 3)
  }

  test("model with alphabet save/load round-trips ids identically") {
    val model = Bpe.trainFromCounts(
      Array(("alpha", 4L), ("beta", 2L), ("gamma", 1L)), numMerges = 10)
    val t = graft.model.Table("graft_test_bpe_ids_model")
    Bpe.saveModel(spark, model, t)
    val loaded = Bpe.loadModel(spark, t)
    assert(loaded.merges == model.merges && loaded.alphabet == model.alphabet)
    val df = Seq((1L, "alpha beta gamma delta")).toDF("id", "t")
    val a = df.select(model.encodeIds(col("t"))).as[Seq[Int]].collect().head
    val b = df.select(loaded.encodeIds(col("t"))).as[Seq[Int]].collect().head
    assert(a == b)
  }

  // ---- packContextWindows ---------------------------------------------------

  private def packed(docs: Seq[(Long, Seq[Int])], w: Int) = {
    val df = docs.toDF("doc_id", "ids")
    Packing.packContextWindows(df, "doc_id", "ids", windowSize = w)
      .orderBy("window_id")
      .as[(Long, Seq[Int], Long, Long)]
      .collect()
  }

  /** The reference semantics, computed naively on the driver. */
  private def naive(docs: Seq[(Long, Seq[Int])], w: Int): Seq[Seq[Int]] = {
    val hashes = docs.map(_._1).toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    val ordered = docs.sortBy { case (id, _) => (hashes(id), id) }
    val stream  = ordered.flatMap { case (_, ids) => ids :+ BpeModel.EosId }
    stream.grouped(w).map(g => g.padTo(w, BpeModel.PadId)).toSeq
  }

  test("windows equal the naive concat-and-chunk reference") {
    val rnd  = new scala.util.Random(5)
    val docs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(17))(rnd.nextInt(100) + 3)))
    val w    = 16
    val got  = packed(docs, w)
    val want = naive(docs, w)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case (((wid, ids, _, _), expect), i) =>
      assert(wid == i, s"window ids must be dense: $wid at $i")
      assert(ids == expect, s"window $i mismatch:\n got  $ids\n want $expect")
    }
  }

  test("every window is exactly W ids; n_tokens counts non-pad; totals conserve") {
    val docs = (0 until 25).map(i => (i.toLong, Seq.fill(7)(i + 3)))
    val w    = 10
    val out  = packed(docs, w)
    assert(out.forall(_._2.length == w))
    val totalReal = out.map(_._3).sum
    assert(totalReal == docs.map(_._2.length + 1).sum.toLong) // + EOS each
    // all but the last window are full
    assert(out.dropRight(1).forall(_._3 == w))
  }

  test("a document longer than the window straddles multiple windows intact") {
    val docs = Seq((1L, (100 to 134).toSeq)) // 35 ids + EOS = 36
    val out  = packed(docs, 10)
    assert(out.length == 4)
    val flat = out.flatMap(_._2).toSeq
    assert(flat.take(35) == (100 to 134).toSeq)
    assert(flat(35) == BpeModel.EosId)
    assert(flat.drop(36).forall(_ == BpeModel.PadId))
  }

  test("repartitioning the input does not change the windows") {
    val docs = (0 until 30).map(i => (i.toLong, Seq.fill(5 + i % 7)(i + 3)))
    val df1 = docs.toDF("doc_id", "ids").repartition(7)
    val df2 = docs.toDF("doc_id", "ids").coalesce(1)
    val a = Packing.packContextWindows(df1, "doc_id", "ids", 12)
      .orderBy("window_id").as[(Long, Seq[Int], Long, Long)].collect().toSeq
    val b = Packing.packContextWindows(df2, "doc_id", "ids", 12)
      .orderBy("window_id").as[(Long, Seq[Int], Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("non-numeric ids pack deterministically (no silent null-collapse of the order key)") {
    val docs = Seq(("alpha", Seq(1, 2, 3)), ("beta", Seq(4, 5)), ("gamma", (6 to 14).toSeq))
      .toDF("doc_id", "ids")
    def run() = Packing.packContextWindows(docs, "doc_id", "ids", 6)
      .orderBy("window_id").as[(Long, Seq[Int], Long, Long)].collect().toSeq
    val a = run()
    assert(a == run()) // deterministic across runs
    // total non-pad ids = Σ per-doc ids + one EOS per doc
    assert(a.map(_._3).sum == (3 + 2 + 9 + 3).toLong)
    // order follows xxhash64 of the RAW string ids (would be a single null
    // bucket if the ids were cast to long)
    val hashes = docs.select(col("doc_id"), xxhash64(col("doc_id")).as("h"))
      .as[(String, Long)].collect().toMap
    val ordered = Seq("alpha", "beta", "gamma").sortBy(hashes)
    val expectedFirst = Map("alpha" -> 1, "beta" -> 4, "gamma" -> 6)(ordered.head)
    assert(a.head._2.head == expectedFirst)
  }

  test("end to end: BPE ids from text → fixed windows") {
    val model = Bpe.trainFromCounts(
      Array(("spark", 5L), ("data", 5L), ("pipeline", 3L)), numMerges = 8)
    val docs = Seq((1L, "spark data"), (2L, "pipeline data spark"), (3L, "data"))
      .toDF("doc_id", "text")
    val withIds = docs.select(col("doc_id"), model.encodeIds(col("text")).as("ids"))
    val out = Packing.packContextWindows(withIds, "doc_id", "ids", 8)
      .as[(Long, Seq[Int], Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2.length == 8))
    // stream conserves: total non-pad ids = Σ per-doc ids + one EOS per doc
    val expected = withIds.select(sum(size(col("ids")))).as[Long].collect().head + 3
    assert(out.map(_._3).sum == expected)
  }
}
