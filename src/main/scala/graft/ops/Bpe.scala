package graft.ops

import graft.functions.{BpeCountExpr, BpeIdsExpr, BpeImpl, BpeTokenizeExpr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** A learned BPE merge list (lowest rank = earliest merge) plus the base
  * alphabet seen at training time, which together define the id vocabulary.
  */
case class BpeModel(
    merges: IndexedSeq[(String, String)],
    alphabet: IndexedSeq[String] = IndexedSeq.empty,
) {
  /** Rank table for the executor-side kernels (pair key = "lhs rhs"). */
  @transient lazy val ranks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + " " + b, r) }
    m
  }

  /** Id space: 0 = PAD, 1 = UNK, 2 = EOS (document separator), then the
    * training alphabet, `</w>`, and merge products in rank order. A merge
    * product that collides with an earlier symbol keeps the earlier id
    * (same string ⇒ same id).
    */
  @transient lazy val idOf: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var next = BpeModel.FirstSymbolId
    (alphabet ++ IndexedSeq(BpeImpl.EndOfWord) ++ merges.map { case (a, b) => a + b })
      .foreach { sym => if (!m.containsKey(sym)) { m.put(sym, next); next += 1 } }
    m
  }

  /** Vocabulary size including the 3 special ids. */
  def vocabSize: Int = {
    val _ = idOf
    BpeModel.FirstSymbolId + idOf.size
  }

  /** Document BPE token count (codegen'd one-pass kernel). */
  def countTokens(text: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text), ranks))

  /** Document BPE symbols (inspection/debug; prefer countTokens at scale). */
  def tokenize(text: Column): Column =
    ColumnBridge.column(BpeTokenizeExpr(ColumnBridge.expression(text), ranks))

  /** Document BPE token IDS (`array<int>`): per-word symbols mapped through
    * [[idOf]], unknown symbols (chars unseen at training time) → UNK=1.
    * The input to [[Packing.packContextWindows]].
    */
  def encodeIds(text: Column): Column =
    ColumnBridge.column(BpeIdsExpr(ColumnBridge.expression(text), ranks, idOf))
}

object BpeModel {
  val PadId = 0
  val UnkId = 1
  val EosId = 2
  val FirstSymbolId = 3
}

/** Byte-pair-encoding TRAINING (Sennrich et al., ACL 2016) — the real
  * tokenizer-budget accounting the token-mixture/packing operators
  * approximate with [[graft.functions.TextFunctions.subwordCount]].
  *
  * Scale shape: BPE trains on the WORD-COUNT DICTIONARY, not the corpus —
  * the one aggregate `(term, tf)` runs distributed with map-side partials,
  * and only the top-`maxTerms` dictionary rows (bounded, Zipf-covers the
  * mass) collect to the driver for the sequential merge loop, which is
  * inherently serial (each merge depends on the last). Application back
  * over the corpus is a scan-speed codegen'd projection with the rank
  * table as a broadcast-sized reference object.
  *
  * Determinism: dictionary rows collect in (tf DESC, term ASC) order; each
  * round merges the most frequent pair, ties broken to the
  * lexicographically smallest (lhs, rhs). Same corpus → same merges,
  * regardless of partitioning.
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus's word-count dictionary. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int = 200,
      maxTerms: Int = 50000,
  ): BpeModel = {
    val counts = df
      .select(explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(maxTerms)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(counts, numMerges)
  }

  /** Base alphabet of a dictionary: distinct chars, sorted. */
  private def alphabetOf(counts: Array[(String, Long)]): IndexedSeq[String] =
    counts.iterator.flatMap(_._1.iterator).toSet.toIndexedSeq.sorted.map(String.valueOf(_))

  /** The driver-side merge loop over a (word, count) dictionary. */
  def trainFromCounts(counts: Array[(String, Long)], numMerges: Int): BpeModel = {
    // each dictionary word as its evolving symbol sequence
    val words   = counts.map { case (w, _) =>
      val syms = new Array[String](w.length + 1)
      var i = 0
      while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
      syms(w.length) = BpeImpl.EndOfWord
      scala.collection.mutable.ArrayBuffer.from(syms)
    }
    val weights = counts.map(_._2)
    val merges  = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round   = 0
    while (round < numMerges) {
      // weighted adjacent-pair counts over the dictionary
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var j = 0
        while (j < w.length - 1) {
          val p = (w(j), w(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + weights(i))
          j += 1
        }
        i += 1
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        val ab     = a + b
        i = 0
        while (i < words.length) {
          val w = words(i)
          var j = 0
          while (j < w.length - 1) {
            if (w(j) == a && w(j + 1) == b) { w(j) = ab; w.remove(j + 1) }
            else j += 1
          }
          i += 1
        }
        round += 1
      }
    }
    BpeModel(merges.toIndexedSeq, alphabetOf(counts))
  }

  /** Persist a model as a `(kind, rank, lhs, rhs)` table — `merge` rows in
    * rank order plus `alpha` rows (the training alphabet, rhs unused).
    */
  def saveModel(spark: SparkSession, model: BpeModel, table: graft.model.Table): Unit = {
    import spark.implicits._
    val rows =
      model.merges.zipWithIndex.map { case ((a, b), r) => ("merge", r, a, b) } ++
        model.alphabet.zipWithIndex.map { case (ch, i) => ("alpha", i, ch, "") }
    TableIO.overwrite(spark, rows.toSeq.toDF("kind", "rank", "lhs", "rhs"), table)
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(spark: SparkSession, table: graft.model.Table): BpeModel = {
    val rows = spark.table(table.qualifiedName)
      .orderBy(col("kind"), col("rank"))
      .collect()
      .map(r => (r.getString(r.fieldIndex("kind")), r.getInt(r.fieldIndex("rank")),
        r.getString(r.fieldIndex("lhs")), r.getString(r.fieldIndex("rhs"))))
    BpeModel(
      rows.filter(_._1 == "merge").sortBy(_._2).map(t => (t._3, t._4)).toIndexedSeq,
      rows.filter(_._1 == "alpha").sortBy(_._2).map(_._3).toIndexedSeq)
  }
}
