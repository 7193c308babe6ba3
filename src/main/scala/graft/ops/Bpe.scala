package graft.ops

import graft.functions.{BpeCountExpr, BpeImpl, BpeTokenizeExpr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** A learned BPE merge list, lowest rank = earliest merge. */
case class BpeModel(merges: IndexedSeq[(String, String)]) {
  /** Rank table for the executor-side kernels (pair key = "lhs rhs"). */
  @transient lazy val ranks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + " " + b, r) }
    m
  }

  /** Document BPE token count (codegen'd one-pass kernel). */
  def countTokens(text: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text), ranks))

  /** Document BPE symbols (inspection/debug; prefer countTokens at scale). */
  def tokenize(text: Column): Column =
    ColumnBridge.column(BpeTokenizeExpr(ColumnBridge.expression(text), ranks))
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
    BpeModel(merges.toIndexedSeq)
  }

  /** Persist a model as a `(rank, lhs, rhs)` table. */
  def saveModel(spark: SparkSession, model: BpeModel, table: graft.model.Table): Unit = {
    import spark.implicits._
    TableIO.overwrite(spark,
      model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }.toDF("rank", "lhs", "rhs"),
      table)
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(spark: SparkSession, table: graft.model.Table): BpeModel = {
    val rows = spark.table(table.qualifiedName)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getString(r.fieldIndex("lhs")), r.getString(r.fieldIndex("rhs"))))
    BpeModel(rows.toIndexedSeq)
  }
}
