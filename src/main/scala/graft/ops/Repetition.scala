package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher repetition-rule battery (Rae et al. 2021, arXiv:2112.11446
  * Appendix A1.2) — the within-document repetition half of the published
  * filter set ([[QualityRules]] is the A1.1 half; corpus-level line
  * repetition is [[graft.dedup.Dedup.stripBoilerplateLines]]'s job):
  * duplicate-line fraction, duplicate-line CHARACTER fraction, and the
  * top-n-gram character fraction for n = 2, 3, 4. Complements
  * [[graft.functions.TextFunctions.repeatedShingleFraction]] (q66), which
  * measures distinct-shingle density rather than the Gopher definitions.
  *
  * Scale shape: the n-gram statistics run explode → (doc, gram) count →
  * per-doc argmax — map-side-partial aggregations over 16-byte-ish rows,
  * never a per-row quadratic pass (a 1 MB document has ~200 k grams; m²
  * per row would be 4·10¹⁰). Line stats use per-row array ops: lines per
  * document are bounded small, and the array form keeps them inside one
  * projection. Paragraph variants are the same op over a "\n\n" split —
  * the fixture corpus is single-line, so they are not duplicated here.
  *
  * Oracle-pinned semantics:
  *  - lines = trim-split on \n; dup lines = lines occurring > 1 time in
  *    the doc; char base = sum of line lengths.
  *  - grams = lowercase whitespace tokens joined by one space; char base
  *    = length of the space-joined token string; top gram ties break to
  *    the lexicographically smallest gram.
  *  - docs with < n tokens (or no line chars) score 0 on that rule.
  */
object Repetition {

  private def dupFilter(lines: Column) =
    filter(lines, l => size(filter(lines, x => x === l)) > 1)

  /** Append the repetition columns + `passes`: (n_lines, dup_line_frac,
    * dup_line_char_frac, top2gram_frac, top3gram_frac, top4gram_frac,
    * passes). Fractions rounded to 4 decimals; thresholds are Gopher's.
    */
  def gopherRepetition(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxTopGramFrac: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
  ): DataFrame = {
    val ns = maxTopGramFrac.keys.toSeq.sorted
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val lineChars = aggregate(lines, lit(0L), (a, l) => a + length(l))
    val toks = graft.functions.TextFunctions.tokens(lower(col(textCol)))
    val withLines = df.select(
      col(idCol),
      col(textCol).as("__text"),
      size(toks).as("__ntoks"),
      length(array_join(toks, " ")).cast("long").as("__chars"),
      size(lines).cast("long").as("n_lines"),
      round(size(dupFilter(lines)).cast("double") / size(lines), 4).as("dup_line_frac"),
      round(when(lineChars === 0, lit(0.0)).otherwise(
        aggregate(dupFilter(lines), lit(0L), (a, l) => a + length(l)).cast("double") / lineChars),
        4).as("dup_line_char_frac"),
    )

    // one explode per n, aggregated distributed: (doc, gram) counts → the
    // per-doc most frequent gram (ties to the smallest gram) → char frac.
    // Docs with < n tokens have no n-gram (wordShingles would emit its
    // whole-text sentinel) — filtered out here, scored 0 via the left join.
    val perN = ns.map { n =>
      val grams = withLines.where(col("__ntoks") >= n)
        .select(col(idCol), col("__chars"),
          explode(graft.functions.TextFunctions.wordShingles(col("__text"), n)).as("gram"))
        .groupBy(col(idCol), col("__chars"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
      val top = grams.withColumn("__rn",
          row_number().over(Window.partitionBy(col(idCol))
            .orderBy(col("cnt").desc, col("gram").asc)))
        .where(col("__rn") === 1)
        .select(col(idCol),
          round((col("cnt") * length(col("gram"))).cast("double") / col("__chars"), 4)
            .as(s"top${n}gram_frac"))
      top
    }
    val joined = perN.foldLeft(withLines.drop("__text", "__ntoks", "__chars")) { (acc, t) =>
      acc.join(t, Seq(idCol), "left")
    }
    val filled = ns.foldLeft(joined) { (acc, n) =>
      acc.withColumn(s"top${n}gram_frac", coalesce(col(s"top${n}gram_frac"), lit(0.0)))
    }
    val passCond = ns.foldLeft(
      col("dup_line_frac") <= maxDupLineFrac &&
        col("dup_line_char_frac") <= maxDupLineCharFrac) { (c, n) =>
      c && col(s"top${n}gram_frac") <= maxTopGramFrac(n)
    }
    filled.withColumn("passes", passCond)
      .select(Seq(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac")) ++
        ns.map(n => col(s"top${n}gram_frac")) :+ col("passes"): _*)
  }
}
