package graft

import graft.ops.Repetition

/** Gopher repetition battery on crafted documents (q99's machinery). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def flags(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    Repetition.gopherRepetition(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("duplicate lines: fraction and char fraction count every occurrence") {
    // lines: dup(3), dup(3), unique one(10), dup again? -> "dup" x2 + 2 unique
    val text = Seq("dup line", "dup line", "unique a", "unique bb").mkString("\n")
    val r = flags(1L -> text)(1L)
    assert(r.getLong(1) === 4L)          // n_lines
    assert(r.getDouble(2) === 0.5)       // 2 of 4 lines duplicated
    // chars: dup(8)*2 + 8 + 9 = 33; dup chars 16
    assert(r.getDouble(3) === BigDecimal(16.0 / 33).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("top n-gram char fraction: repeated phrase dominates") {
    // "ab cd" bigram occurs 3x; normalized text = "ab cd ab cd ab cd" (17 chars)
    val r = flags(2L -> "ab cd ab cd ab cd")(2L)
    // top bigram by count: "ab cd" (3) vs "cd ab" (2); frac = 3*5/17
    assert(r.getDouble(4) === BigDecimal(15.0 / 17).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!r.getBoolean(7)) // far over the 0.20 threshold
  }

  test("top-gram ties break to the lexicographically smallest gram") {
    // "b a" and "a b" each occur once in "b a b"? -> grams: "b a", "a b"; tie
    // chars = 5; smallest gram "a b" (len 3) -> 1*3/5
    val r = flags(3L -> "b a b")(3L)
    assert(r.getDouble(4) === 0.6)
  }

  test("short docs score 0 on gram rules they have no n-gram for") {
    val r = flags(4L -> "only three words")(4L) // 3 tokens: has 2,3-grams, no 4-gram
    assert(r.getDouble(6) === 0.0)      // top4gram_frac
    assert(r.getDouble(5) > 0.0)        // top3gram_frac (whole text once)
  }

  test("clean varied text passes all repetition rules") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val r = flags(5L -> text)(5L)
    assert(r.getDouble(2) === 0.0)
    assert(r.getBoolean(7) === true)
  }
}
