package graft

import graft.functions.NativeFunctions
import org.apache.spark.sql.functions._

/** Round 17: [[graft.functions.LevThreshExpr]] (common prefix/suffix trim +
  * banded DP, ASCII fast path with a code-point fallback) replaced the
  * built-in 3-arg `levenshtein` in [[graft.ops.FuzzyJoin]]. These tests pin
  * VALUE equality against the built-in — including the −1 over-threshold
  * sentinel, empty strings, unicode (multi-byte and surrogate pairs), and
  * nulls — so the swap cannot move any fuzzy-join result.
  */
class LevThreshSpec extends SparkSpec {
  import spark.implicits._

  private def pinEqual(pairs: Seq[(String, String)], d: Int): Unit = {
    val df = pairs.toDF("a", "b")
      .withColumn("builtin", expr(s"levenshtein(a, b, $d)"))
      .withColumn("graft", NativeFunctions.levThresh(col("a"), col("b"), d))
    val bad = df.where(!(col("builtin") <=> col("graft"))).collect()
    assert(bad.isEmpty, s"d=$d mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("random ASCII pairs match the built-in for d = 0..3") {
    val rnd   = new scala.util.Random(17)
    val chars = ('a' to 'z') ++ ('0' to '9') ++ Seq('#', ' ')
    def word(n: Int) = (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    val pairs = (0 until 400).map { _ =>
      val base = word(rnd.nextInt(30))
      // half the pairs are near-edits of a shared base (the fuzzy-join
      // regime: long common flanks), half are unrelated words
      if (rnd.nextBoolean()) {
        val sb = new StringBuilder(base)
        (0 until rnd.nextInt(4)).foreach { _ =>
          if (sb.nonEmpty) {
            val p = rnd.nextInt(sb.length)
            rnd.nextInt(3) match {
              case 0 => sb.setCharAt(p, chars(rnd.nextInt(chars.length)))
              case 1 => sb.deleteCharAt(p)
              case _ => sb.insert(p, chars(rnd.nextInt(chars.length)))
            }
          }
        }
        (base, sb.toString)
      } else (base, word(rnd.nextInt(30)))
    }
    (0 to 3).foreach(d => pinEqual(pairs, d))
  }

  test("blocked-candidate shape: long shared prefix, short differing tail") {
    val pairs = for (i <- 0 until 40; j <- 0 until 40 if i < j)
      yield (f"Customer#$i%012d", f"Customer#$j%012d")
    (0 to 2).foreach(d => pinEqual(pairs, d))
  }

  test("unicode falls back to the built-in kernel (multi-byte + surrogates)") {
    val pairs = Seq(
      ("héllo", "hello"), ("héllo", "héllo"), ("日本語テスト", "日本語テキスト"),
      ("a😀b", "a😀c"), ("😀😀", "😀"), ("naïve", "naive"), ("ascii", "日本語"))
    (0 to 3).foreach(d => pinEqual(pairs, d))
  }

  test("edges: empties, equal strings, far-apart lengths, nulls") {
    val pairs = Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("a", "abcdefghij"), ("abcdefghij", "a"))
    (0 to 3).foreach(d => pinEqual(pairs, d))
    val withNulls = Seq(("x", null), (null, "y"), (null, null)).toDF("a", "b")
      .withColumn("builtin", expr("levenshtein(a, b, 1)"))
      .withColumn("graft", NativeFunctions.levThresh(col("a"), col("b"), 1))
    assert(withNulls.where(!(col("builtin") <=> col("graft"))).isEmpty)
  }

  test("fuzzySelfJoin output is unchanged by the expression swap") {
    val named = (1 to 300).toDF("id").select(col("id").cast("long").as("id"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 12, "0")).as("code"))
    val got = graft.ops.FuzzyJoin.fuzzySelfJoin(named, "id", "code",
      expr("substring(code, 1, length(code) - 2)"), maxDistance = 1)
    // the built-in reference, inlined with the original expression
    val keyed = named.select(col("id").as("fz_id"), col("code").as("fz_text"),
      expr("substring(code, 1, length(code) - 2)").cast("string").as("fz_block"))
    val a = keyed.select(col("fz_block"), col("fz_id").as("id_a"), col("fz_text").as("t_a"))
    val b = keyed.select(col("fz_block"), col("fz_id").as("id_b"), col("fz_text").as("t_b"))
    val want = a.join(b, Seq("fz_block"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= 1)
      .withColumn("dist", expr("levenshtein(t_a, t_b, 1)").cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
