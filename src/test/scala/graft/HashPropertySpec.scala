package graft

import graft.functions.{HashImpl, NativeFunctions, TextFunctions}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Property tests pinning the native expressions to their Column-API /
  * mathematical contracts (ScalaCheck driven directly — no scalatestplus
  * bridge in the offline cache).
  */
class HashPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val text = Gen.listOf(word).map(_.take(40).mkString(" "))

  test("native shingleHashes matches the Column-API hash SET for ASCII text") {
    check(forAll(text) { t =>
      val native = HashImpl.shingleHashes(UTF8String.fromString(t), 3)
        .asInstanceOf[GenericArrayData].toLongArray().toSet
      val column = Seq(t).toDF("t")
        .select(TextFunctions.shingleHashes($"t", 3)).as[Seq[Long]].collect().head.toSet
      native == column
    })
  }

  test("jaccardSorted equals exact set Jaccard") {
    val setGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.take(200))
    check(forAll(setGen, setGen) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = HashImpl.jaccardSorted(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      val inter    = sa.toSet.intersect(sb.toSet).size.toDouble
      val expected = inter / (sa.toSet ++ sb.toSet).size
      math.abs(got - expected) < 1e-12
    })
  }

  test("OPH minhash signature agreement approximates true Jaccard") {
    // two overlapping sets with known Jaccard; the 128-bucket estimate must
    // land within a loose statistical band (deterministic — no flakiness)
    val base  = (0L until 400L).map(i => HashImpl.Seed * (i + 1) ^ (i << 17)).toArray
    for (keep <- Seq(400, 300, 200, 100)) {
      val a  = base
      val b  = base.take(keep) ++ (0 until (400 - keep)).map(i => -1000000L - i * 7919L)
      val trueJ = a.toSet.intersect(b.toSet).size.toDouble / (a.toSet ++ b.toSet).size
      val sigA = HashImpl.minHashSignature(new GenericArrayData(a.sorted), 128)
      val sigB = HashImpl.minHashSignature(new GenericArrayData(b.toArray.sorted), 128)
      val est  = HashImpl.sigAgreement(sigA, sigB)
      assert(math.abs(est - trueJ) < 0.15, s"keep=$keep true=$trueJ est=$est")
    }
  }

  test("simHash64 of near-identical token streams has low hamming distance") {
    check(forAll(Gen.listOfN(30, word)) { words0 =>
      val words = if (words0.isEmpty) List("pad") else words0
      val t1 = words.mkString(" ")
      val t2 = (words :+ "extraword").mkString(" ")
      val t3 = words.map(w => w.reverse + "x").mkString(" ") // unrelated-ish
      val h1 = HashImpl.simHash64(UTF8String.fromString(t1))
      val h2 = HashImpl.simHash64(UTF8String.fromString(t2))
      val d12 = java.lang.Long.bitCount(h1 ^ h2)
      val h3 = HashImpl.simHash64(UTF8String.fromString(t3))
      val d13 = java.lang.Long.bitCount(h1 ^ h3)
      d12 <= 16 && (words.toSet.size < 5 || d12 <= d13 + 8)
    })
  }

  test("simHash64Md5: single-token text packs the md5-derived hash verbatim; empty is all-ones") {
    // one token ⇒ every bit vote is that token's hash bit ⇒ sim == tokenHash.
    // 0x5d41402abc4b2a76 = first 8 bytes of md5("hello"), big-endian — the
    // exact value DuckDB's ('0x' || substring(md5(tok), 1, 16))::UBIGINT
    // yields, which is the q13 oracle's parity contract.
    assert(HashImpl.simHash64Md5(UTF8String.fromString("hello")) == 0x5d41402abc4b2a76L)
    assert(HashImpl.simHash64Md5(UTF8String.fromString("  HELLO\t")) == 0x5d41402abc4b2a76L)
    assert(HashImpl.simHash64Md5(UTF8String.fromString("")) == -1L)
    assert(HashImpl.simHash64Md5(UTF8String.fromString("  \t ")) == -1L)
    // same vote semantics as the xxhash variant: near-identical streams stay close
    val a = HashImpl.simHash64Md5(UTF8String.fromString("the quick brown fox jumps over the dog"))
    val b = HashImpl.simHash64Md5(UTF8String.fromString("the quick brown fox jumps over the dog zz"))
    assert(java.lang.Long.bitCount(a ^ b) <= 16)
  }

  test("cosine: native equals Column-API HOF formulation bit-for-bit") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    check(forAll(vec, vec) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val native = df.select(NativeFunctions.cosine($"a", $"b")).as[Double].collect().head
      // reference formulation: zip_with/aggregate double accumulation
      import org.apache.spark.sql.functions._
      val hofDot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
      val hof = df.select {
        val d  = hofDot($"a", $"b")
        val na = sqrt(hofDot($"a", $"a"))
        val nb = sqrt(hofDot($"b", $"b"))
        when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
      }.as[Double].collect().head
      native == hof || (native.isNaN && hof.isNaN)
    })
  }

  test("textStats native pass matches the HOF component functions") {
    import org.apache.spark.sql.functions._
    // tricky shapes: leading/trailing spaces, non-space whitespace (tabs,
    // newlines — Java split("\s+") emits a leading empty token), empties,
    // punctuation runs, stopwords in mixed case
    val fixed = Seq(
      "", " ", "   ", "\thello", "\n\nthe quick, brown fox!", "a  b\t\tc",
      "The AND of to IS with;", "one", "!!!...???", "x \n y \t z ",
      " padded both sides ", "tab\tsep\ttoks",
    )
    val gen = for {
      words <- Gen.listOf(Gen.oneOf(Gen.alphaLowerChar.map(_.toString),
        Gen.oneOf("the", "and", "of", "a", "it,", "x.y", "{b}")))
      sep <- Gen.listOfN(math.max(words.length - 1, 0), Gen.oneOf(" ", "  ", "\t", "\n", " \t "))
    } yield words.zipAll(sep, "", "").map { case (w, s) => w + s }.mkString
    check(forAll(Gen.oneOf(Gen.oneOf(fixed), gen)) { s: String =>
      val df = Seq(s).toDF("t")
      val n = df.select(NativeFunctions.textStats(col("t")).as("s"))
        .select(col("s.chars"), col("s.tokens"), col("s.stopwords"), col("s.punct"), col("s.tok_len_sum"))
        .collect()(0)
      val h = df.select(
        length(col("t")),
        size(TextFunctions.tokens(col("t"))),
        TextFunctions.stopwordCount(col("t")),
        TextFunctions.punctCount(col("t")),
        aggregate(TextFunctions.tokens(col("t")), lit(0L), (acc, t) => acc + length(t)),
      ).collect()(0)
      n.getInt(0) == h.getInt(0) && n.getInt(1) == h.getInt(1) &&
      n.getInt(2) == h.getInt(2) && n.getInt(3) == h.getInt(3) &&
      n.getLong(4) == h.getLong(4)
    })
  }
}
