package graft

import graft.functions.{NativeFunctions, TextFunctions, TextImpl}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Round-5 regressions: the native winnowing expression must reproduce the
  * (oracle-verified) Column/HOF composition it replaced, bit for bit.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(r.passed, r.status.toString)
  }

  /** The round-4 Column composition, kept verbatim as the semantic reference
    * (it hash-matched the q62 DuckDB oracle; it was replaced only because
    * HOF free-variable re-evaluation made it O(len²) per row).
    */
  private def winnowColumnRef(c: Column, k: Int, w: Int): Column = {
    val norm  = TextFunctions.normalizeText(c)
    val len   = length(norm)
    val grams = when(len <= k, array(norm))
      .otherwise(transform(sequence(lit(1), len - k + 1), i => norm.substr(i, lit(k))))
    val hashes = transform(grams, g => substring(md5(g), 1, 8))
    val n      = size(hashes)
    val mins = when(n <= w, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(1), n - w + 1), j => array_min(slice(hashes, j, lit(w)))))
    array_distinct(mins)
  }

  private def bothWays(texts: Seq[String], k: Int, w: Int): Unit = {
    val df = texts.toDF("t")
    val native = df.select(NativeFunctions.winnowFingerprints($"t", k, w)).as[Seq[String]].collect()
    val ref    = df.select(winnowColumnRef($"t", k, w)).as[Seq[String]].collect()
    assert(native.toSeq == ref.toSeq, s"k=$k w=$w texts=${texts.take(3)}...")
  }

  private val edgeTexts = Seq(
    "",
    " ",
    "   ",
    "x",
    "short",
    "exactly8",
    "exactly9c",
    "The quick brown fox jumps over the lazy dog",
    "AAAAAAAAAAAAAAAAAAAAAAAA",
    "  leading and trailing  ",
    "tab\tseparated\twords",
    "\tleading tab",
    "trailing tab\t",
    "line\nbreaks\r\nandvertical\ftabs",
    "MiXeD CaSe TeXt with Punctuation!!! and numbers 12345",
    "répétition café naïve — unicode œuvre",
    "日本語のテキストです、これはテストです",
    ("lorem ipsum dolor sit amet " * 20).trim,
  )

  test("winnow native == Column reference on edge-case texts (k=8, w=4)") {
    bothWays(edgeTexts, 8, 4)
  }

  test("winnow native == Column reference at other (k, w)") {
    for ((k, w) <- Seq((1, 1), (2, 3), (5, 10), (12, 2)))
      bothWays(edgeTexts, k, w)
  }

  test("winnow native == Column reference on random whitespace-rich text") {
    val wsChar = Gen.oneOf(' ', ' ', ' ', '\t', '\n', '\r', '\u000B', '\f')
    val chunk  = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString),
      wsChar.map(_.toString),
    )
    val textGen = Gen.listOf(chunk).map(_.take(60).mkString)
    check(forAll(textGen) { t =>
      val df     = Seq(t).toDF("t")
      val native = df.select(NativeFunctions.winnowFingerprints($"t", 8, 4)).as[Seq[String]].collect().head
      val ref    = df.select(winnowColumnRef($"t", 8, 4)).as[Seq[String]].collect().head
      native == ref
    })
  }

  /** The round-4 Column composition of wordShingles, kept verbatim as the
    * semantic reference (q65/q66 oracles mirror it).
    */
  private def wordShinglesColumnRef(c: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalizeText(c))
    val n    = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), n - k), i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  test("wordShingles native == Column reference on edge-case texts") {
    for (k <- Seq(1, 2, 3, 8)) {
      val df     = edgeTexts.toDF("t")
      val native = df.select(graft.functions.NativeFunctions.wordShingles($"t", k)).as[Seq[String]].collect()
      val ref    = df.select(wordShinglesColumnRef($"t", k)).as[Seq[String]].collect()
      assert(native.toSeq == ref.toSeq, s"k=$k")
    }
  }

  test("wordShingles native == Column reference on random whitespace-rich text") {
    val wsChar = Gen.oneOf(' ', ' ', ' ', '\t', '\n', '\r', '\u000B', '\f')
    val chunk = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(10).mkString),
      wsChar.map(_.toString),
    )
    val textGen = Gen.listOf(chunk).map(_.take(50).mkString)
    check(forAll(textGen) { t =>
      val df     = Seq(t).toDF("t")
      val native = df.select(graft.functions.NativeFunctions.wordShingles($"t", 3)).as[Seq[String]].collect().head
      val ref    = df.select(wordShinglesColumnRef($"t", 3)).as[Seq[String]].collect().head
      native == ref
    })
  }

  test("winnow guarantee: shared passage of length >= w+k-1 shares a fingerprint") {
    val passage = "the common copied passage that is long enough to fingerprint"
    val a = s"unique prefix alpha $passage unique suffix alpha"
    val b = s"totally different beginning $passage and a different end"
    val fps = Seq(a, b).toDF("t")
      .select(NativeFunctions.winnowFingerprints($"t", 8, 4).as("fp")).as[Seq[String]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
  }

  test("winnow null text -> null, and is registered as a SQL function") {
    graft.plans.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_winnow_fingerprints(CAST(NULL AS STRING)) AS a, " +
        "graft_winnow_fingerprints('hello world, a test document', 8, 4) AS b")
      .collect().head
    assert(out.isNullAt(0))
    assert(out.getSeq[String](1).nonEmpty)
  }

  test("corrupt .xls (OLE2 magic, garbage body) gets an actionable error, not 'no worksheet'") {
    val dir  = tmpDir()
    val path = s"$dir/legacy.xls"
    val out  = new java.io.FileOutputStream(path)
    out.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.write(new Array[Byte](512))
    out.close()
    val e = intercept[IllegalArgumentException] {
      graft.ops.LoadFile.toDataFrame(spark, graft.model.File(path))
    }
    assert(e.getMessage.contains("97-2003"))
    assert(e.getMessage.contains(".xlsx"))
  }

  test("SpreadsheetML content with a .xls extension still reads") {
    val dir = tmpDir()
    val df  = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    graft.ops.ExportToFile.df(spark, df, graft.model.File(s"$dir/data.xlsx"),
      graft.model.IfExists.Replace, singleFile = true)
    val renamed = s"$dir/data.xls"
    assert(new java.io.File(s"$dir/data.xlsx").renameTo(new java.io.File(renamed)))
    val back = graft.ops.LoadFile.toDataFrame(spark, graft.model.File(renamed))
    assert(back.count() == 2)
  }

  test("merge failOnDuplicateSourceKeys=false skips the dup guard (caller-guaranteed uniqueness)") {
    import graft.model.{MergeConflict, Table}
    val t = Table("r5_merge_optout")
    Seq((1, "a")).toDF("k", "v").write.saveAsTable(t.qualifiedName)
    val dup = Seq((2, "x"), (2, "y")).toDF("k", "v")
    // guard ON -> rejected
    intercept[IllegalStateException] {
      graft.ops.Merge.mergeDf(spark, dup, t, Map.empty, Seq("k"), MergeConflict.Ignore)
    }
    // guard OFF -> proceeds (documented nondeterministic-with-dups contract)
    graft.ops.Merge.mergeDf(spark, dup, t, Map.empty, Seq("k"), MergeConflict.Ignore,
      failOnDuplicateSourceKeys = false)
    assert(spark.table(t.qualifiedName).filter($"k" === 2).count() == 2)
    spark.sql(s"DROP TABLE ${t.qualifiedName}")
  }

  test("maskPii masks planted emails and phone runs, leaves prose alone") {
    val docs = Seq(
      "contact alice.smith+test@example.co.uk or call +4915123456789 today",
      "year 2024 had 365 days and room 101 stayed open", // no PII-shaped spans
      "two mails: a@b.io c.d@e-f.org and digits 1234567",
    ).toDF("text")
    val out = docs.select(TextFunctions.maskPii($"text").as("m")).as[String].collect()
    assert(out(0) == "contact <EMAIL> or call <PHONE> today")
    assert(out(1) == "year 2024 had 365 days and room 101 stayed open")
    assert(out(2) == "two mails: <EMAIL> <EMAIL> and digits <PHONE>")
  }

  test("epochShard: deterministic per epoch, different across epochs, no shuffle in plan") {
    val df = (1L to 200L).toDF("id")
    val e1a = graft.ops.Sampling.epochShard(df, "id", epoch = 1)
    val e1b = graft.ops.Sampling.epochShard(df, "id", epoch = 1)
    val e2  = graft.ops.Sampling.epochShard(df, "id", epoch = 2)
    val k1a = e1a.orderBy("id").select("shuffle_key").as[String].collect().toSeq
    val k1b = e1b.orderBy("id").select("shuffle_key").as[String].collect().toSeq
    val k2  = e2.orderBy("id").select("shuffle_key").as[String].collect().toSeq
    assert(k1a == k1b)                 // rerun-stable
    assert(k1a != k2)                  // a new epoch is a new permutation
    assert(e1a.select("shard").distinct().count() > 1) // spreads across shards
    // pure projection: no exchange in the plan
    val plan = e1a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochShard must not shuffle:\n$plan")
  }

  test("winnow is linear-ish: 20k-char doc fingerprints quickly (warmed)") {
    val doc = ("abcdefghij " * 2000).trim
    // warm the JIT first; the quadratic this guards against was ~470s for
    // 500 DOCS, so a generous bound survives this host's CPU-steal bursts
    // without ever letting an O(len²) regression back in
    TextImpl.winnowFingerprints(UTF8String.fromString(doc.take(1000)), 8, 4)
    val t0  = System.nanoTime()
    val n   = TextImpl.winnowFingerprints(UTF8String.fromString(doc), 8, 4).numElements()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n > 0)
    assert(sec < 5.0, s"took $sec s for 20k chars — quadratic regression?")
  }
}
