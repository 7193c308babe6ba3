package graft

import graft.functions.NativeFunctions
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL functions match the Column-API native expressions") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    val viaSql = df.selectExpr(
      "graft_simhash(t) AS sh",
      "graft_shingle_hashes(t, 3) AS sg",
      "graft_minhash(graft_shingle_hashes(t, 3), 64) AS mh",
    ).collect()(0)
    val viaCol = df.select(
      NativeFunctions.simHash64(col("t")).as("sh"),
      NativeFunctions.shingleHashes(col("t"), 3).as("sg"),
      NativeFunctions.minHashSignature(NativeFunctions.shingleHashes(col("t"), 3), 64).as("mh"),
    ).collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
  }

  test("text SQL functions: stats/word-shingles/winnow match the Column API") {
    val df = Seq("The quick brown fox and the lazy dog, again and again").toDF("t")
    val viaSql = df.selectExpr(
      "graft_text_stats(t) AS st",
      "graft_word_shingles(t, 3) AS ws",
      "graft_winnow_fingerprints(t, 8, 4) AS fp",
    ).collect()(0)
    val viaCol = df.select(
      NativeFunctions.textStats(col("t")).as("st"),
      NativeFunctions.wordShingles(col("t"), 3).as("ws"),
      NativeFunctions.winnowFingerprints(col("t"), 8, 4).as("fp"),
    ).collect()(0)
    assert(viaSql.getStruct(0) == viaCol.getStruct(0))
    assert(viaSql.getSeq[String](1) == viaCol.getSeq[String](1))
    assert(viaSql.getSeq[String](2) == viaCol.getSeq[String](2))
    // struct fields land with the documented names
    assert(viaSql.getStruct(0).schema.fieldNames.toSeq ==
      Seq("chars", "tokens", "stopwords", "punct", "tok_len_sum"))
  }

  test("vector SQL functions: cosine/dot/sqdist") {
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f))).toDF("a", "b")
    val r = df.selectExpr(
      "graft_cosine(a, b) AS c", "graft_dot(a, b) AS d", "graft_sqdist(a, b) AS s").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("jaccard of identical and disjoint hash sets") {
    val r = spark.sql(
      "SELECT graft_jaccard_sorted(array(1L,2L,3L), array(1L,2L,3L)) AS same, " +
        "graft_jaccard_sorted(array(1L,2L), array(3L,4L)) AS disj").collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("fixed parameters must be integer literals") {
    val err = intercept[Exception] {
      Seq(("x", 3)).toDF("t", "k").selectExpr("graft_shingle_hashes(t, k)").collect()
    }
    assert(err.getMessage.contains("integer literal") || err.getMessage.contains("k"))
  }

  test("html/url SQL functions match the Column API") {
    val df = Seq(("<p>Hello <b>World</b></p><script>x</script>",
      "HTTPS://User@Ex.COM:8080/A/b?utm_source=x&id=3&ref=r#f")).toDF("h", "u")
    val r = df.selectExpr(
      "graft_html_to_text(h) AS t",
      "graft_url_host(u) AS host",
      "graft_url_domain(u) AS dom",
      "graft_url_normalize(u) AS norm").collect()(0)
    assert(r.getString(0) == "Hello World")
    assert(r.getString(1) == "ex.com")
    assert(r.getString(2) == "ex.com")
    assert(r.getString(3) == "https://ex.com/A/b?id=3")
  }

  test("srp bucket via SQL equals Column API") {
    val df  = Seq(Array.tabulate(8)(i => i.toFloat)).toDF("v")
    val sql = df.selectExpr("graft_srp_bucket(v, 8, 42L) AS b").collect()(0).getLong(0)
    val api = df.select(NativeFunctions.srpBucket(col("v"), 8, 42L).as("b")).collect()(0).getLong(0)
    assert(sql == api)
  }

  test("optimizer rewrites levenshtein(a,b) <= k to the banded threshold form") {
    // parquet-backed (a LocalRelation would be constant-folded away before
    // the user-provided optimizer batch runs)
    val path = s"${tmpDir()}/lev_pairs"
    Seq(
      ("kitten", "sitting"), // dist 3
      ("kitten", "kitten"),  // dist 0
      ("abc", "xyz"),        // dist 3
      (null.asInstanceOf[String], "x"), // null in => null predicate => dropped
    ).toDF("a", "b").write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("lev_pairs")
    // whole-tree scan for the 3-arg (banded) Levenshtein
    def banded(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.flatMap(_.expressions.toList).flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Levenshtein if l.threshold.isDefined => l
      })
    val q = spark.sql("SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 2")
    val optimized = q.queryExecution.optimizedPlan
    assert(banded(optimized).nonEmpty, optimized.toString)
    assert(q.as[(String, String)].collect().toSet == Set(("kitten", "kitten")))
    // strict < and the mirrored literal-first shape rewrite too, same answers
    val lt = spark.sql("SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) < 4")
    assert(banded(lt.queryExecution.optimizedPlan).nonEmpty,
      lt.queryExecution.optimizedPlan.toString)
    assert(lt.as[Long].head() == 3L)
    val ge = spark.sql("SELECT count(*) FROM lev_pairs WHERE 3 >= levenshtein(a, b)")
    assert(ge.as[Long].head() == 3L)
  }
}
