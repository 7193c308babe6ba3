package graft

import graft.model.{File, FileType, IfExists}
import graft.ops.{Chunking, ExportToFile, LoadFile, Profile}
import org.apache.spark.sql.functions._

/** Round-7 additions: chunking, HTML extraction, dataset profiling, and
  * compressed-file round-trips.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ---- chunking -------------------------------------------------------------

  private def chunkDocs = Seq(
    (1L, "a" * 500),          // 500 chars → starts 0,150,300,450 → 4 chunks
    (2L, "0123456789"),       // shorter than one chunk
    (3L, ""),                 // blank doc still yields its one empty chunk
  ).toDF("doc_id", "text")

  test("chunkChars windows at the stride with the tail chunk short") {
    val out = Chunking.chunkChars(chunkDocs, "doc_id", "text", chunkSize = 200, stride = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.count(_._1 == 1L) == 4)
    val last = out.filter(_._1 == 1L).maxBy(_._2)
    assert(last._3.length == 50) // 500 - 450
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "0123456789")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "")))
  }

  test("chunkChars overlap reconstructs the document") {
    val out = Chunking.chunkChars(chunkDocs.filter($"doc_id" === 1L),
        "doc_id", "text", chunkSize = 200, stride = 150)
      .orderBy("chunk_id").collect().map(_.getString(2))
    // stride 150 / size 200 → drop the 50-char overlap from every chunk
    // after the first, then concatenation equals the original
    val rebuilt = out.head + out.tail.map(_.drop(50)).mkString
    assert(rebuilt == "a" * 500)
  }

  test("chunkTokens re-joins token windows") {
    val df  = Seq((1L, "  w1  w2\tw3\nw4 w5 w6 w7 ")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(df, "doc_id", "text", chunkTokens = 3, strideTokens = 2)
      .orderBy("chunk_id").collect().map(_.getString(2))
    assert(out.toSeq == Seq("w1 w2 w3", "w3 w4 w5", "w5 w6 w7", "w7"))
  }

  // ---- html → text ----------------------------------------------------------

  private def html1(s: String) =
    Seq(Tuple1(s)).toDF("h")
      .select(graft.functions.TextFunctions.htmlToText($"h")).head.getString(0)

  test("htmlToText strips script/style blocks, tags, entities, whitespace") {
    assert(html1("<html><body><h1>Title</h1><p>Hello   <b>world</b>!</p>" +
      "<script>var x = '<p>not text</p>';</script>" +
      "<style>p { color: red }</style>tail</body></html>") == "Title Hello world ! tail")
    assert(html1("A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
      == "A & B <ok> \"q\" 's' end")
    // amp decodes LAST: '&amp;lt;' is the literal text '&lt;', not '<'
    assert(html1("x &amp;lt; y") == "x &lt; y")
    // an unclosed script keeps its contents; only the tag itself is stripped
    assert(html1("<script>leftover x") == "leftover x")
    // case-insensitive, attributes, multiline
    assert(html1("<SCRIPT type='x'>\nvar a=1;\n</ScRiPt>after") == "after")
  }

  test("htmlToText is null-safe and codegen matches eval") {
    val df = Seq(Some("<p>a</p>"), None).toDF("h")
      .select(graft.functions.TextFunctions.htmlToText($"h").as("t"))
    assert(df.collect().map(r => Option(r.getString(0))).toSet == Set(Some("a"), None))
  }

  // ---- profiling ------------------------------------------------------------

  test("Profile.numeric counts nulls/distincts and min/max/sum per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 40.5),
    ).toDF("a", "b")
    val rows = Profile.numeric(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 3 && a.getLong(3) == 1)
    assert(a.getLong(4) == 2) // distinct {1.0, 2.0}
    assert(a.getDouble(5) == 1.0 && a.getDouble(6) == 2.0 && a.getDouble(7) == 5.0)
    val b = rows("b")
    assert(b.getLong(3) == 1 && b.getLong(4) == 3)
    assert(b.getDouble(7) == 80.5)
  }

  test("Profile.numeric approx mode plans without Expand") {
    val df   = Seq((1.0, 2.0)).toDF("a", "b")
    val plan = Profile.numeric(df, Seq("a", "b"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    assert(Profile.numeric(df, Seq("a", "b"), exact = true)
      .queryExecution.executedPlan.toString.contains("Expand"))
  }

  // ---- temperature mixture --------------------------------------------------

  test("temperatureMixture keeps the smallest group whole and cuts the largest hardest") {
    val df = (0 until 800).map(i => (i.toLong, if (i < 600) "en" else if (i < 750) "fr" else "de"))
      .toDF("doc_id", "lang")
    val out    = ops.Sampling.temperatureMixture(df, "lang", "doc_id", alpha = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 50) // rate exactly 1: every de row survives
    // expected rates: sqrt(50/600)≈0.2887, sqrt(50/150)≈0.5774 — hash noise
    // at n=600/150 stays well inside ±40%
    assert(byLang("en") > 600 * 0.29 * 0.6 && byLang("en") < 600 * 0.29 * 1.4)
    assert(byLang("fr") > 150 * 0.58 * 0.6 && byLang("fr") < 150 * 0.58 * 1.4)
    // alpha = 1 is a no-op: the target distribution IS the corpus distribution
    assert(ops.Sampling.temperatureMixture(df, "lang", "doc_id", alpha = 1.0).count() == 800)
  }

  // ---- video near-dup -------------------------------------------------------

  test("videoNearDupPairs pairs videos sharing sampled-frame hashes") {
    val d = Seq(1L, 2L, 3L).toDF("id")
    // ids 1 and 2 share a seed (identical frames); id 3 is far away
    val gifs = graft.multimodal.Multimodal.synthAnimatedGifs(d,
      seed = when($"id" === 3L, lit(99000L)).otherwise(lit(5000L)),
      nFrames = lit(4), width = 16, height = 12)
    val pairs = graft.multimodal.Multimodal.videoNearDupPairs(gifs, "id", "gif_bytes",
      sampleFrames = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 4L))) // all 4 frames shared; 3 matches nobody
  }

  test("audioHash64 is stable per signal, differs across noise seeds, null when short") {
    import graft.multimodal.AudioCodec
    val a1 = AudioCodec.audioHash64(AudioCodec.renderNoiseWav(7L, 4000))
    val a2 = AudioCodec.audioHash64(AudioCodec.renderNoiseWav(7L, 4000))
    val b  = AudioCodec.audioHash64(AudioCodec.renderNoiseWav(8L, 4000))
    assert(a1.isDefined && a1 == a2)
    assert(java.lang.Long.bitCount(a1.get ^ b.get) > 8) // independent streams
    assert(AudioCodec.audioHash64(AudioCodec.renderNoiseWav(7L, 100)).isEmpty) // < 130 frames
    assert(AudioCodec.audioHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  // ---- curation pipeline ----------------------------------------------------

  test("Curate.pipeline funnel shrinks monotonically and stages do their job") {
    val corpus = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 1
      (3L, "en", "short doc"),                                                // fails min tokens
      (4L, "en", "clean document with exactly enough tokens to pass the bound here"),
      (5L, "de", "eval overlap document one two three four five six seven eight nine ten"),
    ).toDF("doc_id", "lang", "text")
    val eval = Seq(
      (100L, "xx", "overlap document one two three four five six seven eight"),
    ).toDF("doc_id", "lang", "text")
    val stages = ops.Curate.pipeline(corpus, eval, "doc_id", "text", "lang",
      minTokens = 5, maxTokens = 100)
    val f = ops.Curate.funnel(stages).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("input") == 5)
    assert(f("exact_dedup") == 4)     // doc 2 collapses onto 1
    assert(f("quality") == 3)         // doc 3 too short
    assert(f("decontaminated") == 2)  // doc 5 shares an 8-gram with eval
    assert(f("mixture") <= 2)         // temperature downsample can only shrink
    val counts = ops.Curate.funnel(stages).collect().map(_.getLong(2))
    assert(counts.sameElements(counts.sortBy(-_))) // monotone funnel
  }

  // ---- dedup audit ----------------------------------------------------------

  test("clusterSizeHistogram counts singletons and closed clusters") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),      // ~1
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // ~2 (chain 1-2-3)
      (10L, "one two three four five six seven eight"),
      (11L, "one two three four five six seven eight nine"),           // pair {10,11}
      (20L, "lonely unique document with no duplicate partner at all"),
    ).toDF("id", "text")
    val h = graft.dedup.Dedup.clusterSizeHistogram(df, "id", "text",
        threshold = 0.5, bands = graft.dedup.Dedup.recallExactBands(0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("softDedupWeights weights every doc by 1/cluster_size, keeps everything") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "lonely unique document with no duplicate partner at all"),
    ).toDF("id", "text")
    val w = graft.dedup.Dedup.softDedupWeights(df, "id", "text",
        threshold = 0.5, bands = graft.dedup.Dedup.recallExactBands(0.5))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 20L)) // non-destructive
    assert(w(1L) == ((3L, 0.333333)) && w(2L) == ((3L, 0.333333)))
    assert(w(20L) == ((1L, 1.0)))
  }

  test("similarTextTopK ranks by jaccard with id tie-break and excludes self") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),       // closest to 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // second
      (9L, "totally different words nothing shared here at all"),
    ).toDF("id", "text")
    val queries = corpus.filter($"id" === 1L)
    val out = graft.dedup.Dedup.similarTextTopK(corpus, queries, "id", "text",
        k = 2, threshold = 0.3, bands = graft.dedup.Dedup.recallExactBands(0.3))
      .orderBy($"jaccard".desc).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L))) // no self-match, 9 below threshold
  }

  test("similarTextTopK finds a corpus doc with no within-corpus bucket-mate (ADVICE r16)") {
    // every corpus doc is unique — each sits ALONE in its (band, bucket) —
    // but an external query is a near-copy of doc 5. The round-16 `>= 2`
    // singleton cut silently dropped such corpus docs from every band; the
    // round-17 minSize=1 scoping restores the exact-recall contract here.
    val corpus = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9L, "totally different words nothing shared here at all"),
    ).toDF("id", "text")
    val queries = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ).toDF("id", "text")
    val out = graft.dedup.Dedup.similarTextTopK(corpus, queries, "id", "text",
        k = 1, threshold = 0.3, bands = graft.dedup.Dedup.recallExactBands(0.3))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((100L, 5L)),
      "a corpus doc alone in its buckets must still be matchable by queries")
  }

  test("contaminatedIncremental flags batch docs sharing grams with the persisted store") {
    val store = graft.model.Table("graft_r7_gram_store_test")
    val eval  = Seq((100L, "the quick brown fox jumps over the lazy dog today")).toDF("id", "text")
    graft.dedup.IncrementalDedup.buildGramStore(spark, eval, "text", store)
    val batch = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog today suffix"),
      (2L, "completely clean document with no overlap whatsoever in it"),
    ).toDF("id", "text")
    val hits = graft.dedup.IncrementalDedup.contaminatedIncremental(
      spark, batch, "id", "text", store).as[Long].collect().toSet
    assert(hits == Set(1L))
    spark.sql(s"DROP TABLE IF EXISTS ${store.qualifiedName}")
  }

  // ---- DSIR importance weights ----------------------------------------------

  test("Dsir.importanceWeights scores target-like docs above the rest") {
    val corpus = ((0 until 40).map(i => (i.toLong, "en", "the cat sat on the mat and then ran away fast")) ++
      (40 until 50).map(i => (i.toLong, "de", "der hund lief durch den park und bellte laut dabei")))
      .toDF("doc_id", "lang", "text")
    val out = ops.Dsir.importanceWeights(corpus,
      corpus.filter($"lang" === "de"), "doc_id", "text", k = 2)
    val scores = out.join(corpus, "doc_id").groupBy("lang")
      .agg(avg("logw").as("m")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("de") > scores("en"))
    // n_grams = tokens - 1 for docs with >= 2 tokens (11 tokens → 10 bigrams)
    assert(out.filter($"doc_id" === 0L).head.getLong(1) == 10L)
  }

  test("DsirWeightExpr agrees with an explode+join computation of the same sum") {
    val corpus = (0 until 30).map(i => (i.toLong, s"w$i common tok ${i % 3} shared text here"))
      .toDF("doc_id", "text")
    val target = corpus.filter($"doc_id" % 5 === 0)
    val out = ops.Dsir.importanceWeights(corpus, target, "doc_id", "text", k = 2)
      .select($"doc_id", $"logw").as[(Long, Double)].collect().toMap
    // independent path: recompute one doc's weight from the bucket histograms
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.functions.TextFunctions.wordShingles($"text", 2)).as("g"))
      .select(substring(md5($"g"), 1, 2).as("b")).groupBy("b").count()
      .collect().map(r => Integer.parseInt(r.getString(0), 16) -> r.getLong(1)).toMap
    val rc = counts(corpus); val tc = counts(target)
    def L(x: Long) = Math.round(Math.log(x.toDouble) / Math.log(2.0) * 1e6)
    val ci = L(rc.values.sum + 256) - L(tc.values.sum + 256)
    val doc0grams = corpus.filter($"doc_id" === 0L)
      .select(explode(graft.functions.TextFunctions.wordShingles($"text", 2)).as("g"))
      .select(substring(md5($"g"), 1, 2)).as[String].collect()
    val expected = (doc0grams.map { h =>
      val b = Integer.parseInt(h, 16)
      L(tc.getOrElse(b, 0L) + 1) - L(rc.getOrElse(b, 0L) + 1)
    }.sum + doc0grams.length * ci) / 1e6
    assert(out(0L) == expected)
  }

  // ---- vocabulary coverage --------------------------------------------------

  test("oovStats counts tokens outside the top-N vocabulary") {
    val df = Seq(
      (1L, "aa aa aa bb bb cc"), // aa:3 bb:2 cc:1 → vocab(2) = {aa, bb}
      (2L, "aa cc dd"),
      (3L, "   "),
    ).toDF("doc_id", "text")
    val out = ops.TermStats.oovStats(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((6L, 1L, 0.1667))) // cc is OOV
    assert(out(2L) == ((3L, 2L, 0.6667))) // cc, dd OOV
    assert(out(3L) == ((0L, 0L, 0.0)))    // blank doc
    // tie-break: bb and cc at equal count → lexicographically smaller wins
    val v2 = ops.TermStats.vocabulary(Seq((1L, "aa aa bb cc")).toDF("id", "text"), "text", 2)
      .collect().map(_.getString(0)).toSeq
    assert(v2 == Seq("aa", "bb"))
  }

  // ---- url normalization ----------------------------------------------------

  private def url1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)(s: String) =
    Seq(Tuple1(s)).toDF("u").select(f($"u")).head.getString(0)

  test("urlHost lowercases and strips userinfo/port") {
    val host = url1(graft.functions.UrlFunctions.urlHost) _
    assert(host("https://WWW.Example.COM/a") == "www.example.com")
    assert(host("http://user:pw@Host.Org:8080/x?q=1") == "host.org")
    assert(host("ftp://h") == "h")
    assert(host("no-scheme/path") == "")
  }

  test("urlDomain takes the last two labels") {
    val dom = url1(graft.functions.UrlFunctions.urlDomain) _
    assert(dom("https://a.b.example.co/x") == "example.co")
    assert(dom("https://example.com/") == "example.com")
    assert(dom("https://localhost/") == "localhost")
  }

  test("urlNormalize strips tracking params, fragment, case") {
    val norm = url1(graft.functions.UrlFunctions.urlNormalize) _
    assert(norm("HTTPS://Ex.COM/A/b?utm_source=x&id=3&ref=r&page=2#frag")
      == "https://ex.com/A/b?id=3&page=2")
    // path case preserved, query dropped entirely when all params tracked
    assert(norm("https://ex.com/p?utm_a=1&gclid=2&fbclid=3") == "https://ex.com/p")
    // 'referrer' is NOT the 'ref' key; '&&' empty params vanish
    assert(norm("https://ex.com/p?referrer=keep&&x=1") == "https://ex.com/p?referrer=keep&x=1")
    // no scheme → unchanged
    assert(norm("relative/path?utm_x=1") == "relative/path?utm_x=1")
    // no path, query only
    assert(norm("http://A.B?ref=1&z=2") == "http://a.b?z=2")
  }

  // ---- compressed round-trips ----------------------------------------------

  test("FileType.fromPath looks through compression suffixes") {
    assert(FileType.fromPath("/x/a.csv.gz").contains(FileType.Csv))
    assert(FileType.fromPath("/x/a.ndjson.zst").contains(FileType.Ndjson))
    assert(FileType.fromPath("s3a://b/a.jsonl.bz2").contains(FileType.Ndjson))
    assert(FileType.fromPath("/x/a.gz").isEmpty) // compression alone is not a type
    assert(!File("/x/a.csv.gz").isPattern)
  }

  test("gzip csv single-file export round-trips and is really gzip") {
    val dir = tmpDir()
    val df  = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val f   = File(s"$dir/out.csv.gz")
    ExportToFile.df(spark, df, f, IfExists.Replace, singleFile = true,
      compression = Some("gzip"))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.csv.gz"))
    assert(bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) // gzip magic
    val back = LoadFile.toDataFrame(spark, f)
      .select($"k".cast("long"), $"v").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "x"), (2L, "y")))
  }

  test("compression is rejected for wrapped-json and spreadsheet exports") {
    val dir = tmpDir()
    intercept[IllegalArgumentException] {
      ExportToFile.df(spark, Seq((1, "a")).toDF("k", "v"),
        File(s"$dir/out.json"), IfExists.Replace, compression = Some("gzip"))
    }
  }
}
