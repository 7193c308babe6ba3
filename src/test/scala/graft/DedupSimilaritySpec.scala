package graft

import graft.dedup.Dedup
import graft.functions.{TextFunctions, VectorFunctions}
import graft.similarity.Ann
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the  QUICK brown fox jumps over the lazy dog near the river bank today"), // exact dup modulo case/ws
    (3L, "The quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup (1 word)
    (4L, "Completely different content about training data pipelines at scale with spark"),
    (5L, "Another unrelated document mentioning embeddings and similarity search methods"),
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id representative per normalized text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 4L, 5L))
  }

  test("exactByKeys keeps deterministic survivor") {
    val df  = Seq((1L, "k1", "x"), (5L, "k1", "y"), (3L, "k2", "z")).toDF("id", "k", "v")
    val out = Dedup.exactByKeys(df, Seq("k"), "id")
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("minhash LSH finds planted near-duplicates, not unrelated pairs") {
    val pairs = Dedup.nearDupPairsMinHash(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // normalized-identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).contains(5L) })
  }

  test("banding dial: r=2 (recall-exact) generates far more candidates than the r=4 scale default") {
    // 40 docs sharing a 6-word prefix with unique 18-word tails: pairwise
    // shingle Jaccard ~0.1 — background similarity, not near-dups. This is
    // exactly the regime the dial trades on: at r=2 a J~0.1 pair has a
    // per-band collision chance of ~J^2 x 64 bands (~half the pairs
    // collide); at r=4 it's ~J^4 x 32 (a fraction of a percent).
    // (Docs must carry many more shingles than the 128 signature buckets —
    // one-permutation densification inflates agreement for tiny sets.)
    val corpus = (0 until 40).map { i =>
      val shared = (0 until 60).map(j => s"shared$j").mkString(" ")
      val tail   = (0 until 240).map(j => s"unique${i}word$j").mkString(" ")
      (i.toLong, s"$shared $tail")
    }.toDF("doc_id", "text")

    // candidate volume = distinct (id_a < id_b) pairs sharing any (band, bucket),
    // replicated from the public native exprs (the pipeline's banding step)
    def candidateCount(bands: Int): Long = {
      val banded = corpus.select(
        col("doc_id").as("id"),
        posexplode(graft.functions.NativeFunctions.bandBuckets(
          graft.functions.NativeFunctions.minHashSignature(
            graft.functions.NativeFunctions.shingleHashes(col("text"), 3), 128), bands)),
      ).toDF("id", "band", "bucket")
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }

    val r4 = candidateCount(bands = 32) // scale default
    val r2 = candidateCount(bands = 64) // recallExactBands territory
    info(s"candidates r4=$r4 r2=$r2")
    assert(Dedup.recallExactBands(0.5) == 64) // the documented r=2 setting
    assert(r2 >= 2 * math.max(r4, 1),
      s"r=2 should cost multiples of r=4's candidate volume (r2=$r2, r4=$r4) — " +
        "if this starts failing, the banding dial docs in Dedup are stale")
  }

  test("length filter is lossless: LSH pairs at recall-exact banding equal brute-force jaccard") {
    // size-diverse corpus: replicas (same size, J=1), a truncated half-doc
    // (size ratio ~0.5 — the length filter MUST prune it at t=0.9 without
    // being able to drop any qualifying pair), and unrelated docs
    val base = (0 until 12).map(j => s"token$j common words here").mkString(" ")
    val corpus = Seq(
      (1L, base), (2L, base),                                // exact dups
      (3L, base.split(" ").take(24).mkString(" ")),          // half-size
      (4L, (0 until 40).map(j => s"other$j").mkString(" ")), // unrelated
    ).toDF("doc_id", "text")
    val t = 0.9
    val lsh = Dedup.nearDupPairsMinHash(corpus, "doc_id", "text", threshold = t,
        bands = Dedup.recallExactBands(t))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: every pair's exact jaccard over the same shingle sets
    val sets = corpus.select($"doc_id",
      graft.functions.NativeFunctions.shingleHashes($"text", 3).as("sh"))
    val brute = sets.as("a").join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
      .where(graft.functions.NativeFunctions.jaccardSorted($"a.sh", $"b.sh") >= t)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"LSH+length-filter $lsh != brute-force $brute")
    assert(brute.contains((1L, 2L)) && !brute.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedupNear removes near-duplicates keeping smallest id") {
    val out = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(1L) && out.contains(4L) && out.contains(5L))
    assert(!out.contains(2L))
  }

  test("connectedComponents: chains collapse to min id, islands stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupNearTransitive collapses a near-dup chain onto one survivor") {
    // b overlaps both a and c; a~c alone is below threshold — one-hop
    // dedup keeps both chain ends, transitive closure keeps only min id.
    val chain = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta iota kappa"),
      (3L, "gamma delta epsilon zeta iota kappa lambda mu"),
      (9L, "completely different words nothing shared here at all"),
    ).toDF("doc_id", "text")
    val out = Dedup.dedupNearTransitive(chain, "doc_id", "text", threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 9L), out)
  }

  test("simhash blocking finds low-hamming pairs") {
    val pairs = Dedup.nearDupPairsSimHash(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard LSH catches word-boundary noise") {
    val noisy = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "thequick brown fox jumps overthe lazy dog"), // mangled whitespace
      (3L, "totally different text with other words entirely"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairsNgram(noisy, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("embedding near-dup finds identical vectors via SRP buckets") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.2f)),   // identical
      (3L, Array(-1.0f, 0.3f, -0.5f, 0.9f)), // far away
    ).toDF("id", "vec")
    val pairs = Dedup.nearDupPairsEmbedding(vecs, "id", "vec", threshold = 0.99, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("cosine/dot/norm correctness on known vectors") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("n"),
      VectorFunctions.cosine($"a", $"b").as("c"),
      VectorFunctions.sqDist($"a", $"b").as("s"),
    ).as[(Double, Double, Double, Double)].collect()(0)
    assert(math.abs(r._1 - 8.0) < 1e-12)
    assert(math.abs(r._2 - math.sqrt(5)) < 1e-12)
    assert(math.abs(r._3 - 8.0 / (math.sqrt(5) * math.sqrt(13))) < 1e-12)
    assert(math.abs(r._4 - 2.0) < 1e-12)
    // zero vector -> cosine 0 by contract
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).as[Double].collect()(0)
    assert(z == 0.0)
  }

  test("brute-force topK returns exact neighbors ranked by cosine") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 1.0f)),
      (13L, Array(-1.0f, 0.0f)),
    ).toDF("id", "vec")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Ann.bruteForceTopK(corpus, queries, "id", "vec", "qid", "qvec", k = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 10L), (2, 11L)))
  }

  test("IVF topK: recall@10 >= 0.9 vs exact on unstructured vectors") {
    // 200 pseudo-random 16-dim vectors — the adversarial (no-cluster) case.
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 200).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val queries = Seq((900L, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("qid", "qvec")
    val exact = Ann.bruteForceTopK(corpus, queries, "id", "vec", "qid", "qvec", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    val approx = Ann.ivfTopK(corpus, queries, "id", "vec", "qid", "qvec", k = 10,
      numCentroids = 8, nprobe = 6)
      .select("neighbor_id").as[Long].collect().toSet
    assert(approx.size == 10)
    val recall = (approx & exact).size / 10.0
    assert(recall >= 0.9, s"recall=$recall approx=$approx exact=$exact")
  }

  test("LSH topK recalls the exact top-1 for clustered vectors") {
    val corpus = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f, 0.0f)
      (i.toLong, base.map(v => v + (i % 7) * 0.01f))
    }.toDF("id", "vec")
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val exact = Ann.bruteForceTopK(corpus, queries, "id", "vec", "qid", "qvec", k = 1)
      .select("neighbor_id").as[Long].collect().head
    val approx = Ann.lshTopK(corpus, queries, "id", "vec", "qid", "qvec", k = 5, bits = 4, tables = 4)
      .select("neighbor_id").as[Long].collect()
    assert(approx.contains(exact))
  }

  test("text functions: tokens, counts, fingerprint, langId") {
    val df = Seq(
      ("  The quick   brown fox  ", "en-ish"),
      ("le chat et la porte des maisons", "fr-ish"),
      ("", "empty"),
    ).toDF("text", "tag")
    val r = df.select(
      TextFunctions.tokenCount($"text").as("tc"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.stopwordCount($"text").as("sw"),
    ).collect()
    assert(r(0).getAs[Int]("tc") == 4)
    assert(r(0).getAs[String]("lang") == "en")
    assert(r(1).getAs[String]("lang") == "fr")
    assert(r(2).getAs[Int]("tc") == 0)
    assert(r(2).getAs[String]("lang") == "und")
    assert(r(0).getAs[String]("fp") != r(1).getAs[String]("fp"))
    // fingerprint is whitespace/case-insensitive
    val fps = Seq("a  B c", "A B C").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("shingles and jaccard") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "e f g h")).toDF("x", "y")
    val j = df.select(TextFunctions.jaccard(
      TextFunctions.shingleHashes($"x", 2), TextFunctions.shingleHashes($"y", 2))).as[Double].collect()
    assert(j(0) == 1.0)
    assert(j(1) == 0.0)
    // short text falls back to whole-string shingle
    val s = Seq("one two").toDF("t")
      .select(size(TextFunctions.wordShingles($"t", 3))).as[Int].collect()(0)
    assert(s == 1)
  }

  test("quality score is high for prose, low for garbage") {
    val good = "The project is designed to help researchers and engineers work with large datasets in a reliable way, and it is tested on many real workloads."
    val bad  = "x$#@!  ~~~ ###"
    val r = Seq((good, bad)).toDF("g", "b").select(
      TextFunctions.qualityScore($"g").as("g"),
      TextFunctions.qualityScore($"b").as("b"),
    ).as[(Double, Double)].collect()(0)
    assert(r._1 > 0.8, s"good=$r")
    assert(r._2 < 0.5, s"bad=$r")
  }

  test("recallExactBands picks the largest r with miss < 1e-6 at the threshold") {
    def miss(t: Double, hashes: Int, bands: Int): Double =
      math.pow(1 - math.pow(t, hashes.toDouble / bands), bands.toDouble)
    for ((t, hashes) <- Seq((0.5, 128), (0.6, 128), (0.7, 256), (0.9, 128))) {
      val bands = Dedup.recallExactBands(t, hashes)
      val r     = hashes / bands
      assert(miss(t, hashes, bands) < 1e-6, s"t=$t hashes=$hashes bands=$bands")
      // maximal r: doubling rows-per-band would violate the bound (unless
      // already at the r that halving can't improve)
      if (r < hashes) assert(miss(t, hashes, hashes / (r * 2)) >= 1e-6, s"t=$t not maximal")
    }
    // mid thresholds over 128 hashes land on r=2; char-gram setup on r=4
    assert(Dedup.recallExactBands(0.5) == 64)
    assert(Dedup.recallExactBands(0.6) == 64)
    assert(Dedup.recallExactBands(0.7, numHashes = 256) == 64)
  }

  test("corpus-level line dedup keeps first occurrence, blanks, and line order") {
    val df = Seq(
      (1L, "alpha\nshared\n\nbeta"),
      (2L, "shared\ngamma\n\ndelta"), // "shared" first seen in doc 1 ord 1
      (3L, "\ngamma\nepsilon"),       // "gamma" first seen in doc 2
    ).toDF("doc_id", "body")
    val out = Dedup.dedupLinesCorpus(df, "doc_id", col("body"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "alpha\nshared\n\nbeta", 4L, 4L)))
    // doc 2 loses "shared" (doc 1 owns it) but keeps its blank line
    assert(out(1) == ((2L, "gamma\n\ndelta", 4L, 3L)))
    // doc 3 loses "gamma" (doc 2 owns it) and keeps its leading blank
    assert(out(2) == ((3L, "\nepsilon", 3L, 2L)))
  }

  test("corpus-level line dedup: whitespace-only lines count as blank and all survive") {
    val df  = Seq((1L, " \t\nsame"), (2L, " \t\nsame")).toDF("doc_id", "body")
    val out = Dedup.dedupLinesCorpus(df, "doc_id", col("body"))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, " \t\nsame", 2L, 2L)))
    assert(out(1) == ((2L, " \t", 2L, 1L))) // only the blank survives
  }

  test("hard negatives exclude the query's own label and rank by cosine") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),   // query, label 0
      (2L, Array(1f, 0.01f), 0),   // closest overall but SAME label — excluded
      (3L, Array(1f, 0.1f), 1),    // closest different-label
      (4L, Array(0.5f, 1f), 1),
      (5L, Array(0f, 1f), 2),
    ).toDF("vec_id", "embedding", "label")
    val q = vecs.filter($"vec_id" === 1L)
      .select($"vec_id".as("qid"), $"embedding", $"label")
    val out = Ann.hardNegativesTopK(vecs, q, "vec_id", "embedding", "label",
        "qid", "embedding", "label", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(out.toSeq == Seq(3L, 4L))
  }

  test("embedding decontamination flags only rows within threshold of the test set") {
    val train = Seq(
      (10L, Array(1f, 0f, 0f)),  // identical to a test vector → cos 1
      (11L, Array(0f, 0f, 1f)),  // orthogonal to both test vectors → cos 0
      (12L, Array(1f, 1f, 0f)),  // cos 1/sqrt(2) ≈ 0.707 to test #1
    ).toDF("vec_id", "embedding")
    val test = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.contaminatedEmbedding(train, test, "vec_id", "embedding",
        threshold = 0.9)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect()
    assert(out(0)._3 && math.abs(out(0)._2 - 1.0) < 1e-9)
    assert(!out(1)._3 && math.abs(out(1)._2) < 1e-9)
    assert(!out(2)._3 && math.abs(out(2)._2 - math.sqrt(0.5)) < 1e-6)
  }

  test("crossSourceOverlap: exact shared-distinct-text counts per source pair") {
    val rows = Seq(
      ("shared one", "a"), ("shared one", "b"), ("shared one", "c"), // in all 3
      ("shared  ONE ", "b"),       // normalization collapse, not a new text
      ("shared two", "a"), ("shared two", "b"),
      ("only a", "a"), ("only b", "b"),
      ("dup within a", "a"), ("dup within a", "a")) // same-source dup: no pair
      .toDF("text", "source")
    val got = Dedup.crossSourceOverlap(rows, "text", "source")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", "b") -> 2L, // shared one + shared two
      ("a", "c") -> 1L,
      ("b", "c") -> 1L))
  }
}
