package graft.plans

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native Catalyst expressions: the same
  * single-node-tree functions the Scala API uses ([[graft.functions]])
  * become callable from `spark.sql` / `transform` / `run_raw_sql` SQL text —
  * so a user whose pipeline is pure SQL still gets the dedup/similarity
  * primitives without touching the DataFrame API.
  *
  * Two registration paths:
  *  - `.withExtensions(new GraftExtensions)` (or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`) at session build —
  *    the production shape;
  *  - [[GraftFunctions.register]] on a live session — for notebooks/tests.
  *
  * Fixed parameters (shingle k, hash count, bands, SRP bits/seed) must be
  * foldable literals — they parameterize the expression TREE, which is the
  * point: one tree node per call, no HOF expansion (see HashExpressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => LevenshteinThresholdRewrite)
  }
}

object GraftFunctions {

  private def longArg(name: String, e: Expression): Long = e match {
    case Literal(v: Byte, _)  => v.toLong
    case Literal(v: Short, _) => v.toLong
    case Literal(v: Int, _)   => v.toLong
    case Literal(v: Long, _)  => v
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got: $other")
  }

  private def intArg(name: String, e: Expression): Int = longArg(name, e).toInt

  private def strArg(name: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$name must be a string literal, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression,
  ): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), builder)

  /** (identifier, info, builder) for every graft SQL function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    fn("graft_shingle_hashes", "graft_shingle_hashes(text[, k]) - distinct xxh64 k-word shingle hashes") {
      case Seq(t)    => ShingleHashesExpr(t, 3)
      case Seq(t, k) => ShingleHashesExpr(t, intArg("k", k))
      case args      => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_char_ngram_hashes", "graft_char_ngram_hashes(text[, n]) - distinct char n-gram hashes") {
      case Seq(t)    => CharNgramHashesExpr(t, 5)
      case Seq(t, n) => CharNgramHashesExpr(t, intArg("n", n))
      case args      => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_minhash", "graft_minhash(hashes[, m]) - one-permutation MinHash signature") {
      case Seq(h)    => MinHashSigExpr(h, 128)
      case Seq(h, m) => MinHashSigExpr(h, intArg("m", m))
      case args      => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_band_buckets", "graft_band_buckets(sig[, bands]) - LSH band bucket ids") {
      case Seq(s)    => BandBucketsExpr(s, 32)
      case Seq(s, b) => BandBucketsExpr(s, intArg("bands", b))
      case args      => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_simhash", "graft_simhash(text) - 64-bit SimHash over tokens") {
      case Seq(t) => SimHash64Expr(t)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_srp_bucket", "graft_srp_bucket(vec, bits, seed) - sign-random-projection bucket") {
      case Seq(v, b, s) => SrpBucketExpr(v, intArg("bits", b), longArg("seed", s))
      case args         => throw new IllegalArgumentException(s"expects 3 args, got ${args.length}")
    },
    fn("graft_jaccard_sorted", "graft_jaccard_sorted(a, b) - exact Jaccard of sorted hash sets") {
      case Seq(a, b) => JaccardSortedExpr(a, b)
      case args      => throw new IllegalArgumentException(s"expects 2 args, got ${args.length}")
    },
    fn("graft_sig_agreement", "graft_sig_agreement(a, b) - MinHash signature agreement") {
      case Seq(a, b) => SigAgreementExpr(a, b)
      case args      => throw new IllegalArgumentException(s"expects 2 args, got ${args.length}")
    },
    fn("graft_dot", "graft_dot(a, b) - float-vector dot product (double accumulation)") {
      case Seq(a, b) => DotExpr(a, b)
      case args      => throw new IllegalArgumentException(s"expects 2 args, got ${args.length}")
    },
    fn("graft_cosine", "graft_cosine(a, b) - float-vector cosine similarity") {
      case Seq(a, b) => CosineExpr(a, b)
      case args      => throw new IllegalArgumentException(s"expects 2 args, got ${args.length}")
    },
    fn("graft_sqdist", "graft_sqdist(a, b) - squared euclidean distance") {
      case Seq(a, b) => SqDistExpr(a, b)
      case args      => throw new IllegalArgumentException(s"expects 2 args, got ${args.length}")
    },
    fn("graft_text_stats",
      "graft_text_stats(text) - one-pass struct(chars, tokens, stopwords, punct, tok_len_sum)") {
      case Seq(t) => TextStatsExpr(t)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_word_shingles", "graft_word_shingles(text[, k]) - k-word shingles of normalized text") {
      case Seq(t)    => WordShinglesExpr(t, 3)
      case Seq(t, k) => WordShinglesExpr(t, intArg("k", k))
      case args      => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_winnow_fingerprints",
      "graft_winnow_fingerprints(text[, k[, w]]) - winnowing md5-hex8 fingerprints (SIGMOD'03)") {
      case Seq(t)       => WinnowFingerprintsExpr(t, 8, 4)
      case Seq(t, k)    => WinnowFingerprintsExpr(t, intArg("k", k), 4)
      case Seq(t, k, w) => WinnowFingerprintsExpr(t, intArg("k", k), intArg("w", w))
      case args         => throw new IllegalArgumentException(s"expects 1-3 args, got ${args.length}")
    },
    fn("graft_luhn_valid", "graft_luhn_valid(s) - Luhn checksum validity (13-19 digits)") {
      case Seq(s) => LuhnValidExpr(s)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_mask_cc", "graft_mask_cc(text[, token]) - mask Luhn-valid card-number spans") {
      case Seq(t)      => MaskLuhnExpr(t, "<CC>")
      case Seq(t, tok) => MaskLuhnExpr(t, strArg("token", tok))
      case args        => throw new IllegalArgumentException(s"expects 1-2 args, got ${args.length}")
    },
    fn("graft_html_to_text",
      "graft_html_to_text(html) - strip script/style/tags, decode entities, collapse whitespace") {
      case Seq(h) => HtmlToTextExpr(h)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_url_host", "graft_url_host(url) - lowercased host (userinfo/port stripped)") {
      case Seq(u) => UrlHostExpr(u)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_url_domain", "graft_url_domain(url) - registered domain (last two host labels)") {
      case Seq(u) => UrlDomainExpr(u)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_url_normalize",
      "graft_url_normalize(url) - lowercase scheme/host, drop fragment + tracking params") {
      case Seq(u) => UrlNormalizeExpr(u)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_dedup_lines",
      "graft_dedup_lines(text) - drop repeated non-blank lines within a document (keep first)") {
      case Seq(t) => DedupLinesExpr(t)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
    fn("graft_sanitize",
      "graft_sanitize(text) - strip control/zero-width chars, normalize whitespace") {
      case Seq(t) => SanitizeTextExpr(t)
      case args   => throw new IllegalArgumentException(s"expects 1 arg, got ${args.length}")
    },
  )

  /** Register (or re-register) every graft function on a live session, plus
    * the optimizer rules (idempotently — extraOptimizations accretes).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (ident, inf, builder) => reg.registerFunction(ident, inf, builder) }
    if (!spark.experimental.extraOptimizations.contains(LevenshteinThresholdRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinThresholdRewrite
  }
}
