package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (beyond-reference scope — SURVEY.md §7 step 10). All are compositions of
  * built-in (codegen'd / JVM-native) functions over Columns: no Scala UDFs in
  * the hot path, so whole-stage codegen and Catalyst pushdown stay intact.
  */
object TextFunctions {

  /** Collapse whitespace + lowercase — the canonical form used by
    * fingerprinting and dedup.
    */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokenization. Empty/blank input → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word-piece regex (runs of letters, digits, or a
    * single non-space symbol) — a cheap, deterministic proxy for tokenizer
    * budget accounting at corpus scale.
    */
  def subwordCount(c: Column): Column =
    coalesce(regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")), lit(0))

  /** Rolling-hash document fingerprint over the normalized text. Exact-dup
    * grouping key: grouping/shuffling by a 32-char hex key instead of the
    * full document text keeps shuffle rows small at 100 TB.
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** 64-bit content hash (xxhash64 — codegen'd, 10x cheaper than md5) for
    * bucketing/salting.
    */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))

  private val punctRe    = "[.,;:!?'\"()\\[\\]{}]"
  private val defaultStopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Punctuation-character count. */
  def punctCount(c: Column): Column =
    coalesce(regexp_count(c, lit(punctRe)), lit(0))

  /** Punctuation-character ratio ∈ [0,1]. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(punctCount(c).cast("double") / length(c))

  /** Count of stopword tokens (exact integer — not ratio-derived). */
  def stopwordCount(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(lower(c)), t => array_contains(sw, t)))
  }

  /** Fraction of tokens that are stopwords — high values indicate natural
    * prose, near-zero indicates tag soup / boilerplate.
    */
  def stopwordRatio(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(lower(c))
    when(size(toks) === 0, 0.0)
      .otherwise(stopwordCount(c, stopwords).cast("double") / size(toks))
  }

  /** Mean token length — degenerate (very low/high) values flag non-text. */
  def meanTokenLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score ∈ [0,1] (length / punctuation / stopword
    * heuristics à la C4/Gopher filtering rules). Deterministic and cheap —
    * one projection, no shuffle.
    *
    * All five ingredients come from ONE pass over the string
    * ([[graft.functions.TextImpl.textStats]], a codegen'd native
    * expression); the score itself is scalar arithmetic, so the whole thing
    * stays inside whole-stage codegen and common-subexpression elimination
    * dedupes the shared stats struct. (Composing this from the HOF-based
    * ratio functions above cost ~12 interpreted regex splits per row and
    * dropped the enclosing Filter out of codegen.) Arithmetic matches the
    * HOF composition bit-for-bit — same int→double divisions, same order
    * of additions and multiplications — so the DuckDB oracle is unchanged.
    */
  def qualityScore(c: Column, minChars: Int = 50, maxChars: Int = 100000): Column = {
    val s      = NativeFunctions.textStats(c)
    val chars  = s.getField("chars")
    val ntoks  = s.getField("tokens")
    val stopRatio = when(ntoks === 0, 0.0)
      .otherwise(s.getField("stopwords").cast("double") / ntoks)
    val punctRatio = when(chars === 0, 0.0)
      .otherwise(s.getField("punct").cast("double") / chars)
    val meanTok = when(ntoks === 0, 0.0)
      .otherwise(s.getField("tok_len_sum").cast("double") / ntoks)
    val lenOk   = (chars >= minChars && chars <= maxChars).cast("double")
    val stopOk  = (stopRatio > 0.05).cast("double")
    val punctOk = (punctRatio < 0.2).cast("double")
    val meanOk  = meanTok.between(2.0, 12.0).cast("double")
    (lenOk * 0.4 + stopOk * 0.3 + punctOk * 0.15 + meanOk * 0.15)
  }

  /** Language-ID by marker-token voting: score each language by how many of
    * its distinctive function words appear (per token), pick the argmax,
    * `und` when nothing matches. N-gram/stopword heuristic as specified in
    * the brief — deterministic and SQL-mirrorable (no model, no UDF).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein"),
    "es" -> Seq("el", "los", "las", "una", "por", "que"),
  )

  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scores = langMarkers.map { case (lang, words) =>
      val w = array(words.map(lit): _*)
      (lang, size(filter(toks, t => array_contains(w, t))))
    }
    // argmax with deterministic first-wins tie-break (declaration order):
    // foldRight makes the first language the outermost `when`.
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** k-word shingles over the normalized text (the MinHash input).
    *
    * Native expression ([[graft.functions.WordShinglesExpr]]): the HOF
    * composition left the token array free inside the window lambda —
    * re-splitting the text once per shingle, O(tokens²) interpreted work
    * per row (the same bug class as the round-4 winnowing bench-killer).
    */
  def wordShingles(c: Column, k: Int = 3): Column =
    NativeFunctions.wordShingles(c, k)

  /** Distinct 64-bit shingle hashes — the set representation used by MinHash
    * and Jaccard verification. Hashing shingles to longs up front keeps every
    * downstream comparison integer-only.
    */
  def shingleHashes(c: Column, k: Int = 3): Column =
    array_distinct(transform(wordShingles(c, k), s => xxhash64(s)))

  /** Character n-gram hash set (for n-gram Jaccard near-dup). Delegates to
    * the native [[graft.functions.CharNgramHashesExpr]] (the production path
    * q40 already uses): the HOF composition re-normalized the text inside
    * the gram lambda — O(len²) per row. The native set is sorted (set
    * semantics; every consumer — Jaccard, MinHash — is order-insensitive).
    */
  def charNgramHashes(c: Column, n: Int = 5): Column =
    NativeFunctions.charNgramHashes(c, n)

  /** Email-address pattern — intersection of Java-regex and RE2 semantics,
    * so Spark and DuckDB (and any RE2 engine) match identical spans.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Contiguous-digit phone/id-number pattern (optionally +-prefixed).
    * Deliberately conservative: formatted numbers with separators are a
    * per-corpus dial; a contiguous 7-15 digit run is the high-precision
    * core that never false-positives on years or small counts.
    */
  val PhonePattern = "\\+?[0-9]{7,15}"

  /** Dotted-quad IPv4 with strict 0–255 octets. Alternatives are ordered
    * longest-first so Java's leftmost-first alternation and RE2's
    * leftmost-longest (DuckDB) pick identical spans.
    */
  val Ipv4Pattern = {
    val octet = "(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9][0-9]|[0-9])"
    s"\\b(?:$octet\\.){3}$octet\\b"
  }

  /** IPv6: the full 8-group form, or a single `::` compression with both a
    * head and a tail (the bare-`::` and leading/trailing-`::` forms collide
    * with timestamp-ish text and are left to a per-corpus dial). No
    * lookaround — RE2 (DuckDB) and Java agree on every span.
    */
  val Ipv6Pattern =
    "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b" +
      "|\\b(?:[0-9A-Fa-f]{1,4}:){1,6}:(?:[0-9A-Fa-f]{1,4}:){0,5}[0-9A-Fa-f]{1,4}\\b"

  /** US SSN shape `ddd-dd-dddd`. `\b` keeps it out of longer digit runs and
    * out of dashed card numbers (whose groups are 4 digits, so every 3-digit
    * prefix inside one is preceded by a digit).
    */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** PII scrub pass (the C4-style pre-training cleanup step): replace
    * emails, Luhn-valid card numbers, IPv6/IPv4 literals, SSN-shaped ids,
    * then contiguous phone-length digit runs, with stable tokens.
    *
    * Order matters and is fixed: email first (its local part may contain
    * digit runs), the Luhn mask second (a contiguous 16-digit PAN would
    * otherwise lose its first 15 digits to the phone pattern), IPs before
    * SSN/phone (dotted/coloned groups must not be judged as digit runs).
    * Everything is a codegen'd projection — five `regexp_replace`s plus the
    * native [[graft.functions.MaskLuhnExpr]] pass, no shuffle, no UDF;
    * composes with scan pushdown like any other narrow transform.
    */
  def maskPii(
      c: Column,
      emailToken: String = "<EMAIL>",
      phoneToken: String = "<PHONE>",
      ccToken: String = "<CC>",
      ipToken: String = "<IP>",
      ssnToken: String = "<SSN>",
  ): Column = {
    val e  = regexp_replace(c, EmailPattern, emailToken)
    val cc = NativeFunctions.maskCreditCards(e, ccToken)
    val i6 = regexp_replace(cc, Ipv6Pattern, ipToken)
    val i4 = regexp_replace(i6, Ipv4Pattern, ipToken)
    val ss = regexp_replace(i4, SsnPattern, ssnToken)
    regexp_replace(ss, PhonePattern, phoneToken)
  }

  /** Exact Jaccard similarity of two pre-hashed sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni   = size(array_union(a, b)).cast("double")
    when(uni === 0, 1.0).otherwise(inter / uni)
  }

  /** Gopher-style repetition signal: the fraction of word k-shingles that
    * are duplicates within the document (1 − distinct/total). High values
    * flag boilerplate loops and degenerate generations; one projection, no
    * shuffle, fully SQL-mirrorable.
    */
  def repeatedShingleFraction(c: Column, k: Int = 3): Column = {
    val sh = wordShingles(c, k)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03
    * — "Winnowing: Local Algorithms for Document Fingerprinting"): hash every
    * k-char gram of the normalized text, slide a window of w consecutive gram
    * hashes, keep each window's minimum, dedup. Guarantee: any match of
    * length ≥ w + k − 1 between two documents shares at least one
    * fingerprint, so fingerprint-equality joins find copied passages without
    * all-pairs comparison (group by fingerprint = one shuffle).
    *
    * Hashes are the first 8 hex chars of md5 — fixed-length lowercase hex
    * compares lexicographically the same as numerically, and both Spark and
    * DuckDB compute identical md5, so the operator is oracle-mirrorable
    * end-to-end. Texts shorter than k yield one whole-text fingerprint.
    *
    * Implemented as a native codegen'd expression
    * ([[graft.functions.WinnowFingerprintsExpr]]): the HOF composition this
    * replaces re-evaluated the whole gram-hash array inside the
    * sliding-window lambda — O(len²) interpreted md5s per row, which timed
    * out the round-4 bench. Semantics (and the q62 oracle) are unchanged.
    */
  def winnowFingerprints(c: Column, k: Int = 8, w: Int = 4): Column =
    NativeFunctions.winnowFingerprints(c, k, w)

  /** HTML → plain text (WET-style extraction): drop script/style blocks,
    * strip tags, decode the six ubiquitous entities, collapse whitespace.
    * Native codegen'd expression ([[graft.functions.HtmlToTextExpr]]); the
    * exact step chain is documented on [[graft.functions.TextImpl.htmlToText]]
    * so a SQL oracle can mirror it with RE2 regexes.
    */
  def htmlToText(c: Column): Column = NativeFunctions.htmlToText(c)

  /** Intra-document exact line dedup (RefinedWeb-style): keep blank lines and
    * the first occurrence of every non-blank line, drop later exact repeats.
    * Per-row scan-speed projection ([[graft.functions.DedupLinesExpr]]) — the
    * corpus-level frequent-line remover is
    * [[graft.dedup.Dedup.stripBoilerplateLines]].
    */
  def dedupLines(c: Column): Column = NativeFunctions.dedupLines(c)

  /** Text sanitization: strip control + zero-width characters, normalize line
    * endings, collapse space/tab runs, drop trailing per-line spaces, cap
    * blank-line runs at one, trim. Fixed RE2-mirrorable chain documented on
    * [[graft.functions.TextImpl.sanitize]].
    */
  def sanitizeText(c: Column): Column = NativeFunctions.sanitizeText(c)
}
