package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics as a native (codegen'd) expression.
  *
  * [[TextFunctions.qualityScore]] composed from higher-order functions costs
  * ~12 regex splits per row AND drops the containing Filter/Project out of
  * whole-stage codegen (HOFs have no doGenCode), which also disables
  * common-subexpression elimination — measured in the q37 plan as an
  * interpreted Filter recomputing `split()` ten times per row. This
  * expression computes every ingredient (char count, token count, stopword
  * hits, punctuation chars, token-length sum) in ONE scan of the string; the
  * downstream score arithmetic is plain scalar math that codegens, and CSE
  * dedupes the shared struct.
  *
  * Semantics EXACTLY mirror the Column compositions (and the DuckDB
  * oracles): `trim` strips ASCII spaces only (Spark/DuckDB trim), the token
  * split follows Java `split("\\s+")` — including the leading empty token
  * when the trimmed text starts with non-space whitespace — and stopword
  * membership tests the lowercased token.
  */
object TextImpl {

  val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
      "for", "on", "with", "as").foreach(s.add)
    s
  }

  private final val Punct = ".,;:!?'\"()[]{}"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** (chars, tokens, stopwords, punct, tokLenSum) in one pass. */
  def textStats(u: UTF8String): InternalRow = {
    val str   = u.toString
    val chars = u.numChars()
    var punct = 0
    var i     = 0
    while (i < str.length) {
      if (Punct.indexOf(str.charAt(i)) >= 0) punct += 1
      i += 1
    }
    // trim ASCII spaces only — Spark SQL trim(), not java.lang.String#trim
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    val t = str.substring(lo, hi)

    var tokens = 0
    var stop   = 0
    var tokLen = 0L
    if (t.nonEmpty) {
      var p = 0
      if (isWs(t.charAt(0))) {
        // Java split("\s+") emits a leading empty token when the input
        // starts with a separator
        tokens += 1
        while (p < t.length && isWs(t.charAt(p))) p += 1
      }
      while (p < t.length) {
        var q = p
        while (q < t.length && !isWs(t.charAt(q))) q += 1
        val tok = t.substring(p, q)
        tokens += 1
        tokLen += tok.codePointCount(0, tok.length)
        if (Stopwords.contains(tok.toLowerCase(Locale.ROOT))) stop += 1
        p = q
        while (p < t.length && isWs(t.charAt(p))) p += 1
      }
    }
    new GenericInternalRow(Array[Any](chars, tokens, stop, punct, tokLen))
  }

  /** `regexp_replace(lower(trim(c)), "\s+", " ")` — the exact
    * [[TextFunctions.normalizeText]] semantics in one pass: trim strips ASCII
    * spaces only (Spark SQL trim), lowercase via UTF8String (same unicode
    * mapping Spark's `lower` uses), then runs of Java-regex `\s`
    * (space/tab/NL/VT/FF/CR) collapse to a single space. Leading/trailing
    * non-space whitespace therefore survives as a single leading/trailing
    * space, exactly as the Column composition (and the DuckDB oracles that
    * mirror it) produce.
    */
  def normalize(u: UTF8String): String = {
    val lowered = u.trim().toLowerCase().toString
    var needs = false
    var i     = 0
    while (i < lowered.length && !needs) {
      val c = lowered.charAt(i)
      if (isWs(c) && (c != ' ' || (i + 1 < lowered.length && isWs(lowered.charAt(i + 1)))))
        needs = true
      i += 1
    }
    if (!needs) lowered
    else {
      val sb = new java.lang.StringBuilder(lowered.length)
      var j  = 0
      while (j < lowered.length) {
        val c = lowered.charAt(j)
        if (isWs(c)) {
          sb.append(' ')
          while (j < lowered.length && isWs(lowered.charAt(j))) j += 1
        } else { sb.append(c); j += 1 }
      }
      sb.toString
    }
  }

  /** k-word shingles with the exact
    * `tokens(normalizeText(c))`-then-`concat_ws` Column semantics
    * ([[TextFunctions.wordShingles]]): normalize (trim spaces, lower,
    * collapse `\s+` runs), re-trim the single leading/trailing space a
    * non-space whitespace edge leaves behind, split on the single spaces —
    * so no empty tokens ever — then join each k-window with spaces. Fewer
    * than k tokens → one whole-text shingle (empty string for blank input,
    * like `concat_ws` over an empty array).
    *
    * Same O(len²) HOF story as winnowing: the Column version left `toks`
    * free inside the window lambda, re-splitting the text once per shingle.
    */
  def wordShingles(u: UTF8String, k: Int): ArrayData = {
    val norm = normalize(u)
    var lo   = 0
    var hi   = norm.length
    if (hi > lo && norm.charAt(lo) == ' ') lo += 1
    if (hi > lo && norm.charAt(hi - 1) == ' ') hi -= 1
    val core = norm.substring(lo, hi)
    val toks: Array[String] =
      if (core.isEmpty) Array.empty[String] else core.split(" ")
    if (toks.length < k) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val n   = toks.length - k + 1
      val out = new Array[Any](n)
      val sb  = new java.lang.StringBuilder(64)
      var i   = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private final val HexChars = "0123456789abcdef".toCharArray

  private def hex8(v: Int): UTF8String = {
    val out = new Array[Byte](8)
    var i   = 0
    while (i < 8) {
      out(i) = HexChars((v >>> (28 - 4 * i)) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03) in ONE pass: md5 every k-char gram of the normalized text,
    * slide a window of w gram hashes keeping each window's min (monotonic
    * deque — O(n) total, not O(n·w)), dedup preserving first occurrence.
    *
    * Exactly mirrors the former Column composition (and the q62 DuckDB
    * oracle): hashes are the FIRST 8 HEX CHARS of md5 — i.e. the first 4
    * digest bytes — which compare lexicographically the same as unsigned
    * 32-bit ints, so the sliding min runs on ints and hex is rendered only
    * for the surviving fingerprints. Grams are code-point substrings
    * (Spark `substr`/`length` count code points); each gram's md5 is taken
    * over its UTF-8 bytes, which are a contiguous slice of the normalized
    * text's UTF-8 bytes — one `getBytes` for the whole document, zero
    * per-gram string allocation.
    *
    * The Column/HOF version re-evaluated the whole gram-hash array inside
    * the sliding-window lambda (Spark HOFs re-evaluate non-lambda-variable
    * subexpressions per invocation): O(len²) interpreted md5s per row,
    * 472 s for 500 ~300-char docs. This is the same round-2 lesson as
    * [[graft.functions.HashImpl]] — single tree node, one tight JVM loop.
    */
  def winnowFingerprints(u: UTF8String, k: Int, w: Int): ArrayData = {
    val norm  = normalize(u)
    val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md    = md5Local.get()

    // code-point count + UTF-8 byte offset of each code point
    val byteOff = new Array[Int](norm.length + 1)
    var cp = 0
    var b  = 0
    var ci = 0
    while (ci < norm.length) {
      byteOff(cp) = b
      val code = norm.codePointAt(ci)
      b += (if (code < 0x80) 1 else if (code < 0x800) 2 else if (code < 0x10000) 3 else 4)
      ci += Character.charCount(code)
      cp += 1
    }
    byteOff(cp) = bytes.length

    def first4(d: Array[Byte]): Int =
      ((d(0) & 0xFF) << 24) | ((d(1) & 0xFF) << 16) | ((d(2) & 0xFF) << 8) | (d(3) & 0xFF)

    val nGrams = if (cp <= k) 1 else cp - k + 1
    val hs     = new Array[Int](nGrams)
    if (cp <= k) {
      md.reset(); md.update(bytes)
      hs(0) = first4(md.digest())
    } else {
      var i = 0
      while (i < nGrams) {
        md.reset(); md.update(bytes, byteOff(i), byteOff(i + k) - byteOff(i))
        hs(i) = first4(md.digest())
        i += 1
      }
    }

    val fps = new java.util.LinkedHashSet[Integer]()
    if (nGrams <= w) {
      var min = hs(0)
      var i   = 1
      while (i < nGrams) {
        if (java.lang.Integer.compareUnsigned(hs(i), min) < 0) min = hs(i)
        i += 1
      }
      fps.add(min)
    } else {
      // monotonic deque of indices: front = min of current window
      val deque = new Array[Int](nGrams)
      var head  = 0
      var tail  = 0 // exclusive
      var i     = 0
      while (i < nGrams) {
        while (tail > head && java.lang.Integer.compareUnsigned(hs(deque(tail - 1)), hs(i)) >= 0)
          tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) fps.add(hs(deque(head)))
        i += 1
      }
    }

    val out = new Array[Any](fps.size())
    val it  = fps.iterator()
    var o   = 0
    while (it.hasNext) { out(o) = hex8(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct XXH64 hashes of every k-codepoint window of the NORMALIZED
    * text (the whole normalized text when shorter) — the exact-dial
    * counterpart of [[winnowFingerprints]]: window density 1 instead of
    * ~2/(w+1), and 64-bit keys so a corpus-scale self-join on them is
    * collision-safe. Shared hash ⟺ shared `k`-char normalized substring
    * (modulo ~2⁻⁶⁴), which is what [[graft.dedup.Dedup.substringDupPairs]]
    * joins on. Same normalization and code-point windowing as the
    * winnowing path, so winnow candidates verify exactly against these.
    */
  def windowHashes64(u: UTF8String, k: Int): ArrayData = {
    val norm  = normalize(u)
    val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    val byteOff = new Array[Int](norm.length + 1)
    var cp = 0
    var b  = 0
    var ci = 0
    while (ci < norm.length) {
      byteOff(cp) = b
      val code = norm.codePointAt(ci)
      b += (if (code < 0x80) 1 else if (code < 0x800) 2 else if (code < 0x10000) 3 else 4)
      ci += Character.charCount(code)
      cp += 1
    }
    byteOff(cp) = bytes.length

    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (cp <= k) {
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromBytes(bytes, 0, bytes.length), 42L))
    } else {
      var i = 0
      while (i + k <= cp) {
        val off = byteOff(i)
        seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromBytes(bytes, off, byteOff(i + k) - off), 42L))
        i += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it  = seen.iterator()
    var o   = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** XXH64 hash of EVERY k-codepoint window of the NORMALIZED text, by
    * start position (index i = window starting at codepoint i; empty when
    * the text is shorter than k — sub-minLen docs carry no cuttable
    * span). The positional, non-deduplicated counterpart of
    * [[windowHashes64]], for [[graft.dedup.Dedup.removeSharedSubstrings]]
    * which needs to know WHERE a shared window sits, not just that one
    * exists.
    */
  def windowHashSeq(u: UTF8String, k: Int): ArrayData = {
    val norm  = normalize(u)
    val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val byteOff = new Array[Int](norm.length + 1)
    var cp = 0
    var b  = 0
    var ci = 0
    while (ci < norm.length) {
      byteOff(cp) = b
      val code = norm.codePointAt(ci)
      b += (if (code < 0x80) 1 else if (code < 0x800) 2 else if (code < 0x10000) 3 else 4)
      ci += Character.charCount(code)
      cp += 1
    }
    byteOff(cp) = bytes.length
    if (cp < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cp - k + 1)
    var i = 0
    while (i + k <= cp) {
      val off = byteOff(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromBytes(bytes, off, byteOff(i + k) - off), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The NORMALIZED text with the union of [p, p+k-1] codepoint intervals
    * removed, for each start position p in `positions` (unsorted, possibly
    * overlapping — coverage is computed with a difference array, O(chars +
    * positions)). Empty `positions` returns the normalized text unchanged,
    * so the same projection serves cut and uncut documents.
    */
  def cutWindows(u: UTF8String, positions: ArrayData, k: Int): UTF8String = {
    val norm = normalize(u)
    if (norm.isEmpty) return UTF8String.fromString("")
    val cps = norm.codePoints().toArray
    val cp  = cps.length
    val n   = positions.numElements()
    if (n == 0) return UTF8String.fromString(norm)
    val diff = new Array[Int](cp + 1)
    var i = 0
    while (i < n) {
      val p = positions.getInt(i)
      if (p >= 0 && p < cp) {
        diff(p) += 1
        diff(math.min(p + k, cp)) -= 1
      }
      i += 1
    }
    val sb  = new java.lang.StringBuilder(cp)
    var cov = 0
    var j   = 0
    while (j < cp) {
      cov += diff(j)
      if (cov == 0) sb.appendCodePoint(cps(j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Luhn checksum (ISO/IEC 7812) over the digits of `s`, ignoring single
    * space/dash group separators. False unless the digit count is a
    * plausible PAN length (13–19).
    */
  def luhnValid(u: UTF8String): Boolean = {
    val s      = u.toString
    var sum    = 0
    var digits = 0
    // Luhn doubles every second digit FROM THE RIGHT, so scan right-to-left.
    var i = s.length - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if ((digits & 1) == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        digits += 1
      } else if (c != ' ' && c != '-') {
        return false
      }
      i -= 1
    }
    digits >= 13 && digits <= 19 && sum % 10 == 0
  }

  /** Mask card-number-shaped spans that pass the Luhn check.
    *
    * A candidate is a maximal run of digit groups joined by single `' '` or
    * `'-'` separators — `4111 1111 1111 1111`, `4111-1111-1111-1111`, or the
    * contiguous `4111111111111111` — bounded by non-alphanumeric characters
    * (the `\b`-for-digits rule: `x4111…` or `…1111y` is an identifier, not a
    * PAN). A run whose total digit count is 13–19 AND whose Luhn checksum is
    * 0 mod 10 is replaced by `token`; everything else is copied through
    * untouched, so Luhn-invalid look-alikes survive for the downstream
    * (regex) masks to judge.
    *
    * Single pass, no regex, no allocation unless a mask fires. A pure regex
    * cannot express the Luhn gate — this is the native-expression case the
    * survey's function-preference order reserves for semantics `functions._`
    * can't reach.
    */
  def maskLuhn(u: UTF8String, token: UTF8String): UTF8String = {
    val s = u.toString
    var sb: java.lang.StringBuilder = null // lazily created on first mask
    def isDigit(c: Char)            = c >= '0' && c <= '9'
    def isAlnum(c: Char) =
      isDigit(c) || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    var i    = 0 // scan position
    var emit = 0 // start of the pending not-yet-copied region
    while (i < s.length) {
      val boundary = i == 0 || !isAlnum(s.charAt(i - 1))
      if (boundary && isDigit(s.charAt(i))) {
        // consume digits (sep digits)* greedily
        val start = i
        var digits = 0
        while (i < s.length && isDigit(s.charAt(i))) { digits += 1; i += 1 }
        while (i + 1 < s.length &&
          (s.charAt(i) == ' ' || s.charAt(i) == '-') && isDigit(s.charAt(i + 1))) {
          i += 1 // separator
          while (i < s.length && isDigit(s.charAt(i))) { digits += 1; i += 1 }
        }
        val endBoundary = i >= s.length || !isAlnum(s.charAt(i))
        if (endBoundary && digits >= 13 && digits <= 19 &&
          luhnValid(UTF8String.fromString(s.substring(start, i)))) {
          if (sb == null) sb = new java.lang.StringBuilder(s.length)
          sb.append(s, emit, start).append(token.toString)
          emit = i
        }
        // not a valid PAN: leave the span for later masks; scanning resumes
        // after it (inner digits can't start a candidate anyway — no boundary)
      } else {
        i += 1
      }
    }
    if (sb == null) u
    else {
      sb.append(s, emit, s.length)
      UTF8String.fromString(sb.toString)
    }
  }

  // --- HTML → text extraction -----------------------------------------------
  // The pipeline is a FIXED transformation chain so a SQL oracle can mirror
  // it step for step (every construct below is RE2-compatible: no
  // backreferences, no lookaround):
  //   1. drop <script…>…</script> and <style…>…</style> blocks (lazy, dotall,
  //      case-insensitive) — an unclosed block keeps its contents, only the
  //      tags are stripped by step 2, same as the regex chain;
  //   2. every remaining <…> tag → one space;
  //   3. decode the six ubiquitous entities, in this order:
  //      &nbsp; &lt; &gt; &quot; &#39; &amp; (amp LAST, so '&amp;lt;'
  //      decodes to '&lt;' the literal text, per the standard argument);
  //   4. collapse [ \t\n\r\f]+ runs to one space ('\s' is avoided: Java and
  //      RE2 disagree on \x0B membership), trim ASCII spaces.
  private val ScriptRe = java.util.regex.Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val StyleRe  = java.util.regex.Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val TagRe    = java.util.regex.Pattern.compile("<[^>]*>")
  private val WsRunRe  = java.util.regex.Pattern.compile("[ \t\n\r\f]+")

  def htmlToText(u: UTF8String): UTF8String = {
    var s = u.toString
    s = ScriptRe.matcher(s).replaceAll(" ")
    s = StyleRe.matcher(s).replaceAll(" ")
    s = TagRe.matcher(s).replaceAll(" ")
    s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    s = WsRunRe.matcher(s).replaceAll(" ")
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    UTF8String.fromString(s.substring(lo, hi))
  }

  // --- intra-document line dedup --------------------------------------------
  /** RefinedWeb-style intra-document exact line dedup: split on '\n', always
    * keep blank lines (spaces/tabs/CR only — they carry paragraph structure,
    * not content), keep the FIRST occurrence of every non-blank line, drop
    * later exact repeats, re-join with '\n'. One pass, O(lines) per document
    * via a per-row HashSet — the corpus-level twin is
    * [[graft.dedup.Dedup.stripBoilerplateLines]], which needs a shuffle;
    * this one runs at scan speed inside whole-stage codegen.
    *
    * Oracle-mirrorable: unnest lines WITH ORDINALITY, keep blank-or-first
    * rows, string_agg back in ordinal order (SparkEntry q121).
    */
  def dedupLines(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('\n') < 0) return u
    val lines = s.split("\n", -1)
    val seen  = new java.util.HashSet[String](lines.length * 2)
    val sb    = new java.lang.StringBuilder(s.length)
    var first = true
    var i     = 0
    while (i < lines.length) {
      val line = lines(i)
      if (isBlankLine(line) || seen.add(line)) {
        if (!first) sb.append('\n')
        sb.append(line)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def isBlankLine(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != ' ' && c != '\t' && c != '\r') return false
      i += 1
    }
    true
  }

  // --- text sanitization ----------------------------------------------------
  // A FIXED cleanup chain (each step RE2-expressible, so a SQL oracle mirrors
  // it step for step — SparkEntry q123):
  //   1. drop control chars (C0 minus \t\n\r, plus DEL) and the zero-width
  //      set U+200B..U+200D, U+FEFF (ZWSP/ZWNJ/ZWJ/BOM);
  //   2. normalize line endings: CRLF → LF, lone CR → LF;
  //   3. collapse space/tab runs to one space;
  //   4. strip the (now single) trailing space before each newline;
  //   5. collapse 3+ newline runs to exactly two (one blank line —
  //      paragraph breaks survive, vertical padding doesn't);
  //   6. trim leading/trailing spaces and newlines.
  private val CtrlRe = java.util.regex.Pattern.compile(
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u200B-\\u200D\\uFEFF]")
  private val SpaceTabRunRe = java.util.regex.Pattern.compile("[ \t]+")
  private val ParaRunRe     = java.util.regex.Pattern.compile("\n{3,}")

  def sanitize(u: UTF8String): UTF8String = {
    var s = u.toString
    s = CtrlRe.matcher(s).replaceAll("")
    s = s.replace("\r\n", "\n").replace('\r', '\n')
    s = SpaceTabRunRe.matcher(s).replaceAll(" ")
    s = s.replace(" \n", "\n")
    s = ParaRunRe.matcher(s).replaceAll("\n\n")
    var lo = 0
    var hi = s.length
    while (lo < hi && (s.charAt(lo) == ' ' || s.charAt(lo) == '\n')) lo += 1
    while (hi > lo && (s.charAt(hi - 1) == ' ' || s.charAt(hi - 1) == '\n')) hi -= 1
    UTF8String.fromString(s.substring(lo, hi))
  }
}

/** HTML → plain text as a single codegen'd tree node — see
  * [[TextImpl.htmlToText]] for the exact (oracle-mirrorable) semantics.
  * The WET-extraction step of a CommonCrawl-style pipeline: runs at scan
  * speed inside whole-stage codegen, payload never leaves the task.
  */
case class HtmlToTextExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.htmlToText(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.htmlToText($c)"
  override protected def withNewChildInternal(newChild: Expression): HtmlToTextExpr =
    copy(child = newChild)
}

/** k-word shingles as a single codegen'd tree node — see
  * [[TextImpl.wordShingles]].
  */
case class WordShinglesExpr(child: Expression, k: Int) extends GraftUnaryCodegen {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.wordShingles(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.wordShingles($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** Winnowing fingerprints as a single codegen'd tree node — see
  * [[TextImpl.winnowFingerprints]] for semantics and the O(len²)-HOF story.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int) extends GraftUnaryCodegen {
  require(k >= 1 && w >= 1, "k and w must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.winnowFingerprints($c, $k, $w)"
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

/** All k-window 64-bit hashes as a single codegen'd tree node — see
  * [[TextImpl.windowHashes64]].
  */
case class WindowHashes64Expr(child: Expression, k: Int) extends GraftUnaryCodegen {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.windowHashes64(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.windowHashes64($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): WindowHashes64Expr =
    copy(child = newChild)
}

/** Positional window hashes — see [[TextImpl.windowHashSeq]]. */
case class WindowHashSeqExpr(child: Expression, k: Int) extends GraftUnaryCodegen {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.windowHashSeq(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.windowHashSeq($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): WindowHashSeqExpr =
    copy(child = newChild)
}

/** Normalized text minus covered windows — see [[TextImpl.cutWindows]]. */
case class CutWindowsExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(text: Any, positions: Any): Any =
    TextImpl.cutWindows(text.asInstanceOf[UTF8String], positions.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.TextImpl.cutWindows($t, $p, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutWindowsExpr =
    copy(left = newLeft, right = newRight)
}

case class TextStatsExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = TextStatsExpr.schema
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.textStats(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.textStats($c)"
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("stopwords", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false),
  ))
}

/** Luhn-checksum validity (13–19 digits, single space/dash separators) —
  * see [[TextImpl.luhnValid]].
  */
case class LuhnValidExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.luhnValid(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.luhnValid($c)"
  override protected def withNewChildInternal(newChild: Expression): LuhnValidExpr =
    copy(child = newChild)
}

/** Replace Luhn-valid card-number spans with `token` — one codegen'd pass;
  * see [[TextImpl.maskLuhn]] for the candidate grammar.
  */
case class MaskLuhnExpr(child: Expression, token: String) extends GraftUnaryCodegen {
  private val tokenUtf8 = UTF8String.fromString(token)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.maskLuhn(input.asInstanceOf[UTF8String], tokenUtf8)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tok = ctx.addReferenceObj("maskToken", tokenUtf8, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.maskLuhn($c, $tok)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): MaskLuhnExpr =
    copy(child = newChild)
}

/** Intra-document exact line dedup as a single codegen'd tree node — see
  * [[TextImpl.dedupLines]] for the keep-first / keep-blank semantics.
  */
case class DedupLinesExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.dedupLines(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.dedupLines($c)"
  override protected def withNewChildInternal(newChild: Expression): DedupLinesExpr =
    copy(child = newChild)
}

/** Text sanitization (control/zero-width strip + whitespace normalization)
  * as a single codegen'd tree node — see [[TextImpl.sanitize]] for the fixed
  * RE2-mirrorable cleanup chain.
  */
case class SanitizeTextExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextImpl.sanitize(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextImpl.sanitize($c)"
  override protected def withNewChildInternal(newChild: Expression): SanitizeTextExpr =
    copy(child = newChild)
}
