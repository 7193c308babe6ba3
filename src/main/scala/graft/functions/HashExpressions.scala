package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) Catalyst expressions for the dedup / similarity hot
  * paths.
  *
  * Round-2 lesson: composing these out of higher-order functions
  * (`transform`/`aggregate`) made the expression TREE O(numHashes) — 128
  * nested HOFs for MinHash, 64 for SimHash — which cost 200–440 s of
  * Catalyst/janino compilation per query and then evaluated interpreted per
  * row. Each expression here is a single tree node whose eval is one tight
  * JVM loop; `doGenCode` emits a plain static call so the surrounding
  * projection stays inside whole-stage codegen.
  *
  * Hash compatibility: shingle/token hashing uses the same XXH64-with-seed-42
  * as Spark's builtin `xxhash64`, so these sets interoperate with the Column
  * compositions in [[TextFunctions]] (`shingleHashes`, `jaccard`).
  */
object HashImpl {
  final val Seed = 42L

  /** `lower(trim(s))` + whitespace-split — matches
    * `TextFunctions.tokens(normalizeText(c))` for ASCII input. Blank → empty.
    */
  def tokenize(s: UTF8String): Array[String] = {
    val t = s.toString.trim
    if (t.isEmpty) Array.empty[String]
    else t.toLowerCase(Locale.ROOT).split("\\s+")
  }

  private def hashString(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), Seed)

  private def distinctSorted(hs: Array[Long], n: Int): ArrayData = {
    val a = java.util.Arrays.copyOf(hs, n)
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(a, w))
  }

  /** Distinct xxhash64 values of the k-word shingles of `text` (sorted —
    * set semantics; order is irrelevant to Jaccard/MinHash downstream).
    * Fewer than k tokens → one whole-text shingle, like
    * `TextFunctions.wordShingles`.
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) {
      new GenericArrayData(Array(hashString(toks.mkString(" "))))
    } else {
      val n  = toks.length - k + 1
      val hs = new Array[Long](n)
      val sb = new java.lang.StringBuilder(64)
      var i  = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        hs(i) = hashString(sb.toString)
        i += 1
      }
      distinctSorted(hs, n)
    }
  }

  /** Distinct xxhash64 values of character n-grams of the normalized text. */
  def charNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val norm = toks.mkString(" ")
    if (norm.length <= n) {
      new GenericArrayData(Array(hashString(norm)))
    } else {
      val cnt = norm.length - n + 1
      val hs  = new Array[Long](cnt)
      var i   = 0
      while (i < cnt) {
        hs(i) = hashString(norm.substring(i, i + n))
        i += 1
      }
      distinctSorted(hs, cnt)
    }
  }

  /** One-permutation MinHash with rotation densification (Li, Owen & Zhang
    * NIPS'12; Shrivastava & Li ICML'14): ONE pass over the set fills `m`
    * buckets (element → bucket h mod m, value = rehash(h)); an empty bucket
    * borrows from its nearest non-empty right neighbour, offset-penalized so
    * borrowed values stay distinct across distances. O(|set| + m) vs the
    * classic m×|set| — the 128× factor round 2 paid is gone.
    */
  def minHashSignature(sh: ArrayData, m: Int): ArrayData = {
    val sig   = new Array[Long](m)
    val empty = new Array[Boolean](m)
    java.util.Arrays.fill(sig, Long.MaxValue)
    java.util.Arrays.fill(empty, true)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      // bucket by a REHASH, not `h mod m`: structured inputs (e.g. values
      // sharing low bits) would otherwise cluster into few buckets and
      // bias the densified estimate. Different seed than the value hash
      // keeps bucket and value independent.
      val b = (((XXH64.hashLong(h, 0x27d4eb2f) % m).toInt + m) % m)
      val v = XXH64.hashLong(h, Seed)
      if (v < sig(b)) sig(b) = v
      empty(b) = false
      i += 1
    }
    if (n > 0) {
      var j = 0
      while (j < m) {
        if (empty(j)) {
          var d = 1
          while (empty((j + d) % m)) d += 1
          sig(j) = sig((j + d) % m) + d * 0x9E3779B97F4A7C15L
        }
        j += 1
      }
    } else {
      var j = 0
      while (j < m) { sig(j) = XXH64.hashLong(j.toLong, Seed); j += 1 }
    }
    new GenericArrayData(sig)
  }

  /** Per-band bucket ids: band b = xxhash64 fold of signature rows
    * [b*r, (b+1)*r) plus the band index — one array out, one pass in.
    */
  def bandBuckets(sig: ArrayData, bands: Int): ArrayData = {
    val m   = sig.numElements()
    val r   = m / bands
    val out = new Array[Long](bands)
    var b   = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, Seed)
      var j = b * r
      val e = j + r
      while (j < e) { h = XXH64.hashLong(sig.getLong(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens — one pass, 64 counters.
    * Bit i set ⇔ the token-hash-bit-i vote is non-negative (matches the
    * round-2 Column semantics, including all-bits-set for empty text).
    */
  def simHash64(text: UTF8String): Long = {
    val toks  = tokenize(text)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = hashString(toks(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sim = 0L
    var i   = 0
    while (i < 64) {
      if (votes(i) >= 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit SimHash with an md5-derived token hash — bit-for-bit mirrorable
    * in portable SQL (DuckDB: `('0x' || substring(md5(tok), 1, 16))::UBIGINT`
    * is exactly "first 8 md5 bytes, big-endian"), which makes SimHash
    * near-dup output oracle-checkable end-to-end. Same tokenizer and vote
    * semantics as [[simHash64]] — including all-bits-set for token-less
    * text — only the per-token hash differs. The xxhash variant stays the
    * throughput default (md5 is ~10× costlier per token); the ALGORITHM
    * under test is identical either way, so the oracle on this variant
    * covers the vote/packing/blocking logic both variants share.
    */
  def simHash64Md5(text: UTF8String): Long = {
    val toks  = tokenize(text)
    val votes = new Array[Int](64)
    val md    = md5Local.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sim = 0L
    var i   = 0
    while (i < 64) {
      if (votes(i) >= 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer — deterministic ±1 hyperplane weights, no RNG
    // state and no broadcast weight matrix.
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Sign-random-projection LSH bucket (Charikar 2002): `bits` sign bits of
    * projections onto seeded ±1 hyperplanes, packed into a long. One pass
    * over the vector per plane — bits×dim multiply-adds, no HOFs.
    */
  def srpBucket(vec: ArrayData, bits: Int, seed: Long): Long = {
    val dim    = vec.numElements()
    var bucket = 0L
    var i      = 0
    while (i < bits) {
      var acc  = 0.0
      val base = mix64(seed ^ (i.toLong * 0xC2B2AE3D27D4EB4FL))
      var j    = 0
      while (j < dim) {
        val w = if ((mix64(base ^ j.toLong) & 1L) == 1L) 1.0 else -1.0
        acc += w * vec.getFloat(j)
        j += 1
      }
      if (acc >= 0.0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  /** Dot product of two float vectors, accumulated left-to-right in double —
    * the same FP op sequence as the `zip_with`/`aggregate` Column version
    * (and the DuckDB oracle), so results are bit-identical.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Dot product over DOUBLE arrays, accumulated left-to-right from 0.0 —
    * the exact FP op sequence of `aggregate(zip_with(a, b, (x, y) => x·y),
    * 0.0, (acc, x) => acc + x)` on equal-length arrays, so swapping that
    * HOF pair for this codegen'd loop is bit-identical (round 16 — the
    * clustering pair join's inner loop; callers guard unequal lengths,
    * where the HOF form yields null).
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Threshold levenshtein — semantics of Spark's 3-arg
    * `levenshtein(a, b, d)` (distance when ≤ d, else −1), with the two
    * exact shortcuts the built-in skips (round 17, guide §1.2 — q159's
    * phase profile put ~2.9 s of the 3.5 s slot in 742 k built-in calls):
    *
    *  1. COMMON PREFIX/SUFFIX TRIM: edit distance is invariant under
    *     removing a shared prefix and then a shared suffix of the
    *     remainder (any optimal alignment maps equal flanks to matches) —
    *     blocked fuzzy-join candidates share their whole blocking key by
    *     construction, so the DP typically shrinks from |s|² to a few
    *     cells.
    *  2. BANDED DP: cells with |i−j| > d cannot reach a distance ≤ d, so
    *     each column evaluates ≤ 2d+1 cells (Ukkonen's bound).
    *
    * The fast path requires pure-ASCII bytes (bytes = code points, so
    * byte-wise trim/DP equals the built-in's code-point DP); anything else
    * delegates to `UTF8String.levenshteinDistance(other, d)` — the exact
    * kernel the built-in calls. LevThreshSpec pins equality against the
    * built-in across ASCII/unicode/empty/null shapes and d = 0..3.
    */
  def levThresh(a: UTF8String, b: UTF8String, d: Int): Int = {
    if (d < 0) return -1
    val ab = a.getBytes
    val bb = b.getBytes
    var i  = 0
    while (i < ab.length) { if ((ab(i) & 0x80) != 0) return a.levenshteinDistance(b, d); i += 1 }
    i = 0
    while (i < bb.length) { if ((bb(i) & 0x80) != 0) return a.levenshteinDistance(b, d); i += 1 }
    val la   = ab.length
    val lb   = bb.length
    var lo   = 0
    val minL = math.min(la, lb)
    while (lo < minL && ab(lo) == bb(lo)) lo += 1
    var ea = la
    var eb = lb
    while (ea > lo && eb > lo && ab(ea - 1) == bb(eb - 1)) { ea -= 1; eb -= 1 }
    // DP over the trimmed middles; put the shorter on the row axis
    var m = ea - lo
    var n = eb - lo
    var s = ab; var so = lo
    var t = bb; var to = lo
    if (m > n) {
      val tm = m; m = n; n = tm
      val ts = s; s = t; t = ts
      val tmo = so; so = to; to = tmo
    }
    if (n - m > d) return -1
    if (m == 0) return n // n - m <= d here, so n <= d
    val inf  = d + 1
    var prev = new Array[Int](m + 1)
    var cur  = new Array[Int](m + 1)
    i = 0
    while (i <= m) { prev(i) = if (i <= d) i else inf; i += 1 }
    var j = 1
    while (j <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (j <= d) j else inf
      val from  = math.max(1, j - d)
      val until = math.min(m, j + d)
      var k = from
      while (k <= until) {
        val cost = if (s(so + k - 1) == t(to + j - 1)) 0 else 1
        var v    = prev(k - 1) + cost
        val del  = prev(k) + 1
        val ins  = cur(k - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        cur(k) = if (v > d) inf else v
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    if (prev(m) > d) -1 else prev(m)
  }

  /** Cosine similarity; 0 when either vector has zero norm.
    *
    * One fused pass (round 17, guide §1.2 per-task work): the three dot
    * products (a·b, a·a, b·b) accumulate in one loop over the arrays
    * instead of three separate [[dotF]] walks — each accumulator still
    * sums ITS products left-to-right in index order from 0.0, so every
    * intermediate and the final value are bit-identical to the
    * three-call form (and to the oracle's replay); only array traffic
    * and loop overhead drop ~3×. The self-dots run over each array's
    * FULL length while a·b stops at the shorter, exactly as before.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    val n  = math.min(la, lb)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i  = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    while (i < la) { val x = a.getFloat(i).toDouble; aa += x * x; i += 1 }
    var j = n
    while (j < lb) { val y = b.getFloat(j).toDouble; bb += y * y; j += 1 }
    val na = math.sqrt(aa)
    val nb = math.sqrt(bb)
    if (na == 0.0 || nb == 0.0) 0.0 else ab / (na * nb)
  }

  /** Greedy Maximal-Marginal-Relevance selection (Carbonell & Goldstein,
    * SIGIR'98) over one query's BOUNDED candidate list: pick
    * argmax λ·sim(q,c) − (1−λ)·max_{s∈S} cos(c,s), k times. `ids`/`sims`/
    * `vecs` are aligned arrays (candidates in a fixed order); ties break to
    * the SMALLER id so both engines agree. O(n·k·d) per query over n ≤ a
    * few dozen candidates — per-row work, never a corpus operation. The
    * relax values update incrementally (one cosine column per pick), and
    * every cosine is [[cosineF]]'s index-order double formula so a
    * declarative replay reproduces the picks bit-for-bit.
    */
  def mmrSelect(ids: ArrayData, sims: ArrayData, vecs: ArrayData,
      k: Int, lambda: Double): ArrayData = {
    val n   = ids.numElements()
    val m   = math.min(k, n)
    val out = new Array[Long](m)
    val used  = new Array[Boolean](n)
    val relax = new Array[Double](n) // max cos to the selected set; 0 when empty
    var r = 0
    while (r < m) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val s = lambda * sims.getDouble(i) - (1.0 - lambda) * relax(i)
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids.getLong(i) < ids.getLong(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      used(best) = true
      out(r) = ids.getLong(best)
      val bv = vecs.getArray(best)
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val c = cosineF(vecs.getArray(j), bv)
          if (c > relax(j)) relax(j) = c
        }
        j += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Exact Jaccard of two SORTED distinct long arrays (the representation
    * [[shingleHashes]]/[[charNgramHashes]] emit): one merge pass, no per-row
    * hash-set allocation — `array_intersect`+`array_union` cost 64 s on 377 k
    * candidate pairs at sf0.1; this is O(n+m) per pair.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Unbiased Jaccard estimate from two equal-length MinHash signatures:
    * fraction of agreeing positions (valid for densified one-permutation
    * signatures too — Shrivastava & Li ICML'14).
    */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i  = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Indices of the `nprobe` nearest centroids by cosine — the IVF coarse
    * quantizer. `cents` is plan-embedded (C vectors, bounded); selection is
    * an O(C·dim + C·nprobe) loop per row.
    */
  def nearestCentroids(vec: ArrayData, cents: Array[Array[Float]], nprobe: Int): ArrayData = {
    val c     = cents.length
    val dim   = vec.numElements()
    val sims  = new Array[Double](c)
    var ci    = 0
    while (ci < c) {
      val cent = cents(ci)
      val n    = math.min(dim, cent.length)
      var dotv = 0.0
      var nc   = 0.0
      var nv   = 0.0
      var j    = 0
      while (j < n) {
        val x = vec.getFloat(j).toDouble
        val y = cent(j).toDouble
        dotv += x * y; nc += y * y; nv += x * x
        j += 1
      }
      sims(ci) = if (nc == 0.0 || nv == 0.0) -2.0 else dotv / math.sqrt(nc * nv)
      ci += 1
    }
    val p   = math.min(nprobe, c)
    val out = new Array[Int](p)
    val used = new Array[Boolean](c)
    var r = 0
    while (r < p) {
      var best = -1
      var i    = 0
      while (i < c) {
        if (!used(i) && (best < 0 || sims(i) > sims(best))) best = i
        i += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  private def cosineToCent(vec: ArrayData, cent: Array[Float]): Double = {
    val n    = math.min(vec.numElements(), cent.length)
    var dotv = 0.0
    var nc   = 0.0
    var nv   = 0.0
    var j    = 0
    while (j < n) {
      val x = vec.getFloat(j).toDouble
      val y = cent(j).toDouble
      dotv += x * y; nc += y * y; nv += x * x
      j += 1
    }
    if (nc == 0.0 || nv == 0.0) -2.0 else dotv / math.sqrt(nc * nv)
  }

  /** Two-level nearest-centroid assignment: rank the `wprobe` nearest of G
    * group reps first, then exact cosine only over those groups' member
    * centroids — O(G + wprobe·C/G) per row instead of O(C), which is what
    * keeps CONSTANT-CELL-SIZE IVF (C ∝ corpus) linear end-to-end: flat
    * assignment would reintroduce an n·C = n²/cellSize term that dominates
    * by the second decade. Returns GLOBAL centroid ids, top-`nprobe` by
    * cosine among the candidate union (fewer if the probed groups hold
    * fewer members — mirrors the flat variant's min(nprobe, C)). Standard
    * IVF-hierarchy trade: a vector near a group boundary can miss its true
    * nearest cell; wprobe > 1 is the dial that bounds that miss.
    */
  def nearestCentroidsTwoLevel(
      vec: ArrayData,
      reps: Array[Array[Float]],
      members: Array[Array[Int]],
      cents: Array[Array[Float]],
      nprobe: Int,
      wprobe: Int): ArrayData = {
    val g       = reps.length
    val repSims = new Array[Double](g)
    var i = 0
    while (i < g) { repSims(i) = cosineToCent(vec, reps(i)); i += 1 }
    val w        = math.min(wprobe, g)
    val repUsed  = new Array[Boolean](g)
    var cand     = 0
    val topGroups = new Array[Int](w)
    var r = 0
    while (r < w) {
      var best = -1
      var j    = 0
      while (j < g) {
        if (!repUsed(j) && (best < 0 || repSims(j) > repSims(best))) best = j
        j += 1
      }
      repUsed(best) = true
      topGroups(r) = best
      cand += members(best).length
      r += 1
    }
    val candIds  = new Array[Int](cand)
    val candSims = new Array[Double](cand)
    var c = 0
    r = 0
    while (r < w) {
      val m = members(topGroups(r))
      var j = 0
      while (j < m.length) {
        candIds(c) = m(j)
        candSims(c) = cosineToCent(vec, cents(m(j)))
        c += 1
        j += 1
      }
      r += 1
    }
    val p    = math.min(nprobe, cand)
    val out  = new Array[Int](p)
    val used = new Array[Boolean](cand)
    r = 0
    while (r < p) {
      var best = -1
      var j    = 0
      while (j < cand) {
        if (!used(j) && (best < 0 || candSims(j) > candSims(best))) best = j
        j += 1
      }
      used(best) = true
      out(r) = candIds(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Squared Euclidean distance, double accumulation. */
  def sqDistF(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

private[graft] trait GraftUnaryCodegen extends UnaryExpression {
  /** Static call template, e.g. `c => s"graft.functions.HashImpl.simHash64($c)"`. */
  protected def staticCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

case class ShingleHashesExpr(child: Expression, k: Int) extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.shingleHashes($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class CharNgramHashesExpr(child: Expression, n: Int) extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.charNgramHashes(input.asInstanceOf[UTF8String], n)
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.charNgramHashes($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, m: Int) extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.minHashSignature(input.asInstanceOf[ArrayData], m)
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.minHashSignature($c, $m)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class BandBucketsExpr(child: Expression, bands: Int) extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.bandBuckets(input.asInstanceOf[ArrayData], bands)
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.bandBuckets($c, $bands)"
  override protected def withNewChildInternal(newChild: Expression): BandBucketsExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.simHash64(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.simHash64($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class SimHash64Md5Expr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.simHash64Md5(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.simHash64Md5($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5Expr =
    copy(child = newChild)
}

case class SrpBucketExpr(child: Expression, bits: Int, seed: Long) extends GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.srpBucket(input.asInstanceOf[ArrayData], bits, seed)
  override protected def staticCall(c: String): String =
    s"graft.functions.HashImpl.srpBucket($c, $bits, ${seed}L)"
  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}

/** IVF coarse quantizer: `nprobe` nearest centroid indices by cosine. The
  * centroid matrix is embedded in the plan (NOT a per-row child) and handed
  * to generated code once via `addReferenceObj`.
  */
case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.nearestCentroids(input.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.nearestCentroids($c, $ref, $nprobe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

case class NearestCentroidsTwoLevelExpr(
    child: Expression,
    reps: Array[Array[Float]],
    members: Array[Array[Int]],
    cents: Array[Array[Float]],
    nprobe: Int,
    wprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.nearestCentroidsTwoLevel(
      input.asInstanceOf[ArrayData], reps, members, cents, nprobe, wprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val repsRef    = ctx.addReferenceObj("reps", reps, "float[][]")
    val membersRef = ctx.addReferenceObj("members", members, "int[][]")
    val centsRef   = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpl.nearestCentroidsTwoLevel($c, $repsRef, $membersRef, $centsRef, $nprobe, $wprobe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsTwoLevelExpr =
    copy(child = newChild)
}

private[graft] abstract class GraftBinaryDouble extends BinaryExpression {
  protected def staticName: String
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalImpl(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalImpl(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.$staticName($a, $b)")
}

case class JaccardSortedExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "jaccardSorted"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.jaccardSorted(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

case class SigAgreementExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "sigAgreement"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.sigAgreement(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreementExpr =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "dotF"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.dotF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

case class DotDoubleExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "dotD"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.dotD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotDoubleExpr =
    copy(left = l, right = r)
}

case class CosineExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "cosineF"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.cosineF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
    copy(left = l, right = r)
}

/** Threshold levenshtein over strings — see [[HashImpl.levThresh]]. Same
  * type/null contract as Spark's 3-arg `levenshtein` (int; −1 past the
  * threshold; null-intolerant).
  */
case class LevThreshExpr(left: Expression, right: Expression, threshold: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.levThresh(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.levThresh($a, $b, $threshold)")
  override def prettyName: String = "graft_lev_thresh"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevThreshExpr =
    copy(left = l, right = r)
}

/** Greedy MMR pick over a query's bounded candidate arrays — see
  * [[HashImpl.mmrSelect]]. k and lambda are plan literals.
  */
case class MmrSelectExpr(first: Expression, second: Expression, third: Expression,
    k: Int, lambda: Double)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(ids: Any, sims: Any, vecs: Any): Any =
    HashImpl.mmrSelect(ids.asInstanceOf[ArrayData], sims.asInstanceOf[ArrayData],
      vecs.asInstanceOf[ArrayData], k, lambda)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.HashImpl.mmrSelect($a, $b, $c, $k, $lambda)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MmrSelectExpr =
    copy(first = f, second = s, third = t)
}

case class SqDistExpr(left: Expression, right: Expression) extends GraftBinaryDouble {
  override protected def staticName: String = "sqDistF"
  override protected def evalImpl(a: ArrayData, b: ArrayData): Double = HashImpl.sqDistF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistExpr =
    copy(left = l, right = r)
}

/** Column-API face of the native expressions. */
object NativeFunctions {
  private def c(e: Expression): Column            = ColumnBridge.column(e)
  private def x(col: Column): Expression          = ColumnBridge.expression(col)

  def shingleHashes(text: Column, k: Int = 3): Column  = c(ShingleHashesExpr(x(text), k))
  def charNgramHashes(text: Column, n: Int = 5): Column = c(CharNgramHashesExpr(x(text), n))
  def minHashSignature(sh: Column, numHashes: Int = 128): Column =
    c(MinHashSigExpr(x(sh), numHashes))
  def bandBuckets(sig: Column, bands: Int = 32): Column = c(BandBucketsExpr(x(sig), bands))
  def simHash64(text: Column): Column                   = c(SimHash64Expr(x(text)))
  def simHash64Md5(text: Column): Column                = c(SimHash64Md5Expr(x(text)))
  def srpBucket(vec: Column, bits: Int, seed: Long): Column =
    c(SrpBucketExpr(x(vec), bits, seed))
  def dot(a: Column, b: Column): Column    = c(DotExpr(x(a), x(b)))
  def dotD(a: Column, b: Column): Column   = c(DotDoubleExpr(x(a), x(b)))
  def cosine(a: Column, b: Column): Column = c(CosineExpr(x(a), x(b)))
  def sqDist(a: Column, b: Column): Column = c(SqDistExpr(x(a), x(b)))
  def mmrSelect(ids: Column, sims: Column, vecs: Column, k: Int, lambda: Double): Column =
    c(MmrSelectExpr(x(ids), x(sims), x(vecs), k, lambda))
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    c(NearestCentroidsExpr(x(vec), centroids, nprobe))
  def nearestCentroidsTwoLevel(vec: Column, reps: Array[Array[Float]],
      members: Array[Array[Int]], centroids: Array[Array[Float]],
      nprobe: Int, wprobe: Int): Column =
    c(NearestCentroidsTwoLevelExpr(x(vec), reps, members, centroids, nprobe, wprobe))
  def jaccardSorted(a: Column, b: Column): Column = c(JaccardSortedExpr(x(a), x(b)))
  /** Bounded top-k aggregate over (sim, id) rows → struct(sims, ids), sorted
    * (sim, id)-descending — see [[TopKAgg]]. Inputs are cast to
    * (double, bigint) exactly as the legacy tuple-Encoder udaf coerced them.
    */
  def topK(sim: Column, id: Column, k: Int): Column =
    c(TopKAgg(x(sim.cast("double")), x(id.cast("bigint")), k).toAggregateExpression())
  /** `levenshtein(a, b, d)` with prefix/suffix trim + banded DP — see
    * [[LevThreshExpr]]; value-identical to the built-in.
    */
  def levThresh(a: Column, b: Column, d: Int): Column = c(LevThreshExpr(x(a), x(b), d))
  def sigAgreement(a: Column, b: Column): Column  = c(SigAgreementExpr(x(a), x(b)))
  def textStats(text: Column): Column             = c(TextStatsExpr(x(text)))
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    c(WinnowFingerprintsExpr(x(text), k, w))
  def windowHashes64(text: Column, k: Int): Column = c(WindowHashes64Expr(x(text), k))
  def windowHashSeq(text: Column, k: Int): Column  = c(WindowHashSeqExpr(x(text), k))
  def cutWindows(text: Column, positions: Column, k: Int): Column =
    c(CutWindowsExpr(x(text), x(positions), k))
  def wordShingles(text: Column, k: Int = 3): Column = c(WordShinglesExpr(x(text), k))
  def luhnValid(s: Column): Column = c(LuhnValidExpr(x(s)))
  def htmlToText(html: Column): Column = c(HtmlToTextExpr(x(html)))
  def dedupLines(text: Column): Column   = c(DedupLinesExpr(x(text)))
  def sanitizeText(text: Column): Column = c(SanitizeTextExpr(x(text)))
  def maskCreditCards(text: Column, token: String = "<CC>"): Column =
    c(MaskLuhnExpr(x(text), token))
}
