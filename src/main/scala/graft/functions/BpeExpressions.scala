package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding application kernels (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 — the
  * public BPE algorithm; training lives in [[graft.ops.Bpe]]).
  *
  * Words are the engine-wide whitespace tokens, lowercased; each word starts
  * as its character symbols plus a terminal `</w>` marker symbol, then the
  * learned merges apply greedily: repeatedly find the adjacent symbol pair
  * with the LOWEST merge rank and fuse every occurrence, until no adjacent
  * pair has a rank. Merges never cross word boundaries.
  *
  * The rank table rides as a reference object (one copy per task). Word →
  * symbol-count results are memoized per thread (Zipf: a few thousand
  * distinct words dominate any shard), capped to bound memory.
  */
object BpeImpl {

  final val EndOfWord = "</w>"

  /** Symbols of one word after applying all ranked merges. */
  def bpeWord(word: String, ranks: java.util.HashMap[String, Int]): Array[String] = {
    var syms = new Array[String](word.length + 1)
    var i    = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i))
      i += 1
    }
    syms(word.length) = EndOfWord
    while (syms.length > 1) {
      // lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bi       = -1
      var j        = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrDefault(syms(j) + " " + syms(j + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = j }
        j += 1
      }
      if (bi < 0) return syms
      // merge every occurrence of that pair, left to right
      val a   = syms(bi)
      val b   = syms(bi + 1)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += a + b
          j += 2
        } else {
          out += syms(j)
          j += 1
        }
      }
      syms = out.toArray
    }
    syms
  }

  private val cache: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer](1 << 12))
  private val cacheOwner: ThreadLocal[AnyRef] = new ThreadLocal[AnyRef]

  private def cachedCount(word: String, ranks: java.util.HashMap[String, Int]): Int = {
    // cache is per (thread, rank-table identity); swap tables → reset
    if (cacheOwner.get() ne ranks) { cache.get().clear(); cacheOwner.set(ranks) }
    val c = cache.get()
    val hit = c.get(word)
    if (hit != null) hit.intValue()
    else {
      val n = bpeWord(word, ranks).length
      if (c.size() >= (1 << 16)) c.clear()
      c.put(word, Integer.valueOf(n))
      n
    }
  }

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  /** Total BPE token count of a document: lowercase, whitespace-split, sum
    * of per-word symbol counts. One pass, no intermediate token array.
    */
  def countTokens(u: UTF8String, ranks: java.util.HashMap[String, Int]): Long = {
    val s   = u.toLowerCase.toString
    var acc = 0L
    var p   = 0
    while (p < s.length) {
      while (p < s.length && isWs(s.charAt(p))) p += 1
      if (p < s.length) {
        var q = p
        while (q < s.length && !isWs(s.charAt(q))) q += 1
        acc += cachedCount(s.substring(p, q), ranks)
        p = q
      }
    }
    acc
  }

  /** BPE token ids of a whole document: per-word symbols through the
    * vocabulary table, unknown symbols → UNK (id 1). One pass.
    */
  def encodeIds(
      u: UTF8String,
      ranks: java.util.HashMap[String, Int],
      idOf: java.util.HashMap[String, Int],
  ): ArrayData = {
    val s   = u.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var p   = 0
    while (p < s.length) {
      while (p < s.length && isWs(s.charAt(p))) p += 1
      if (p < s.length) {
        var q = p
        while (q < s.length && !isWs(s.charAt(q))) q += 1
        val syms = bpeWord(s.substring(p, q), ranks)
        var i = 0
        while (i < syms.length) {
          out += idOf.getOrDefault(syms(i), 1)
          i += 1
        }
        p = q
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** BPE symbols of a whole document (word-by-word), for inspection/tests. */
  def tokenize(u: UTF8String, ranks: java.util.HashMap[String, Int]): ArrayData = {
    val s   = u.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var p   = 0
    while (p < s.length) {
      while (p < s.length && isWs(s.charAt(p))) p += 1
      if (p < s.length) {
        var q = p
        while (q < s.length && !isWs(s.charAt(q))) q += 1
        bpeWord(s.substring(p, q), ranks).foreach(t => out += UTF8String.fromString(t))
        p = q
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Document BPE token count as a single codegen'd tree node. */
case class BpeCountExpr(child: Expression, ranks: java.util.HashMap[String, Int])
    extends GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.countTokens(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.countTokens($c, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Document BPE symbols as a single codegen'd tree node. */
case class BpeTokenizeExpr(child: Expression, ranks: java.util.HashMap[String, Int])
    extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.tokenize(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.tokenize($c, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenizeExpr =
    copy(child = newChild)
}

/** Document BPE token IDS as a single codegen'd tree node: per-word symbols
  * mapped through the vocabulary (unknown → UNK=1); both the rank table and
  * the id table ride as reference objects.
  */
case class BpeIdsExpr(
    child: Expression,
    ranks: java.util.HashMap[String, Int],
    idOf: java.util.HashMap[String, Int],
) extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.encodeIds(input.asInstanceOf[UTF8String], ranks, idOf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val v = ctx.addReferenceObj("bpeVocab", idOf, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.encodeIds($c, $r, $v)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): BpeIdsExpr =
    copy(child = newChild)
}
