package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
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
