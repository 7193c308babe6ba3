package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search (Aho–Corasick, CACM 1975) as a codegen'd
  * native expression — the verbatim answer-leak scan: "does this document
  * contain ANY of these eval answer strings?" answered for ALL patterns in
  * ONE O(chars) pass, independent of pattern count. A SQL formulation
  * (`EXISTS ... position(ans IN text) > 0`) plans a nested-loop
  * contains-join — O(chars · patterns) per doc; the automaton rides as a
  * reference object (built once driver-side, one copy per task).
  */
object MultiMatchImpl {

  /** Classic goto/fail/output automaton over Java chars. Deterministic:
    * construction order does not affect the transition function.
    */
  final class Automaton(patternsIn: Array[String]) extends Serializable {
    val patterns: Array[String] = patternsIn.distinct.filter(_.nonEmpty)
    require(patterns.nonEmpty, "Aho-Corasick needs at least one non-empty pattern")

    // nodes as growable parallel structures
    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    private val fails   = scala.collection.mutable.ArrayBuffer(0)
    private val outputs = scala.collection.mutable.ArrayBuffer(
      new java.util.BitSet(patterns.length))

    { // build trie
      var p = 0
      while (p < patterns.length) {
        var node = 0
        val pat  = patterns(p)
        var i    = 0
        while (i < pat.length) {
          val c    = Character.valueOf(pat.charAt(i))
          val next = gotoMaps(node).get(c)
          node =
            if (next != null) next.intValue()
            else {
              gotoMaps += new java.util.HashMap[Character, Integer]()
              fails += 0
              outputs += new java.util.BitSet(patterns.length)
              val id = gotoMaps.size - 1
              gotoMaps(node).put(c, Integer.valueOf(id))
              id
            }
          i += 1
        }
        outputs(node).set(p)
        p += 1
      }
      // BFS fail links
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMaps(0).forEach((_, v) => { fails(v.intValue()) = 0; queue.add(v) })
      while (!queue.isEmpty) {
        val u  = queue.poll().intValue()
        val it = gotoMaps(u).entrySet().iterator()
        while (it.hasNext) {
          val e  = it.next()
          val c  = e.getKey
          val vi = e.getValue.intValue()
          queue.add(e.getValue)
          var f = fails(u)
          while (f != 0 && !gotoMaps(f).containsKey(c)) f = fails(f)
          val fNext = gotoMaps(f).get(c)
          fails(vi) = if (fNext != null && fNext.intValue() != vi) fNext.intValue() else 0
          outputs(vi).or(outputs(fails(vi)))
        }
      }
    }

    /** Number of DISTINCT patterns occurring in `text`. */
    def countDistinctMatches(text: String): Long = {
      val seen = new java.util.BitSet(patterns.length)
      var node = 0
      var i    = 0
      while (i < text.length && seen.cardinality() < patterns.length) {
        val c = Character.valueOf(text.charAt(i))
        while (node != 0 && !gotoMaps(node).containsKey(c)) node = fails(node)
        val next = gotoMaps(node).get(c)
        node = if (next != null) next.intValue() else 0
        seen.or(outputs(node))
        i += 1
      }
      seen.cardinality().toLong
    }
  }

  def countMatches(u: UTF8String, automaton: Automaton): Long =
    automaton.countDistinctMatches(u.toString)
}

/** Distinct-pattern match count as a single codegen'd tree node; the
  * automaton rides as a reference object.
  */
case class MultiMatchCountExpr(child: Expression, automaton: MultiMatchImpl.Automaton)
    extends GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MultiMatchImpl.countMatches(input.asInstanceOf[UTF8String], automaton)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.MultiMatchImpl.Automaton")
    defineCodeGen(ctx, ev, c => s"graft.functions.MultiMatchImpl.countMatches($c, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): MultiMatchCountExpr =
    copy(child = newChild)
}
