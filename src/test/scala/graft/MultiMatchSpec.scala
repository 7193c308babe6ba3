package graft

import graft.dedup.Dedup
import graft.functions.MultiMatchImpl
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern search + the verbatim answer-leak scan. */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, patterns: String*): Long =
    new MultiMatchImpl.Automaton(patterns.toArray).countDistinctMatches(text)

  test("classic he/she/his/hers automaton: fail links find overlapping matches") {
    assert(count("ushers", "he", "she", "his", "hers") == 3L) // she, he, hers
    assert(count("his", "he", "she", "his", "hers") == 1L)
    assert(count("xxhexx", "he", "she", "his", "hers") == 1L)
    assert(count("nothing here", "zzz") == 0L)
  }

  test("repeats count once; patterns that are prefixes/suffixes of each other all fire") {
    assert(count("abab abab", "ab", "abab", "ba") == 3L)
    assert(count("aaaa", "a", "aa", "aaa") == 3L)
  }

  test("single-char and full-text patterns") {
    assert(count("42", "42") == 1L)
    assert(count("the answer is 42.", "42", "answer", "question") == 2L)
  }

  test("contaminatedSubstring flags exactly the docs containing any answer") {
    val docs = Seq(
      (1L, "The secret phrase lives here somewhere"),
      (2L, "nothing suspicious in this one"),
      (3L, "both SECRET PHRASE and another token42 appear"),
      (4L, "token42 only"),
    ).toDF("doc_id", "text")
    val out = Dedup.contaminatedSubstring(docs, "doc_id", "text",
        Seq("secret phrase", "token42"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("empty (or all-empty-string) answer batch yields zero hits, not a crash") {
    val docs = Seq((1L, "any text at all")).toDF("doc_id", "text")
    val none  = Dedup.contaminatedSubstring(docs, "doc_id", "text", Seq.empty)
    val blank = Dedup.contaminatedSubstring(docs, "doc_id", "text", Seq("", ""))
    assert(none.count() == 0 && blank.count() == 0)
    assert(none.columns.toSeq == Seq("doc_id", "n_hits"))
  }
}
