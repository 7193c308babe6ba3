package graft

import graft.functions.TextFunctions
import graft.ops.WebFilter
import org.apache.spark.sql.functions._

/** Round-7c scan-speed curation: intra-document line dedup, text
  * sanitization, and domain blocklist filtering.
  */
class SanitizeWebFilterSpec extends SparkSpec {
  import spark.implicits._

  private def dedup1(s: String): String = {
    val df = Seq((1L, s)).toDF("id", "t")
    df.select(TextFunctions.dedupLines(col("t"))).collect()(0).getString(0)
  }

  private def clean1(s: String): String = {
    val df = Seq((1L, s)).toDF("id", "t")
    df.select(TextFunctions.sanitizeText(col("t"))).collect()(0).getString(0)
  }

  // ---- dedupLines -----------------------------------------------------------

  test("dedupLines keeps first occurrence, drops later exact repeats") {
    assert(dedup1("a\nb\na\nc\nb") == "a\nb\nc")
  }

  test("dedupLines keeps every blank line (paragraph structure survives)") {
    assert(dedup1("a\n\nb\n\na") == "a\n\nb\n")
    assert(dedup1("x\n \t\nx\n \t\nx") == "x\n \t\n \t")
  }

  test("dedupLines: exact match only — differing whitespace is a new line") {
    assert(dedup1("a\na \na") == "a\na ")
  }

  test("dedupLines: single-line and empty inputs pass through") {
    assert(dedup1("no newlines here") == "no newlines here")
    assert(dedup1("") == "")
  }

  test("dedupLines via SQL surface graft_dedup_lines") {
    graft.plans.GraftFunctions.register(spark)
    val out = spark.sql("SELECT graft_dedup_lines('a\nb\na') AS d").collect()(0).getString(0)
    assert(out == "a\nb")
  }

  // ---- sanitizeText ---------------------------------------------------------

  test("sanitize strips control and zero-width chars") {
    assert(clean1("a\u0001b\u0000c\u007Fd\u200Be\uFEFFf") == "abcdef")
  }

  test("sanitize keeps tab-as-space and newline, normalizes CRLF") {
    assert(clean1("a\tb\r\nc\rd") == "a b\nc\nd")
  }

  test("sanitize collapses space runs and trailing line spaces") {
    assert(clean1("a   b  \nc") == "a b\nc")
  }

  test("sanitize caps blank-line runs at one") {
    assert(clean1("a\n\n\n\n\nb") == "a\n\nb")
    assert(clean1("a\n\nb") == "a\n\nb")
  }

  test("sanitize trims leading/trailing spaces and newlines") {
    assert(clean1("  \n\n hello \n\n  ") == "hello")
  }

  test("sanitize is idempotent") {
    val noisy = "  x\u0001  y\r\n\n\n\nz\u200B  "
    assert(clean1(clean1(noisy)) == clean1(noisy))
  }

  // ---- WebFilter ------------------------------------------------------------

  private lazy val docs = Seq(
    (1L, "https://a.good.org/x", "one two"),
    (2L, "https://b.spam.biz/y", "three"),
    (3L, "https://c.good.org/z", "four five six"),
    (4L, "https://SPAM.BIZ/top", "seven"),
  ).toDF("doc_id", "url", "text")

  test("blockDomains drops blocklisted registered domains (case-insensitive host)") {
    val kept = WebFilter.blockDomains(docs, col("url"), Seq("spam.biz"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("blockDomainsTable (broadcast anti join) matches the inline-list path") {
    val bl = Seq("SPAM.BIZ").toDF("domain")
    val kept = WebFilter.blockDomainsTable(docs, col("url"), bl)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("domainStats aggregates docs and tokens per registered domain") {
    val rows = WebFilter.domainStats(docs, col("url"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("good.org", 2L, 5L), ("spam.biz", 2L, 2L)))
  }

  test("blockDomainsTable keeps the corpus shuffle-free (broadcast anti join)") {
    val bl   = Seq("spam.biz").toDF("domain")
    val plan = WebFilter.blockDomainsTable(docs, col("url"), bl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
