package graft

import graft.ops.QualityRules

/** Gopher rule battery on crafted documents (q98's machinery). */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def flags(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    QualityRules.gopherFlags(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a clean long doc passes; word/char counts are exact") {
    val text = Seq.fill(10)(Seq("the", "cat", "sat", "with", "all", "of", "them")).flatten.mkString(" ")
    val r = flags(1L -> text)(1L)
    assert(r.getLong(1) === 70L)                 // n_words
    assert(r.getDouble(2) === 3.1429)            // mean_word_len: 22 chars / 7 words
    assert(r.getDouble(3) === 0.0)               // symbol_ratio
    assert(r.getLong(7) === 3L)                  // the, of, with
    assert(r.getBoolean(8) === true)             // passes
  }

  test("bullet and ellipsis line fractions count trimmed lines") {
    val text = Seq("• item one", "* item two", "normal line", "trailing dots...").mkString("\n")
    val r = flags(2L -> text)(2L)
    assert(r.getDouble(4) === 0.5)   // 2 of 4 bullet
    assert(r.getDouble(5) === 0.25)  // 1 of 4 ellipsis
  }

  test("symbol ratio counts '#' and non-overlapping '...' per word") {
    val r = flags(3L -> "a# b c... d e f g h i j")(3L)
    // 1 '#' + 1 '...' over 10 words = 0.2
    assert(r.getDouble(3) === 0.2)
    assert(r.getBoolean(8) === false) // fails maxSymbolRatio
  }

  test("alpha word fraction and numeric soup") {
    val r = flags(4L -> "12 34 56 ab 78")(4L)
    assert(r.getDouble(6) === 0.2) // 1 of 5 words has a letter
    assert(r.getBoolean(8) === false)
  }

  test("empty and whitespace-only docs fail with zeroed stats") {
    for ((id, t) <- Seq(5L -> "", 6L -> "   ")) {
      val r = flags(id -> t)(id)
      assert(r.getLong(1) === 0L)
      assert(r.getDouble(2) === 0.0)
      assert(r.getBoolean(8) === false)
    }
  }

  test("percentile trim keeps the (floor(pLow*n), ceil(pHigh*n)] rank band per group") {
    // group a: values 1..20 -> p10/p90 keeps ranks 3..18 (floor(2)=2, ceil(18)=18)
    // group b: 5 equal values -> id tie-break fixes ranks; p10/p90 keeps ranks 1..5
    //   (floor(0.5)=0, ceil(4.5)=5) so nothing is cut
    val df = ((1 to 20).map(i => (i.toLong, "a", i.toLong)) ++
      (21 to 25).map(i => (i.toLong, "b", 7L))).toDF("id", "grp", "v")
    val out = QualityRules.trimOutliersByGroup(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .as[(Long, String, Long, Long, Long)].collect()
    val a = out.filter(_._2 == "a").sortBy(_._4)
    assert(a.map(_._4).toSeq == (3L to 18L))
    assert(a.map(_._3).toSeq == (3L to 18L)) // values 3..18 survive
    val b = out.filter(_._2 == "b").sortBy(_._4)
    assert(b.map(_._1).toSeq == (21L to 25L)) // ties ranked by id, none cut
    assert(b.forall(_._5 == 5L))
  }

  test("approx trim (no-sort scale path) agrees with the exact rank trim on clean values") {
    val df = ((1 to 20).map(i => (i.toLong, "a", i.toLong)) ++
      (21 to 60).map(i => (i.toLong, "b", (i * 7 % 101).toLong))).toDF("id", "grp", "v")
    val exact = QualityRules.trimOutliersByGroup(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .select("id").as[Long].collect().toSet
    val approx = QualityRules.trimOutliersByGroupApprox(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .select("id").as[Long].collect().toSet
    // distinct values, no ties at the cuts: the two forms may disagree only
    // on the boundary rows their cut conventions treat differently
    val diff = (exact diff approx) ++ (approx diff exact)
    assert(diff.size <= 4, s"kept sets diverged beyond the cut boundary: $diff")
    // the approximate form still trims genuinely: both tails lost rows
    val bVals = df.where($"grp" === "b").select("v").as[Long].collect()
    val keptB = QualityRules.trimOutliersByGroupApprox(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .where($"grp" === "b").select("v").as[Long].collect()
    assert(keptB.max < bVals.max && keptB.min > bVals.min)
    // output schema carries no rank columns — nothing was ranked
    assert(QualityRules.trimOutliersByGroupApprox(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .columns.toSeq == Seq("id", "grp", "v"))
  }

  test("approx trim keeps whole tie-groups at BOTH cuts; all-ties group survives intact") {
    // group a: heavy ties at the low cut — ten 1s then 11..30; p10 of the
    // sketch lands on value 1, and >= lo must keep the WHOLE tie-group
    // (round-10 advice: `> lo` dropped it, contradicting the documented
    // conservative semantics)
    // group b: every value equal -> lo == hi from the sketch; the
    // degenerate group must be kept in full, not silently emptied
    val df = ((1 to 10).map(i => (i.toLong, "a", 1L)) ++
      (11 to 30).map(i => (i.toLong, "a", i.toLong)) ++
      (31 to 40).map(i => (i.toLong, "b", 7L))).toDF("id", "grp", "v")
    val kept = QualityRules.trimOutliersByGroupApprox(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .select("id").as[Long].collect().toSet
    assert((1L to 10L).forall(kept.contains), "low-cut tie-group must be kept whole")
    assert((31L to 40L).forall(kept.contains), "all-ties group must not be emptied")
    assert(!kept.contains(30L), "the high tail must still be trimmed")
  }

  test("percentile trim ignores caller-owned rank/n_in_group columns") {
    // a frame that already carries `rank` and `n_in_group` must trim on the
    // op's OWN per-group ranks (round-9 advice: withColumn silently replaces
    // same-named columns, which used to corrupt the trim predicate)
    val df = (1 to 20).map(i => (i.toLong, "a", i.toLong, 999L, -1L))
      .toDF("id", "grp", "v", "rank", "n_in_group")
    val out = QualityRules.trimOutliersByGroup(df, Seq("grp"), "v", "id", 0.1, 0.9)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._4)
    assert(out.map(_._4).toSeq == (3L to 18L)) // real ranks, not the 999s
    assert(out.forall(_._5 == 20L))
  }
}
