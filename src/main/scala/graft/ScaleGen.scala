package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from /root/testdata/sf0.1 by
  * key-remapped replication, for the scale probe (SCALE.md "sf1 probe").
  * The driver owns /root/testdata (read-only to us), so the output goes
  * under the repo scratch dir.
  *
  * Design goal: each replica must be STRUCTURALLY ISOMORPHIC to the source
  * corpus and (near-)disjoint from the other replicas, so densities that
  * drive superlinear costs — near-dup rate, LSH bucket sizes, join fan-out
  * per key — stay CONSTANT as rows scale 10×. Naive replication would give
  * every doc 9 exact twins (dup density 10×, candidate volume 100×), which
  * probes a different corpus, not a bigger one.
  *
  *  - TPC-H tables: per-replica key offsets (10M/100M — far above any real
  *    key and any planted-id range like q29's +1M/+2M) preserve intra-replica
  *    join structure; region/nation stay fixed like TPC-H dimension tables.
  *  - documents: replica r > 0 text goes through a Caesar cipher on ASCII
  *    letters (rotate by r). A bijective character map preserves
  *    intra-replica similarity structure EXACTLY — word-shingle sets,
  *    char-n-gram sets, line sets, and lengths are all isomorphic — while
  *    cross-replica overlap collapses to digits/punctuation noise, so dup
  *    density stays constant instead of every doc gaining 9 near-twins.
  *    Replica 0 is the original text; n_chars is unchanged by construction.
  *  - embeddings: dimensions rotate circularly by the replica index — an
  *    orthogonal transform, so intra-replica cosines are EXACTLY preserved
  *    while cross-replica cosine decorrelates.
  *  - events: ids/users offset per replica; timestamps unchanged (the
  *    event-time distribution is the workload shape; 10× density per window
  *    is what a 10× corpus means). ts passes through in whatever physical
  *    type the fixture carries (INT64 nanos under the legacy conf below, or
  *    timestamp[us] from newer generations) — every consumer dispatches on
  *    the type it reads (SparkEntry.epochSec/epochMicros).
  *
  * Usage: runMain graft.ScaleGen [replicas] [srcDir] [outDir]
  */
object ScaleGen {

  /** Per-replica bijective letter map: (from, to) for `translate`. Replica 0
    * is identity; others are a seeded Fisher-Yates permutation of a–z applied
    * to both cases — NOT a Caesar rotation, which repeats mod 26 and would
    * make replicas 26 apart verbatim twins. Bijective ⇒ intra-replica
    * similarity structure (shingles, char-grams, lines, lengths) is exactly
    * isomorphic to the source; two independent permutations agree on ~1
    * letter ⇒ cross-replica overlap stays noise at any replica count.
    */
  def letterMap(r: Int): (String, String) = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    if (r == 0) (lower + lower.toUpperCase, lower + lower.toUpperCase)
    else {
      val p   = lower.toCharArray
      val rng = new java.util.Random(0x5ca1ab1eL + r)
      var i   = p.length - 1
      while (i > 0) { val j = rng.nextInt(i + 1); val t = p(i); p(i) = p(j); p(j) = t; i -= 1 }
      val perm = new String(p)
      (lower + lower.toUpperCase, perm + perm.toUpperCase)
    }
  }

  /** Per-replica ±1 diagonal for the embedding transform (composed with a
    * circular rotation: orthogonal ⇒ intra-replica cosines exact; the signs
    * keep the family collision-free past `dim` replicas).
    */
  def signVector(r: Int, dim: Int): Array[Float] = {
    val rng = new java.util.Random(0xdecafbadL + r)
    Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
  }

  def main(args: Array[String]): Unit = {
    val replicas = if (args.length > 0) args(0).toInt else 10
    val src      = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out      = if (args.length > 2) args(2) else "/root/repo/scratch/sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** Union of `replicas` copies of `df`, each transformed by `f(df, r)`. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(r => f(df, r)).reduce(_.unionByName(_))

    def off(c: String, step: Long, r: Int) = (col(c) + lit(step * r)).as(c)

    val K = 10000000L  // small-key offset step
    val M = 100000000L // orders/events offset step

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> replicate(read("customer"))((d, r) =>
        d.select(off("c_custkey", K, r), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))),
      "supplier" -> replicate(read("supplier"))((d, r) =>
        d.select(off("s_suppkey", K, r), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))),
      "part" -> replicate(read("part"))((d, r) =>
        d.select(off("p_partkey", K, r), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice"))),
      "orders" -> replicate(read("orders"))((d, r) =>
        d.select(off("o_orderkey", M, r), off("o_custkey", K, r),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))),
      "lineitem" -> replicate(read("lineitem"))((d, r) =>
        d.select(off("l_orderkey", M, r), off("l_partkey", K, r),
          off("l_suppkey", K, r), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))),
      "events" -> replicate(read("events"))((d, r) =>
        d.select(off("event_id", M, r), col("ts"), off("user_id", K, r),
          col("event_type"), col("value"), col("props"))),
      "documents" -> replicate(read("documents"))((d, r) => {
        val (from, to) = letterMap(r)
        val text = if (r == 0) col("text") else translate(col("text"), from, to)
        d.select(off("doc_id", K, r), text.as("text"), col("lang"),
          col("source"), col("n_chars"))
      }),
      "embeddings" -> {
        val dim = read("embeddings").select(size(col("embedding"))).first().getInt(0)
        replicate(read("embeddings"))((d, r) => {
        // Orthogonal per-replica transform: circular rotation composed with
        // seeded sign flips ([[signVector]]). Rotation alone repeats mod
        // `dim` (replicas dim apart would carry exact-twin vectors); the ±1
        // diagonal keeps the transform orthogonal — intra-replica cosines
        // EXACT — while making the family collision-free (2^-dim odds).
        val rot = r % dim
        val rotated =
          if (rot == 0) col("embedding")
          else concat(slice(col("embedding"), rot + 1, dim - rot),
            slice(col("embedding"), 1, rot))
        val emb =
          if (r == 0) rotated
          else zip_with(rotated, lit(signVector(r, dim)), (a, b) => a * b)
        d.select(off("vec_id", K, r), emb.as("embedding"), col("label"))
      })},
    )

    // single FILE per table (driver testdata layout — q42's HTTP fixture and
    // get_file_list expect plain files, not part-file directories)
    val conf = spark.sparkContext.hadoopConfiguration
    tables.foreach { case (name, df) =>
      val t0    = System.nanoTime()
      val stage = s"$out/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val stagePath = new org.apache.hadoop.fs.Path(stage)
      val fs        = stagePath.getFileSystem(conf)
      val part = fs.listStatus(stagePath)
        .map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $stage"))
      val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      fs.delete(dest, true)
      require(fs.rename(part, dest), s"rename $part -> $dest failed")
      fs.delete(stagePath, true)
      val n = spark.read.parquet(dest.toString).count()
      println(f"[scalegen] $name%-12s $n%10d rows in ${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }
    spark.stop()
  }
}
