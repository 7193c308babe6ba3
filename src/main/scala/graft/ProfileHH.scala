package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: isolate the slow ingredient of the n-gram heavy-hitters path. */
object ProfileHH {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
    time("warmup count")(d.count())

    val toks = TextFunctions.tokens(lower(col("text")))
    val starts = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
      .otherwise(array().cast("array<int>"))
    val grams = transform(starts, i => array_join(slice(toks, i, lit(2)), " "))
    val gramRows = d.select(explode(grams).as("term"))
    val tokRows  = d.select(explode(toks).as("term"))

    time("unigram stream count")(tokRows.count())
    time("bigram stream count")(gramRows.count())
    val staged = d.select(TextFunctions.tokens(lower(col("text"))).as("__toks"))
    val t2 = col("__toks")
    val starts2 = when(size(t2) >= 2, sequence(lit(1), size(t2) - 1))
      .otherwise(array().cast("array<int>"))
    val grams2 = transform(starts2, i => array_join(slice(t2, i, lit(2)), " "))
    val gramRows2 = staged.select(explode(grams2).as("term"))
    time("bigram stream two-stage count")(gramRows2.count())
    time("bigram stream two-stage count x2")(gramRows2.count())
    time("bigram distinct")(println(gramRows.distinct().count()))

    for (cap <- Seq(4096, 16384)) {
      time(s"MG sketch bigrams cap=$cap") {
        gramRows.as[String](Encoders.STRING)
          .select(new graft.ops.HeavyHitters.MisraGries(cap).toColumn).head()
      }
      time(s"MG sketch two-stage bigrams cap=$cap") {
        gramRows2.as[String](Encoders.STRING)
          .select(new graft.ops.HeavyHitters.MisraGries(cap).toColumn).head()
      }
    }
    time("recount join two-stage (broadcast 16k cands fake)") {
      val cands = gramRows2.limit(16384).distinct()
      gramRows2.join(broadcast(cands), Seq("term")).groupBy("term")
        .agg(count(lit(1))).orderBy(desc("count(1)")).limit(10).collect()
    }
    time("recount join (broadcast 16k cands fake)") {
      val cands = gramRows.limit(16384).distinct()
      gramRows.join(broadcast(cands), Seq("term")).groupBy("term")
        .agg(count(lit(1))).orderBy(desc("count(1)")).limit(10).collect()
    }
    spark.stop()
  }
}
