package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping text chunking — the context-window preparation
  * step of a training-data pipeline (long documents → model-sized pieces,
  * with overlap so no boundary context is lost).
  *
  * Pure map-side work: `sequence` + `explode` + `substring` is one
  * codegen'd Generate over the scan — no shuffle, no state, and the text
  * payload is never exchanged. At 100 TB the output is written partition-
  * local; chunk count per task scales with input bytes, so the operator
  * inherits the scan's partitioning (`maxPartitionBytes` sizes tasks).
  *
  * Chunk starts are `0, stride, 2*stride, …` while `start < length`
  * (an empty/blank document still yields its one empty chunk — every doc
  * survives, which downstream joins rely on). The last chunk may be
  * shorter than `chunkSize`.
  */
object Chunking {

  /** Character-window chunks: `(id, chunk_id, chunk)` — one row per window.
    *
    * `chunkSize`/`stride` in characters; `stride < chunkSize` gives
    * `chunkSize - stride` characters of overlap between consecutive chunks.
    */
  def chunkChars(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int,
  ): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    // greatest(length,1) keeps the arithmetic non-negative for empty text —
    // sequence(0, -1) would DESCEND in Spark while DuckDB range(0, 0) is
    // empty, so the guard is also what keeps the DuckDB oracle in lockstep.
    df.select(
        col(idCol), col(textCol),
        explode(sequence(lit(0),
          expr(s"int((greatest(length($textCol), 1) - 1) div $stride)"))).as("__start"))
      .select(
        col(idCol),
        col("__start").cast("long").as("chunk_id"),
        expr(s"substring($textCol, __start * $stride + 1, $chunkSize)").as("chunk"))
  }

  /** Whitespace-token chunks: `(id, chunk_id, chunk)` where each chunk is
    * `chunkTokens` tokens re-joined with single spaces (tokenization is
    * `split('\\s+')` minus empty tokens — blank docs yield one empty chunk).
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int,
  ): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    df.select(
        col(idCol),
        expr(s"filter(split($textCol, '\\\\s+'), t -> t != '')").as("__toks"))
      .select(
        col(idCol), col("__toks"),
        explode(sequence(lit(0),
          expr(s"int((greatest(size(__toks), 1) - 1) div $strideTokens)"))).as("__start"))
      .select(
        col(idCol),
        col("__start").cast("long").as("chunk_id"),
        expr(s"array_join(slice(__toks, __start * $strideTokens + 1, $chunkTokens), ' ')")
          .as("chunk"))
  }
}
