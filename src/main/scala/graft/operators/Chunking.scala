package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document → fixed-size token chunks with overlap — the context-window
  * slicing step of a tokenize-and-train pipeline (every doc longer than
  * the model context is cut into windows of `size` tokens advancing by
  * `stride`, so consecutive chunks overlap by `size - stride`).
  *
  * Shape at 100 TB: a pure narrow transform — tokenize, generate the
  * start offsets with `sequence`, `explode`, `slice`. No shuffle, no
  * join, no window; the fan-out (≈ n_tokens/stride rows per doc) rides
  * the scan partitioning, and a downstream repartition is the caller's
  * choice. (The reference has no chunking; this is part of the
  * training-pipeline extension set, like Dedup/Sampling.)
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_idx`, `start` (0-based token
    * offset), `n_chunk_tokens`, and the chunk text. Chunk starts are the
    * multiples of `stride` below the token count, so every token is
    * covered and every NON-NULL-text doc — even one shorter than `size`
    * — yields at least one chunk. NULL text is outside the chunker's
    * domain and is dropped explicitly (without the filter it would
    * vanish through a size(null) = −1 comparison, a silent drop).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      // sequence() is inclusive of the stop bound, so stop at __n - 1;
      // tokens() of an empty string is [""] (size 1), so __n >= 1 always
      .withColumn("start",
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride))))
      .filter(col("start") < col("__n"))
      .select(col(idCol),
        expr(s"CAST(start div $stride AS BIGINT)").as("chunk_idx"),
        col("start").cast("long").as("start"),
        slice(col("__toks"), col("start") + 1, lit(size)).as("__chunk"))
      .withColumn("n_chunk_tokens",
        org.apache.spark.sql.functions.size(col("__chunk")).cast("long"))
      .withColumn("chunk_md5", md5(concat_ws(" ", col("__chunk"))))
      .drop("__chunk")
  }
}
