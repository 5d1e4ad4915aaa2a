package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB survival kit alongside
  * AQE's runtime skew-join split): explicit key salting.
  *
  * `saltedJoin(facts, dim, key, n)` spreads each fact row of a hot key
  * across `n` salted sub-keys and replicates the (small) right side n×, so
  * one executor no longer owns an entire hot key's partition. Semantics
  * equal `facts.join(dim, key)` exactly; use when a handful of keys carry
  * orders of magnitude more rows than the rest and the right side is too
  * big to broadcast whole but small enough to replicate n×.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = large.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k hot keys by row count — the diagnostic that decides whether
    * salting is warranted and how many buckets to use. */
  def hotKeys(df: DataFrame, key: String, k: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(k)
}
