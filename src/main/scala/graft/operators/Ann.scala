package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** IVF-style approximate nearest neighbour over an embedding column — the
  * coarse-quantizer scale path beside the hyperplane LSH variant
  * (ScaleOpsQueries.ss2): k-means cells built with distributed Lloyd
  * iterations (crossJoin-broadcast assign → element-wise mean update, all
  * DataFrame ops), then search probes only the `nProbe` nearest cells and
  * re-ranks exactly with the codegen `cosine_sim` expression.
  *
  * At 100 TB: centroids are a k×dim broadcast dim (KBs); assignment is one
  * embarrassingly-parallel scan; the search-side candidate set shrinks by
  * ~k/nProbe versus brute force. Exact re-rank inside the probed cells
  * makes `nProbe = k` literally equal to brute force (tested).
  *
  * Re-ranking runs `cosine_sim` on the RAW (cast-to-double) vectors, not
  * the L2-normalized copies: the fused left-to-right accumulation is then
  * bit-identical to a dot/(|a|·|b|) oracle over the same doubles, so the
  * nProbe=k path hash-matches a brute-force SQL oracle (ss3_ivf_ann). The
  * normalized copies drive only the cell geometry (seeding, assignment,
  * probe distances), where bit-parity is irrelevant.
  */
object Ann {

  /** L2-normalized copy of the vectors (cosine ANN = L2 ANN on the unit
    * sphere), plus the raw vector for exact re-ranking. */
  private def normalized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .filter(col("nrm") > 0)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))

  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)

  /** Deterministic seeded k-means over normalized vectors.
    * @return centroids `(cell, cv ARRAY<DOUBLE>)` */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val n = normalized(emb, idCol, vecCol)
    // Deterministic spread seeds: k lowest md5-ordered ids. orderBy+limit
    // plans as TakeOrderedAndProject (per-partition top-k heaps + driver
    // merge of k rows), so no single task ever sees the whole corpus; the
    // row_number window then runs over only k rows.
    var centroids = n
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(col("h"), col("id"))))
      .select((col("rk") - 1).cast("int").as("cell"), col("vn").as("cv"))
    var i = 0
    while (i < iters) {
      val assigned = assign(n, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("vn")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
      i += 1
    }
    centroids
  }

  /** Nearest-cell assignment: one row per vector with its `cell`. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("vn"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("d2", "rk", "cv")
  }

  /** IVF top-k: probe the `nProbe` nearest cells per query, exact
    * cosine re-rank inside them.
    * @return `(q_id, rnk, id, cos)` */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, nProbe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    val centroids = kmeansCentroids(emb, idCol, vecCol, k, iters)
    val corpus = assign(normalized(emb, idCol, vecCol), centroids)
    val qn = normalized(queries, idCol, vecCol)
      .select(col("id").as("q_id"), col("v").as("qv"), col("vn").as("qvn"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cell"))
    val probed = qn.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("qvn"), col("cv")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select(col("q_id"), col("qv"), col("cell"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id"))
    probed.join(corpus, Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("id"), col("cos"))
  }

  /** Brute-force exact top-k (the verification baseline). */
  def bruteTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      topK: Int): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    val corpus = normalized(emb, idCol, vecCol)
    val qn = normalized(queries, idCol, vecCol)
      .select(col("id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id"))
    corpus.crossJoin(broadcast(qn))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("id"), col("cos"))
  }
}
