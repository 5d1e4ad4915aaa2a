package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.Tables

class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)

  test("kmeans centroids: k cells, every vector assigned to exactly one") {
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(cents.count() == 8)
    assert(cents.select("cell").distinct().count() == 8)
    val assigned = Ann.assign(
      emb.select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", sqrt(aggregate(transform(col("v"), x => x * x),
          lit(0.0), (a, x) => a + x)))
        .withColumn("vn", transform(col("v"), x => x / col("nrm"))),
      cents)
    assert(assigned.count() == emb.count())
    assert(assigned.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("IVF with nProbe = k equals brute force exactly") {
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 8, iters = 3, nProbe = 8, topK = 5)
    val brute = Ann.bruteTopK(emb, queries, "vec_id", "embedding", topK = 5)
    assert(ivf.exceptAll(brute).count() == 0 && brute.exceptAll(ivf).count() == 0)
  }

  test("IVF with fewer probes still recalls a usable fraction") {
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 8, iters = 3, nProbe = 3, topK = 10)
      .select(col("q_id"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteTopK(emb, queries, "vec_id", "embedding", topK = 10)
      .select(col("q_id"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall") // unstructured vectors: weak but real
    assert(ivf.size <= brute.size)
  }
}
