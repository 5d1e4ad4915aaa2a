package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Pq}
import graft.queries.FrozenModels

/** Measurement harness for the disk-index LIFECYCLE at scale (r15): build
  * the IVF-PQ layout over half the corpus, land the other half as many
  * exactly-once `batchId` appends (the daily-increment shape), then
  * measure the pruned serve over the fragmented layout, compact, and
  * measure again — plus the row-level identity serve-before ≡ serve-after.
  * Prints per-phase seconds and the per-cell/total parquet file counts
  * that compaction exists to bound.
  *
  * Usage: runMain graft.ProfileIndexLifecycle [sfDir] [nBatches] [cpus]
  */
object ProfileIndexLifecycle {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/td43_10")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = "/tmp/graft_lifecycle_idx"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def parquetFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      // corpusPath resolves the live generation (post-compact it is no
      // longer `corpus/`); strip a possible file: scheme for java.io
      walk(new java.io.File(
        new java.net.URI(Ann.corpusPath(spark, path)).getPath))
    }

    val emb = Tables.embeddings(spark, d)
    val pq = Some(Pq.PqModel(8, 8, FrozenModels.pqBooks))
    val base = emb.filter(col("vec_id") % 2 === 0)
    println(s"[lifecycle] corpus=${emb.count()} base=${base.count()} batches=$nBatches")

    time("build (half corpus)") {
      Ann.writeIvfIndex(base, "vec_id", "embedding", path, k = 8, iters = 2, pq = pq)
    }
    time(s"$nBatches batchId appends") {
      (0 until nBatches).foreach { i =>
        Ann.appendIvfIndex(
          emb.filter(col("vec_id") % 2 === 1 &&
            pmod(col("vec_id"), lit(2 * nBatches)) === 2 * i + 1),
          "vec_id", "embedding", path, pq = pq, batchId = Some(s"day$i"))
      }
    }
    val filesBefore = parquetFiles()
    println(s"[lifecycle] files before compact: ${filesBefore.size}")

    val queries = emb.filter(col("vec_id") % 1000 === 0)
    def serve(nProbe: Int) = Ann.ivfIndexTopK(spark, path, queries,
        "vec_id", "embedding", nProbe = nProbe, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val pruned1 = time("serve nProbe=2 (fragmented)")(serve(2))
    val exact1 = time("serve nProbe=8 (fragmented)")(serve(8))

    time("compactIvfIndex")(Ann.compactIvfIndex(spark, path))
    val filesAfter = parquetFiles()
    println(s"[lifecycle] files after compact: ${filesAfter.size}")

    val pruned2 = time("serve nProbe=2 (compacted)")(serve(2))
    val exact2 = time("serve nProbe=8 (compacted)")(serve(8))
    println(s"[lifecycle] pruned identical: ${pruned1 == pruned2}  " +
      s"exact identical: ${exact1 == exact2}")
    // the corpus row count must equal the source (every batch exactly once)
    println(s"[lifecycle] stored rows: ${
      spark.read.parquet(Ann.corpusPath(spark, path)).count()}")

    // DELETE leg (r16): tombstone a 1-in-7 slice, measure the masked
    // serve (anti-join overhead on top of the pruned scan), then the
    // compaction that MATERIALIZES it — and pin row counts at each step
    val delIds = emb.filter(col("vec_id") % 7 === 0)
    time("deleteFromIndex (1/7 of ids)") {
      Ann.deleteFromIndex(spark, path, delIds, "vec_id")
    }
    val prunedMasked = time("serve nProbe=2 (masked)")(serve(2))
    val exactMasked = time("serve nProbe=8 (masked)")(serve(8))
    println(s"[lifecycle] masked results ∩ deleted ids: ${
      prunedMasked.count(r => r._3 % 7 == 0) + exactMasked.count(r => r._3 % 7 == 0)
    } (must be 0)")
    time("compactIvfIndex (materialize deletes)") {
      Ann.compactIvfIndex(spark, path)
    }
    println(s"[lifecycle] files after delete-compact: ${parquetFiles().size}")
    val prunedFinal = time("serve nProbe=2 (materialized)")(serve(2))
    val exactFinal = time("serve nProbe=8 (materialized)")(serve(8))
    println(s"[lifecycle] masked ≡ materialized: ${
      prunedMasked == prunedFinal && exactMasked == exactFinal}")
    println(s"[lifecycle] stored rows after materialize: ${
      spark.read.parquet(Ann.corpusPath(spark, path)).count()} " +
      s"(expected ${emb.count() - delIds.count()})")
    spark.stop()
  }
}
