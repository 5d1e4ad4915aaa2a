package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A2/A3/A4 — idempotent stage materialization with an existence probe,
  * replacing the reference's `.rds` cache convention and its 3-way branch
  * (`any(list.files() %in% paste(cancer, "_vital_stat.rds"))` →
  * reuse-fitted / reuse-raw / download, vital_status_DESeq.R:22-52).
  *
  * Parquet stages replace `saveRDS`/`readRDS`; the `_SUCCESS` marker makes
  * the probe atomic-ish (a half-written stage is rebuilt, not reused).
  * At 100 TB this is the checkpoint pattern: each expensive intermediate
  * (fitted model table, VST matrix) lands once and later pipeline runs
  * skip straight to the cached parquet scan with full pushdown.
  */
object Stages {

  /** A4 — cache-existence probe. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  /** A3 — materialize a stage (overwrite). */
  def materialize(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** A2+A3+A4 — read the stage if present, else build + materialize it.
    * `stagePath(cancer, stage)`-style naming is the caller's convention,
    * mirroring the reference's `paste(cancer, "_vital_stat.rds")`. */
  def loadOrBuild(spark: SparkSession, path: String)(build: => DataFrame): DataFrame =
    if (exists(spark, path)) spark.read.parquet(path)
    else materialize(build, path)
}
