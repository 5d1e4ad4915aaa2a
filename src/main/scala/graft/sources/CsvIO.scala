package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A5/A6 — delimited parameter-list scan and wide CSV export
  * (reference: `read.delim("genes.txt", header=F)[,1]` at
  * BRCA_path_stage_DESeq.R:7-9 / drug_km_median_exp.R:23-30, and
  * `write.csv(count_csv, row.names=F)` with NA→"" at
  * vital_status_DESeq.R:174-175).
  */
object CsvIO {

  /** Read a tab-delimited parameter file. Tiny driver-side config tables —
    * the one legitimate `collect()` in the engine (they parameterize plans,
    * they are not on the fact path). */
  def readDelim(spark: SparkSession, path: String, header: Boolean = false,
      sep: String = "\t"): DataFrame =
    spark.read.option("sep", sep).option("header", header.toString).csv(path)

  /** First column of a param file as an uppercased gene/cancer list
    * (`toupper(goi)`, vital_status_DESeq.R:4). */
  def readParamList(spark: SparkSession, path: String): Seq[String] =
    readDelim(spark, path).collect().map(_.getString(0).trim.toUpperCase)
      .filter(_.nonEmpty).toSeq

  /** Wide CSV export, NULL→"" (F10), single header file. `coalesce(1)` is
    * presentation-edge only — the frames exported this way are
    * genes×groups wide tables, never the fact table. */
  def writeWideCsv(df: DataFrame, path: String): Unit = {
    val stringified = df.select(df.columns.toIndexedSeq.map(c => df(c).cast("string").as(c)): _*)
    stringified.na.fill("")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}
