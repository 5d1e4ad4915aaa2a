package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.QueryCatalog; this object is the
  * stable facade the driver calls.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §3.1 minimum slice: VST-normalized two-group differential
    * expression with Wilcoxon + BH + significance banding. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.byName("de1_pipeline_wilcoxon").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (iterative NB-GLM fits). */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
