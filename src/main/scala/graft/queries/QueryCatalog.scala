package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver replays in DuckDB on the same parquet.
  *
  * Contract notes (driver compare):
  *  - columns are sorted by NAME before hashing → every computed column is
  *    aliased identically on both sides;
  *  - doubles that are not exactly representable / order-independent are
  *    `round(x, 6)`-ed on BOTH sides so shuffle-order float association
  *    can't flip the hash.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Oracle-SQL idioms shared across query groups — a dependency-free home
  * so no two query objects need to reference each other during
  * initialization (cross-object val cycles deadlock under concurrent
  * first-touch). */
object OracleSql {
  /** SQL mirror of `Dedup.hash60` — the ONE copy of the parity-critical
    * 60-bit md5 idiom every oracle derives hashes from. */
  def hash60(e: String): String =
    s"CAST(('0x'||substring(md5($e),1,15)) AS BIGINT)"
}

object QueryCatalog {
  /** All registered query groups, in SURVEY.md §2 order. */
  def all: Seq[Q] =
    RelationalQueries.all ++
      StatsQueries.all ++
      SurvivalQueries.all ++
      ReshapeQueries.all ++
      ScaleOpsQueries.all ++
      PipelineQueries.all ++
      CurationQueries.all ++
      EmbeddingQueries.all ++
      AnalyticsQueries.all ++
      DomainQueries.all ++
      StreamParityQueries.all

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    byName.map { case (n, q) => n -> q.run }

  def oracleSql: Map[String, String] =
    byName.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }
}
