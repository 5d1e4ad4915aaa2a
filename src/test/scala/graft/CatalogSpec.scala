package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Catalog hygiene (r7 verdict #7): the registry's structural invariants,
  * asserted so coverage claims stay mechanically checkable as rounds add
  * queries. No SparkSession needed — this is pure registry/docs math.
  */
class CatalogSpec extends AnyFunSuite {

  /** The same group lists `QueryCatalog.all` concatenates, named. Adding a
    * 12th group to the catalog without listing it here fails the
    * union-equality test below. */
  private val groups: Seq[(String, Seq[Q])] = Seq(
    "RelationalQueries" -> RelationalQueries.all,
    "StatsQueries" -> StatsQueries.all,
    "SurvivalQueries" -> SurvivalQueries.all,
    "ReshapeQueries" -> ReshapeQueries.all,
    "ScaleOpsQueries" -> ScaleOpsQueries.all,
    "PipelineQueries" -> PipelineQueries.all,
    "CurationQueries" -> CurationQueries.all,
    "EmbeddingQueries" -> EmbeddingQueries.all,
    "AnalyticsQueries" -> AnalyticsQueries.all,
    "DomainQueries" -> DomainQueries.all,
    "StreamParityQueries" -> StreamParityQueries.all)

  test("every catalog query appears in exactly one group list") {
    val owners = groups.flatMap { case (g, qs) => qs.map(q => q.name -> g) }
    val dup = owners.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty,
      s"queries owned by multiple groups: ${dup.map { case (n, gs) =>
        s"$n -> ${gs.map(_._2).mkString(",")}" }.mkString("; ")}")
    assert(owners.map(_._1).toSet == QueryCatalog.all.map(_.name).toSet,
      "group union != QueryCatalog.all — a group was added to the " +
        "catalog without being listed in CatalogSpec.groups")
  }

  test("SURVEY.md §2.Z catalog map equals the registered catalog exactly") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val begin = survey.indexOf("<!-- catalog-map:begin -->")
    val end = survey.indexOf("<!-- catalog-map:end -->")
    assert(begin >= 0 && end > begin,
      "SURVEY.md lost the catalog-map fence markers")
    val listed = "`([a-z][a-z0-9]*_[a-z0-9_]+)`".r
      .findAllMatchIn(survey.substring(begin, end)).map(_.group(1)).toSet
    val registered = QueryCatalog.all.map(_.name).toSet
    val unlisted = registered -- listed
    val phantom = listed -- registered
    assert(unlisted.isEmpty,
      s"registered queries missing from SURVEY.md §2.Z (add them to the " +
        s"catalog map): ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(phantom.isEmpty,
      s"SURVEY.md §2.Z lists unregistered queries (stale rows?): " +
        s"${phantom.toSeq.sorted.mkString(", ")}")
  }

  test("every oracled query has unique name and non-empty oracle SQL") {
    val qs = QueryCatalog.all
    assert(qs.map(_.name).distinct.size == qs.size)
    qs.foreach { q =>
      q.oracle.foreach(sql => assert(sql.trim.nonEmpty, q.name))
      assert(q.name.matches("[a-z][a-z0-9]*_[a-z0-9_]+"),
        s"non-conforming query id: ${q.name}")
    }
  }
}
