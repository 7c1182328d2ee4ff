package graft

import graft.queries._

/** Central registry of every declared engine query (SURVEY.md §2 inventory).
  * Families are added as they are implemented; SparkEntry delegates here. */
object Registry {
  def families: Seq[Seq[Q]] = Seq(
    EventQueries.all,
    AggQueries.all,
    FilterQueries.all,
    JoinQueries.all,
    WindowQueries.all,
    SortSetQueries.all,
    ScalarQueries.all,
    SqlSurfaceQueries.all,
    SketchQueries.all,
    DedupQueries.all,
    SimilarityQueries.all,
    TextQueries.all,
    EmbeddingQueries.all,
    PipelineQueries.all,
    MultimodalQueries.all,
    StarTreeQueries.all,
    IndexQueries.all,
    GraphQueries.all)

  lazy val all: Seq[Q] = {
    val qs = families.flatten
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
