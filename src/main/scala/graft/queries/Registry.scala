package graft.queries

/** All named operator queries, one place. SparkEntry derives its
  * `queries`/`oracleSql` maps from here; each group file documents which
  * SURVEY.md §2 operators it covers. */
object Registry {
  def all: Seq[QueryDef] =
    Core.defs ++ Domain.defs ++ Text.defs ++ Curation.defs ++ Vectors.defs ++ Clustering.defs ++ Events.defs ++ Extensions.defs ++ Retrieval.defs ++ Learning.defs ++ Media.defs
}
