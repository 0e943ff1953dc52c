package graft.queries

/** All operator-coverage queries, keyed by name. SparkEntry derives the
  * driver-contract maps from this single list.
  */
object Registry {
  val all: Seq[Q] = CoreQueries.all ++ TextQueries.all ++
    VectorQueries.all ++ GeoQueries.all ++ MultimodalQueries.all ++
    MiscQueries.all ++ CorpusQueries.all ++ ZoningQueries.all ++
    SamplingQueries.all ++ LifecycleQueries.all ++
    CivicLifecycleQueries.all ++ SqlSurfaceQueries.all ++
    JoinShapeQueries.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
