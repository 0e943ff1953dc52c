package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark implementation and (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it. Column names/aliases MUST be identical on both sides;
  * both sides carry a total ORDER BY; all double aggregation goes through
  * graft.functions.ExactAgg / Sql mirrors so results are bit-equal.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Scratch-dir discipline for queries that materialize a TableStore /
  * persisted index inside their builder: the store lives only for the
  * duration of the builder, the final (small) scorecard is collected
  * and re-wrapped as a local relation, and the directory is deleted in
  * a finally — Verify and Bench re-invoke builders many times per run,
  * and before this helper a full cycle leaked ~1.5 GB of /tmp/graft_*
  * trees (3,135 dirs measured after round 13). The collect is bounded:
  * every lifecycle/index gate ends in a grouped scorecard of at most a
  * few hundred rows.
  */
object Scratch {
  def withDir(prefix: String)(body: String => DataFrame)(
      implicit s: SparkSession): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    try {
      val df = body(root.toString)
      val rows = df.collect()
      require(rows.length <= 100000,
        s"$prefix scorecard unexpectedly large (${rows.length} rows) — " +
          "withDir is for bounded scorecards only")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally deleteRecursively(root)
  }

  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
