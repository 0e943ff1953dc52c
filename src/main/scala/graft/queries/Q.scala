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
