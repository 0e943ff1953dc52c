package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the query registry: SparkEntry's
  * maps are built from this, and the correctness gate silently weakens
  * (rows-only) for any query missing an oracle.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and follow the qNN_ convention") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString(", "))
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
  }

  test("every query carries a DuckDB oracle (full-strength gate)") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"rows-only queries: $missing")
  }

  test("oracle SQL references only tables the driver provides") {
    val tables = graft.Tables.names.toSet
    // crude but effective: every FROM/JOIN target that isn't a CTE or
    // subquery must be a known table
    for (q <- Registry.all; oracle <- q.oracle) {
      // string literals first ("funds FROM operations" in q259's
      // metric descriptions is prose, not a relation), then line
      // comments (q132 documents its join-key CTE with `--` prose
      // containing the words "join condition"), then
      // EXTRACT(part FROM col) — the one non-relation SQL use of FROM
      val sql = oracle.replaceAll("'(?:[^']|'')*'", "''")
        .replaceAll("(?m)--.*$", "")
        .replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
      val ctes =
        "(?i)([a-z0-9_]+)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // a name followed by `(` is a table function (unnest, range), not
      // a relation
      val refs = "(?i)(?:FROM|JOIN)\\s+([a-z0-9_]+)\\b(?!\\s*\\()".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- ctes -- tables
      assert(unknown.isEmpty, s"${q.name}: unknown relations $unknown")
    }
  }

  test("SparkEntry maps mirror the registry") {
    assert(graft.SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(graft.SparkEntry.oracleSql.keySet ==
      Registry.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }
}
