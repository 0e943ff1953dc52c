package graft.queries

import graft.Tables.t

/** The `spark.sql` TEXT-query surface beyond q255's single aggregate
  * (round 14): the north star is "DataFrame transformations + Spark
  * SQL", and every other gate drives the DataFrame API — these twins
  * prove the SQL parser/temp-view entry path handles a six-table join
  * with a scalar subquery (q260, the TPC-H Q5 shape), a ranked window
  * with the WindowGroupLimit pushdown (q261, q04's shape), and a
  * GraftExtensions-registered native kernel with array arguments and
  * higher-order functions around it (q262, q115's Aho–Corasick
  * blocklist). Each shares its DataFrame twin's DuckDB oracle
  * VERBATIM (looked up from the registry object, not copied), so the
  * two entry paths are pinned to byte-identical results.
  */
object SqlSurfaceQueries {

  private def oracleOf(qs: Seq[Q], name: String): Option[String] =
    qs.find(_.name == name).flatMap(_.oracle)

  /** q260 — SQL-text local-supplier revenue (q243's Q5 shape): the
    * same six-table join written as one SQL string over temp views.
    * Catalyst plans it identically to the DataFrame form — dims
    * collapse and broadcast, facts exchange on their keys — which a
    * matching BENCH profile and the shared oracle both certify.
    */
  private val q260 = Q("q260_sql_join_surface",
    (s, dir) => {
      Seq("lineitem", "orders", "customer", "supplier", "nation",
        "region").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n + "_v"))
      s.sql("""
        SELECT n.n_name AS nation,
          CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice *
            (1 - l.l_discount) * 100) AS BIGINT) AS DECIMAL(38,0)))
            AS BIGINT) AS revenue_cents,
          COUNT(*) AS n_items
        FROM customer_v c
        JOIN orders_v o ON c.c_custkey = o.o_custkey
        JOIN lineitem_v l ON l.l_orderkey = o.o_orderkey
        JOIN supplier_v s ON l.l_suppkey = s.s_suppkey
          AND c.c_nationkey = s.s_nationkey
        JOIN nation_v n ON s.s_nationkey = n.n_nationkey
        JOIN region_v r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = (SELECT MIN(r_name) FROM region_v)
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC, nation""")
    },
    oracleOf(MiscQueries.all, "q243_local_supplier_revenue"))

  /** q261 — SQL-text per-group top-k (q04's shape): ROW_NUMBER window
    * + rank filter as SQL text. The rank-limit pushdown
    * (WindowGroupLimit) fires from the parsed plan exactly as from
    * the DataFrame form.
    */
  private val q261 = Q("q261_sql_window_surface",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_custkey, o_orderkey, rk FROM (
          SELECT o_custkey, o_orderkey,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
          FROM orders_v) ranked
        WHERE rk <= 3
        ORDER BY o_custkey, rk""")
    },
    oracleOf(CoreQueries.all, "q04_window_topk"))

  /** q262 — SQL-text native-kernel call (q115's blocklist screen):
    * `graft_ac_match` invoked from SQL text with an ARRAY literal,
    * wrapped in higher-order TRANSFORM — proves extension-registered
    * kernels compose with the SQL surface, not just
    * `call_function`.
    */
  private val q262 = {
    val pats = Seq("merge join", "window", "spark", "scan", "art",
      "part", "zzznope")
    val plist = pats.map(p => s"'$p'").mkString(", ")
    Q("q262_sql_kernel_surface",
      (s, dir) => {
        t(s, dir, "documents").createOrReplaceTempView("documents_v")
        s.sql(s"""
          SELECT doc_id,
            SIZE(ids) AS n_terms,
            ARRAY_JOIN(TRANSFORM(ids, i -> CAST(i AS STRING)), ',')
              AS term_ids,
            SIZE(ids) > 0 AS flagged
          FROM (SELECT doc_id, graft_ac_match(text, ARRAY($plist))
            AS ids FROM documents_v) hits
          ORDER BY doc_id""")
      },
      oracleOf(TextQueries.all, "q115_blocklist_screen"))
  }

  val all: Seq[Q] = Seq(q260, q261, q262)
}
