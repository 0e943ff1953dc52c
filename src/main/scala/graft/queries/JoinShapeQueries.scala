package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-14 deep-join coverage widening: the remaining classic TPC-H
  * join patterns next to Q1 (q255), Q3 (q244), Q5 (q243/q260) and Q18
  * (q251) — the returned-item customer ranking (Q10 shape, q263), the
  * two-nation volume-shipping pair join (Q7 shape, q264), and the
  * disjunctive bracket join (Q19 shape, q265). Each pins a distinct
  * optimizer behavior: fact-fact join into a global TakeOrdered, a
  * broadcast dim carrying an OR-of-pairs residual, and an equi-join
  * with a cross-side disjunctive residual condition.
  */
object JoinShapeQueries {

  private def cents = round(col("l_extendedprice") *
    (lit(1) - col("l_discount")) * 100, 0).cast("long")

  /** q263 — returned-item revenue per customer (the TPC-H Q10 shape):
    * one year of orders, only RETURNED lineitems, revenue rolled up
    * per (customer, nation) and cut to the global top 20. Scale: the
    * return-flag filter reaches the lineitem scan, nation broadcasts,
    * the per-customer rollup reduces the fact stream before the
    * TakeOrdered cut — no global sort.
    */
  private val q263 = Q("q263_returned_revenue",
    (s, dir) => {
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), cents.as("cents"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
          AS BIGINT)) AS BIGINT) AS revenue_cents,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue_cents DESC, c_custkey LIMIT 20"""))

  /** q264 — two-nation shipping volume (the TPC-H Q7 shape): revenue
    * between the lexicographically first and last nations, both
    * directions, per (supplier nation, customer nation, ship year).
    * The nation endpoints come from a 25-row metadata collect (the
    * q243 convention). Scale: supplier⋈nation and customer⋈nation
    * pre-reduce to keyed sides; the OR-of-direction pair filter is a
    * residual on the already-joined nation names — no extra join.
    */
  private val q264 = Q("q264_nation_volume",
    (s, dir) => {
      val bounds = t(s, dir, "nation")
        .agg(min(col("n_name")), max(col("n_name"))).head
      val (lo, hi) = (bounds.getString(0), bounds.getString(1))
      val n = t(s, dir, "nation")
        .filter(col("n_name").isin(lo, hi))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("ship_year"),
          cents.as("cents"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === lo && col("cust_nation") === hi)
          || (col("supp_nation") === hi && col("cust_nation") === lo))
        .groupBy(col("supp_nation"), col("cust_nation"),
          col("ship_year"))
        .agg(sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy(col("supp_nation"), col("cust_nation"),
          col("ship_year"))
    },
    Some("""WITH b AS (SELECT MIN(n_name) AS lo, MAX(n_name) AS hi
        FROM nation)
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
        CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
          AS BIGINT)) AS BIGINT) AS revenue_cents,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey, b
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND ((n1.n_name = b.lo AND n2.n_name = b.hi)
          OR (n1.n_name = b.hi AND n2.n_name = b.lo))
      GROUP BY n1.n_name, n2.n_name, ship_year
      ORDER BY supp_nation, cust_nation, ship_year"""))

  /** q265 — disjunctive bracket join (the TPC-H Q19 shape): lineitem
    * equi-joins part on the key while an OR of three
    * (brand, size-band, quantity-band) brackets — a condition
    * spanning BOTH sides — rides as the residual. Scale: Catalyst
    * keeps the equi hash join and evaluates the disjunction as a
    * post-join filter; the all-brackets size ceiling could be pushed
    * to the part scan by hand, but the join key is the movement
    * contract either way.
    */
  private val q265 = Q("q265_bracket_join",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      def bracket(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
          col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), cents.as("cents"))
        .join(p, col("l_partkey") === col("p_partkey") &&
          (bracket("Brand#12", 15, 1, 11) ||
            bracket("Brand#23", 25, 10, 20) ||
            bracket("Brand#34", 35, 20, 30)))
        .agg(sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("revenue_cents"),
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
    },
    Some("""SELECT
        CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
          AS BIGINT)) AS BIGINT) AS revenue_cents,
        COUNT(*) AS n_items,
        CAST(CAST(SUM(l_quantity) AS DOUBLE) AS BIGINT) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
          AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
          AND l_quantity BETWEEN 20 AND 30)"""))

  val all: Seq[Q] = Seq(q263, q264, q265)
}
