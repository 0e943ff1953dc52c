package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket analysis — co-occurrence association rules
  * (Agrawal & Srikant 1994's support/confidence frame, with lift as
  * the ranking), the classic "frequently bought together" operator
  * applied anywhere items co-occur in a container: parts per order,
  * tags per document, tools per session.
  */
object Basket {

  /** Directed association rules a→b over (basket, item) rows:
    * support n_both = |baskets containing both|, confidence
    * ⌊10⁶·n_both/n_a⌋ and lift ⌊10⁶·n_both·N/(n_a·n_b)⌋ — exact
    * integral ratios (`div`; products in decimal(38,0), a lift
    * numerator at corpus scale overflows a long and ANSI would fail
    * the job loudly). Rules below `minSupport` baskets are pruned
    * BEFORE the support joins; the report is the top `k` by
    * (lift desc, antecedent, consequent) — tie-free.
    *
    * Scale: the (basket, item) frame dedupes ONCE (map-side
    * combined); pair counting is the basket-keyed self-join — a
    * basket of m items fans out m·(m−1) pairs, so baskets wider than
    * `maxBasketItems` are EXCLUDED with their pairs (the hub guard:
    * a degenerate mega-basket — a crawler session touching every
    * item — contributes quadratic pairs and no signal; the cap makes
    * the skew bound explicit). Item supports are vocab-bounded and
    * broadcast into the bounded pair frame; N rides a one-row
    * broadcast. The final rank is over the pruned rule frame only.
    */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minSupport: Long, k: Int,
                       maxBasketItems: Int = 256): DataFrame = {
    require(minSupport >= 1, s"minSupport >= 1, got $minSupport")
    require(k >= 1, s"k >= 1, got $k")
    require(maxBasketItems >= 2,
      s"maxBasketItems >= 2, got $maxBasketItems")
    val D = "decimal(38,0)"
    val items = baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__o"), col(itemCol).as("__i"))
      .distinct()
    val sized = items.groupBy(col("__o"))
      .agg(count(lit(1)).as("__m"))
      .filter(col("__m") <= maxBasketItems)
      .select(col("__o"))
    // the deduped size-capped (basket, item) frame feeds FOUR
    // consumers (N, item supports, both self-join legs); un-pinned it
    // re-executed source→distinct→cap per consumer (40 parquet scans
    // in the q182 plan). Checkpointed it computes once, and since the
    // hub-guard join leaves it hash-partitioned by basket, the pair
    // self-join below runs exchange-free on both legs
    val (kept, _) = Loops.truncate(items.join(sized, Seq("__o")))
    val nb = kept.agg(countDistinct(col("__o")).as("__n"))
    val sup = kept.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = kept.select(col("__o"), col("__i").as("ia"))
      .join(kept.select(col("__o"), col("__i").as("ib")), Seq("__o"))
      .filter(col("ia") =!= col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    val scored = pairs
      .join(broadcast(sup.select(col("__i").as("ia"),
        col("__ni").as("__na"))), Seq("ia"))
      .join(broadcast(sup.select(col("__i").as("ib"),
        col("__ni").as("__nb"))), Seq("ib"))
      .crossJoin(broadcast(nb))
      .select(col("ia").as("antecedent"), col("ib").as("consequent"),
        col("n_both").cast("long").as("n_both"),
        expr(s"(CAST(1000000 AS $D) * n_both) div __na")
          .cast("long").as("conf_ppm"),
        expr(s"(CAST(1000000 AS $D) * n_both * __n) div " +
          s"(CAST(__na AS $D) * __nb)").cast("long").as("lift_ppm"))
    TopK.perGroup(scored, Seq(lit(1)),
        Seq(col("lift_ppm").desc, col("antecedent"),
          col("consequent")), k)
      .drop("rk")
  }
}
