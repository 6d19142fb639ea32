package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: frequent item PAIRS with support
  * and lift — the association-rule primitive (Agrawal & Srikant's
  * Apriori, truncated at the pair level, which is where web-scale
  * co-occurrence analysis lives: related-items, query suggestion,
  * co-citation).
  */
object Baskets {

  /** Item pairs co-occurring in at least `minSupport` baskets, with each
    * item's own basket count and the lift
    * `n_baskets · c_ab / (c_a · c_b)` (> 1 = the pair co-occurs more
    * than independence predicts), on the 10^-4 grid.
    *
    * Scale shape: ONE per-basket aggregate collapses the input to
    * sorted distinct item sets (bounded by basket size — the natural
    * blocking unit), the C(n,2) pair fan-out runs MAP-SIDE off that set
    * (a fused transform/slice HOF — a self-join on the basket key would
    * pay three exchanges where this pays one), pair counts are
    * map-combined, and the support filter applies BEFORE the per-item
    * count joins, so the join input is the frequent pairs, not the pair
    * universe. Item counts and the basket total ride broadcast-able
    * relations (|items| rows and 1 row).
    *
    * Giant baskets are the skew hazard (C(n,2) on one row): `maxBasket`
    * drops baskets with more distinct items, loudly countable via
    * [[oversizedBaskets]] — the hammingPairs cap-and-observe contract.
    *
    * @return (item_a, item_b, c_ab, c_a, c_b, lift) with item_a < item_b
    */
  def frequentPairs(
      df: DataFrame,
      basket: Column,
      item: Column,
      minSupport: Long,
      maxBasket: Int = 1024,
      scale: Int = 4): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    // materialized: the basket total, the item counts, and the pair
    // fan-out all read these partials — without the checkpoint each
    // consumer embeds its own copy of the input scan + basket aggregate
    // (exchange reuse cannot merge them), scanning the input three times
    val sets = graft.Materialize(df
      .select(basket.as("b"), item.cast("long").as("i"))
      .where(col("i").isNotNull)
      .groupBy(col("b")).agg(sort_array(collect_set(col("i"))).as("is"))
      .where(size(col("is")) <= maxBasket))
    val nBaskets = sets.agg(count(lit(1)).as("n_baskets"))
    val itemCounts = sets
      .select(explode(col("is")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("c"))
    val pairCounts = sets
      .select(explode(flatten(transform(col("is"), (x, ix) =>
        transform(slice(col("is"), ix + lit(2), greatest(size(col("is")) - ix - 1, lit(0))),
          y => struct(x.as("ia"), y.as("ib"))))))
        .as("p"))
      .groupBy(col("p.ia").as("item_a"), col("p.ib").as("item_b"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minSupport)
    pairCounts
      .join(itemCounts.select(col("i").as("item_a"), col("c").as("c_a")), Seq("item_a"))
      .join(itemCounts.select(col("i").as("item_b"), col("c").as("c_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("n_baskets") * col("c_ab") / (col("c_a") * col("c_b")), scale).as("lift"))
  }

  /** The baskets a given `maxBasket` cap would drop from
    * [[frequentPairs]] — the observability half of the cap contract.
    */
  def oversizedBaskets(
      df: DataFrame,
      basket: Column,
      item: Column,
      maxBasket: Int): DataFrame =
    df.select(basket.as("b"), item.cast("long").as("i"))
      .where(col("i").isNotNull)
      .groupBy(col("b")).agg(countDistinct(col("i")).as("n_items"))
      .where(col("n_items") > maxBasket)
}
