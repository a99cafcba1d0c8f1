package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: item pairs sharing a basket, with lift.
  *
  * The association-mining primitive (and, over token/document pairs, the
  * same shape as PMI collocations in [[LanguageModel]] — lift IS
  * exp(PMI)). Scale shape: the pair generation self-joins the distinct
  * (basket, item) relation on the basket key — one shuffle each side,
  * output bounded by Σ per-basket k·(k−1)/2, which is fine while baskets
  * are small (TPC-H orders: ~4 items). A 100 TB run with mega-baskets
  * caps per-basket fan-out first (top-k items per basket by frequency —
  * the standard Apriori prefilter) before pairing.
  *
  * Determinism: all counts are integers; lift is one integer-ratio
  * division sealed with round(,4) (FIXTURES.md).
  */
object Cooccur {

  /** Item-pair counts and lift over baskets: for pairs with
    * pair-count ≥ `minSupport`,
    * lift = c_ab · N / (c_a · c_b) with N = basket count and c_x =
    * baskets containing x. Item marginals are basket-distinct, pairs
    * are emitted once (item_a < item_b). */
  def pairLift(df: DataFrame, basket: Column, item: Column,
               minSupport: Long): DataFrame = {
    val bi = df.select(basket.as("b"), item.as("it")).distinct()
    val nBaskets = bi.select(col("b")).distinct().count()
    val marg = bi.groupBy(col("it")).agg(count(lit(1)).as("c"))
    val l = bi.select(col("b"), col("it").as("item_a"))
    val r = bi.select(col("b"), col("it").as("item_b"))
    val pairs = l.join(r, Seq("b")).where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= lit(minSupport))
    pairs
      .join(broadcast(marg.select(col("it").as("item_a"), col("c").as("c_a"))),
        Seq("item_a"))
      .join(broadcast(marg.select(col("it").as("item_b"), col("c").as("c_b"))),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"), col("c_b"),
        round((col("c_ab") * lit(nBaskets)).cast("double") /
          (col("c_a") * col("c_b")).cast("double"), 4).as("lift"))
  }
}
