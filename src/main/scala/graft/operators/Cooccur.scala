package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: item pairs sharing a basket, with lift.
  *
  * The association-mining primitive (and, over token/document pairs, the
  * same shape as PMI collocations in [[LanguageModel]] — lift IS
  * exp(PMI)). Scale shape: ONE shuffle groups items into per-basket
  * sorted arrays, pairs expand MAP-SIDE from each array (no self-join,
  * no sort-merge passes), then one pair-keyed shuffle aggregates counts —
  * output still bounded by Σ per-basket k·(k−1)/2, which is fine while
  * baskets are small (TPC-H orders: ~4 items). Per-group memory is
  * bounded by the largest basket; a 100 TB run with mega-baskets caps
  * per-basket fan-out first (top-k items per basket by frequency — the
  * standard Apriori prefilter) before grouping.
  *
  * Determinism: all counts are integers; lift is one integer-ratio
  * division sealed with round(,4) (FIXTURES.md).
  */
object Cooccur {

  /** Per-basket sorted item arrays — the one basket-keyed shuffle every
    * pair query shares. `distinctItems` picks set semantics (each item
    * once per basket: lift/Jaccard marginals) vs multiset (row-pair
    * counts: the co-purchase edge weights). */
  def basketItems(df: DataFrame, basket: Column, item: Column,
                  distinctItems: Boolean): DataFrame = {
    // NULL basket keys are dropped, not merged into one pseudo-basket:
    // groupBy would retain the null group, fusing unrelated null-key rows
    // into co-occurrence pairs that an equi self-join (the oracle shape,
    // and pairLift's basket count) never produces.
    val g = df.select(basket.as("b"), item.as("it"))
      .where(col("b").isNotNull && col("it").isNotNull).groupBy("b")
    if (distinctItems) g.agg(array_sort(collect_set("it")).as("its"))
    else g.agg(array_sort(collect_list("it")).as("its"))
  }

  /** Unordered pair counts (item_a < item_b) from [[basketItems]] output:
    * each sorted array expands to its i<j combinations map-side (the
    * `y > x` filter both enforces strict ordering and, on multiset
    * arrays, skips equal-item row pairs — matching a `<`-predicate
    * self-join exactly), then ONE pair-keyed shuffle counts. */
  def pairCounts(baskets: DataFrame): DataFrame =
    baskets.select(explode(expr(
        "flatten(transform(its, (x, i) -> " +
          "transform(filter(slice(its, i + 2, size(its)), y -> y > x), " +
          "y -> named_struct('u', x, 'v', y))))")).as("p"))
      .select(col("p.u").as("item_a"), col("p.v").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("c_ab"))

  /** Item-pair counts and lift over baskets: for pairs with
    * pair-count ≥ `minSupport`,
    * lift = c_ab · N / (c_a · c_b) with N = basket count and c_x =
    * baskets containing x. Item marginals are basket-distinct, pairs
    * are emitted once (item_a < item_b). The basket-array table is
    * checkpointed once and re-read by both consumers (marginals,
    * pairs); the basket census reads the source directly as a lazy
    * 1-row aggregate. */
  def pairLift(df: DataFrame, basket: Column, item: Column,
               minSupport: Long): DataFrame = {
    val arr = basketItems(df, basket, item, distinctItems = true)
      .localCheckpoint()
    // N counts every non-null basket key (count(DISTINCT b) semantics) —
    // the array table drops baskets whose items are ALL null, and using
    // its count would inflate every lift on such data. It enters the plan
    // as a LAZY 1-row broadcast (not an eager .count() at construction
    // time): the operator returns a DataFrame, so no corpus action may
    // fire before the caller executes it.
    val nB = df.select(basket.as("b")).where(col("b").isNotNull)
      .agg(countDistinct("b").as("n_baskets"))
    val marg = arr.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = pairCounts(arr).where(col("c_ab") >= lit(minSupport))
    pairs
      .join(marg.select(col("it").as("item_a"), col("c").as("c_a")),
        Seq("item_a"))
      .join(marg.select(col("it").as("item_b"), col("c").as("c_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nB))
      .withColumn("lnum", col("c_ab") * col("n_baskets"))
      .withColumn("lden", col("c_a") * col("c_b"))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"), col("c_b"),
        Seal.ratio4("lnum", "lden").as("lift"))
  }

  /** Directional association rules from the [[pairLift]] machinery:
    * each qualifying unordered pair emits BOTH a→b and b→a with
    *
    *   support = c_ab/N,  confidence = c_ab/c_a,  lift = c_ab·N/(c_a·c_b)
    *
    * ranked by ROUNDED confidence (antecedent/consequent tie-break →
    * engine-stable top-k). Same shape as pairLift: one basket collect,
    * one pair shuffle, item marginals broadcast; the direction union
    * doubles pair rows only (bounded by qualifying pairs, not corpus). */
  def assocRules(df: DataFrame, basket: Column, item: Column,
                 minSupport: Long, k: Int): DataFrame = {
    val arr = basketItems(df, basket, item, distinctItems = true)
      .localCheckpoint()
    // lazy 1-row basket census (same convention as pairLift): an eager
    // .count() here would fire a full corpus action at plan-construction
    // time even if the returned DataFrame is never executed
    val nB = df.select(basket.as("b")).where(col("b").isNotNull)
      .agg(countDistinct("b").as("n_baskets"))
    val marg = arr.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = pairCounts(arr).where(col("c_ab") >= lit(minSupport))
    val both = pairs.select(col("item_a").as("ante"),
        col("item_b").as("cons"), col("c_ab"))
      .unionByName(pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("c_ab")))
    both
      .join(marg.select(col("it").as("ante"), col("c").as("ca")),
        Seq("ante"))
      .join(marg.select(col("it").as("cons"), col("c").as("cc")),
        Seq("cons"))
      .crossJoin(broadcast(nB))
      .withColumn("lnum", col("c_ab") * col("n_baskets"))
      .withColumn("lden", col("ca") * col("cc"))
      .select(col("ante").as("antecedent"), col("cons").as("consequent"),
        col("c_ab").as("n_pair"),
        Seal.ratio4("c_ab", "n_baskets").as("support"),
        Seal.ratio4("c_ab", "ca").as("confidence"),
        Seal.ratio4("lnum", "lden").as("lift"))
      .orderBy(desc("confidence"), col("antecedent"), col("consequent"))
      .limit(k)
  }

  /** Mutual information I(X; Y) in nats between two categorical columns —
    * the dataset-health probe behind "does source predict language?"
    * (high MI between a metadata column and a quality label usually means
    * leakage; near-zero MI means the split is safe to stratify on).
    *
    * I = Σ_cells p(x,y) · ln(p(x,y) / (p(x)p(y))), computed as exact
    * integer cell/margin counts (one (x,y)-keyed shuffle, margins derived
    * by re-aggregation, everything but the cell table one-row-ish and
    * broadcast). Determinism: each cell's ln term is quantized to a
    * fixed-point long (round(ln·1e6)) BEFORE the weighted sum — the q108
    * convention — so the cross-cell aggregation is an exact integer sum
    * at any cell count, then ONE final division sealed with round(,4).
    */
  def mutualInformation(df: DataFrame, x: Column, y: Column): DataFrame = {
    // Null-category rows are excluded BEFORE the cell aggregation so
    // cells, margins, and n cover the same row set — keeping them in n
    // (while the margin equi-joins drop their cells) would leave the
    // summed p(x,y) mass < 1 and bias MI low on null-containing data.
    val cells = df.select(x.as("x"), y.as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint() // margins + total re-aggregate this small table
    val cx = cells.groupBy("x").agg(sum("c_xy").as("c_x"))
    val cy = cells.groupBy("y").agg(sum("c_xy").as("c_y"))
    val tot = cells.agg(sum("c_xy").as("n"))
    cells.join(broadcast(cx), "x").join(broadcast(cy), "y")
      .crossJoin(broadcast(tot))
      .select(col("c_xy"), col("n"),
        round(log((col("c_xy").cast("double") * col("n")) /
          (col("c_x").cast("double") * col("c_y"))) * lit(1000000.0), 0)
          .cast("long").as("lq"))
      .agg(count(lit(1)).as("n_cells"),
        round(sum(col("c_xy") * col("lq")).cast("double") /
          (max(col("n")).cast("double") * lit(1000000.0)), 4).as("mi_nats"))
  }

  /** Adamic-Adar link prediction over co-occurrence baskets: for items
    * a, b the score Σ_{baskets B ∋ a,b} 1/ln|B| — common-neighbor
    * evidence where a 2-item basket (ln 2) certifies far more than a
    * 50-item one (ln 50), the classic fix for raw co-count's hub bias
    * (Adamic & Adar 2003). Top-k pairs by score.
    *
    * Determinism: each basket's weight 10⁶/ln|B| is quantized to a long
    * once per basket, pair scores are exact integer sums of those longs,
    * and the top-k boundary is a total order (score desc, item_a,
    * item_b) — ties cannot flip the emitted set cross-engine. Singleton
    * baskets produce no pairs; |B| ≥ 2 keeps ln positive.
    *
    * Scale: pairs expand map-side from each basket's sorted item array
    * (the [[pairCounts]] device — no positional self-join), so work is
    * Σ|B|² over baskets, bounded by the basket-size cap upstream (order
    * lines ≤ 7 here); ONE pair-keyed shuffle aggregates, and the top-k
    * is a TakeOrdered, never a global sort materialization. */
  def adamicAdar(df: DataFrame, basket: Column, item: Column,
                 k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val arr = basketItems(df, basket, item, distinctItems = true)
      .select(col("its"), size(col("its")).as("sz"))
      .where(col("sz") >= 2)
      .select(col("its"),
        round(lit(1000000.0) / log(col("sz").cast("double")), 0)
          .cast("long").as("w6"))
    arr.select(col("w6"), explode(expr(
        "flatten(transform(its, (x, i) -> " +
          "transform(filter(slice(its, i + 2, size(its)), y -> y > x), " +
          "y -> named_struct('u', x, 'v', y))))")).as("p"))
      .groupBy(col("p.u").as("item_a"), col("p.v").as("item_b"))
      .agg(count(lit(1)).as("n_shared"), sum("w6").as("aa6"))
      .orderBy(desc("aa6"), col("item_a"), col("item_b"))
      .limit(k)
      .select(col("item_a"), col("item_b"), col("n_shared"),
        Seal.pow4("aa6", 6).as("score"))
  }

  /** Information-gain feature ranking: IG(f) = H(y) − H(y|f) for each
    * named, pre-binned feature against the label — the entropy-based
    * cousin of [[mutualInformation]] generalized to a feature PANEL
    * in one pass (the corrMatrix shape): each row explodes to
    * |features| (name, bin) pairs, one cell aggregation computes every
    * feature's contingency simultaneously, margins re-aggregate from
    * the cell table.
    *
    * Bins are carried as strings so heterogeneous feature types share
    * one schema. Rows with a NULL label or NULL bin are excluded per
    * feature (cells, margins, and n stay consistent — the
    * [[mutualInformation]] convention). Each −p·ln(p) term is a fixed
    * expression over exact long counts quantized to 1e-6 fixed-point
    * before the cell-count-sized sum; IG and H(y) derive from the same
    * exact totals, sealed round(,4). */
  def infoGain(df: DataFrame, label: Column,
               features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    def q6(x: Column) = round(x * lit(1e6), 0).cast("long")
    val d = df.select(label.as("y"),
        explode(array(features.map { case (n, c) =>
          struct(lit(n).as("f"), c.cast("string").as("b")) }: _*)).as("s"))
      .select(col("y"), col("s.f").as("f"), col("s.b").as("b"))
      .where(col("y").isNotNull && col("b").isNotNull)
    val cells = d.groupBy("f", "b", "y").agg(count(lit(1)).as("c"))
    val nb = cells.groupBy("f", "b").agg(sum("c").as("nb"))
    val nf = cells.groupBy("f").agg(sum("c").as("n"))
    val cy = cells.groupBy("f", "y").agg(sum("c").as("cy"))
    val ch = cells.join(nb, Seq("f", "b")).join(broadcast(nf), Seq("f"))
      .select(col("f"), q6(col("c").cast("double") / col("n") *
        log(col("c").cast("double") / col("nb"))).as("t"))
      .groupBy("f").agg(sum("t").as("sch"))
    val hy = cy.join(broadcast(nf), Seq("f"))
      .select(col("f"), col("n"), q6(col("cy").cast("double") / col("n") *
        log(col("cy").cast("double") / col("n"))).as("t"))
      .groupBy("f", "n").agg(sum("t").as("shy"))
    hy.join(ch, Seq("f"))
      .withColumn("nshy", -col("shy"))
      .withColumn("ig6", col("sch") - col("shy"))
      .select(col("f").as("feature"), col("n").as("n_rows"),
        Seal.pow4("nshy", 6).as("h_label"),
        Seal.pow4("ig6", 6).as("info_gain"))
      .orderBy("feature")
  }
}
