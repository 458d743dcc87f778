package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Order-statistics selection operators: Pareto-frontier (skyline)
  * extraction and exact equi-depth quantile binning — the two
  * "rank-shaped" operators a curation pipeline runs that naively demand
  * a global sort, each rebuilt here on a domain-reduction / two-phase
  * device so no stage ever funnels the corpus through one task.
  */
object Frontier {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q153:
    // Skyline (Pareto frontier) over part (maximize p_size, minimize
    // p_retailprice): the parts no other part strictly dominates. The
    // naive formulation is a NOT EXISTS all-pairs self-join — O(n²) and
    // a nested loop at any scale. This plan exploits that dominance only
    // depends on the per-size MINIMUM price: one map-side-combined
    // groupBy collapses the corpus to |size-domain| rows (50 here;
    // bounded at any corpus size), the strictly-larger-size running min
    // runs on that constant-size frame (the only unpartitioned window —
    // 50 rows by construction), and frontier membership joins back as a
    // BROADCAST semi-probe. Prices are compared and selected, never
    // operated on — no float arithmetic, bit-stable across engines.
    QueryDef(
      "q153_skyline",
      (s, d) => {
        val part = Tables(s, d, "part")
        val cm = part.groupBy("p_size").agg(min("p_retailprice").as("m"))
        val wLarger = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        // frontier sizes: the class min must beat every larger size's
        // class min STRICTLY (equal price at larger size dominates)
        val sky = cm.withColumn("ml", min("m").over(wLarger))
          .filter(col("ml").isNull || col("m") < col("ml"))
          .select(col("p_size").as("sky_size"), col("m"))
        part.join(broadcast(sky),
            col("p_size") === col("sky_size") &&
              col("p_retailprice") === col("m"))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
          .orderBy(col("p_size").desc, col("p_partkey"))
      },
      Some("""
        WITH cm AS (SELECT p_size, min(p_retailprice) AS m
                    FROM part GROUP BY 1),
        w AS (SELECT p_size, m,
                min(m) OVER (ORDER BY p_size DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ml
              FROM cm),
        sky AS (SELECT p_size, m FROM w WHERE ml IS NULL OR m < ml)
        SELECT p.p_partkey, p.p_size, p.p_retailprice
        FROM part p JOIN sky s
          ON p.p_size = s.p_size AND p.p_retailprice = s.m
        ORDER BY p.p_size DESC, p.p_partkey""")),

    // -------------------------------------------------------------- q154:
    // Exact equi-depth decile binning of o_totalprice — the feature-
    // engineering transform (quantile bucketizer) that naively needs
    // row_number() OVER (ORDER BY price): a full-corpus single-task
    // sort. Rebuilt on the q102 two-phase device, aligned to the VALUE
    // axis: fixed-width price stripes (floor(price/10k) — order-aligned
    // with the sort key, so stripe offsets + local ranks compose to the
    // exact global rank), per-stripe counts, an exclusive cumsum over
    // the ~50 stripe rows (the only low-parallelism window, bounded by
    // the stripe domain at ANY corpus size), broadcast back, local
    // row_number within each stripe. bin = (rank-1)·10 DIV n — exact
    // integer division, no ntile ambiguity. Output: per-bin count and
    // [min,max] price extent (selection only, no float arithmetic).
    QueryDef(
      "q154_quantile_binning",
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .withColumn("stripe",
            floor(col("o_totalprice") / 10000.0).cast("long"))
        val sCounts = o.groupBy("stripe").agg(count(lit(1)).as("cnt"))
        val wS = Window.orderBy(col("stripe"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val sOff = sCounts
          .withColumn("off", coalesce(sum(col("cnt")).over(wS), lit(0L)))
          .drop("cnt")
        val n = o.agg(count(lit(1)).as("n"))
        val wLoc = Window.partitionBy(col("stripe"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.join(broadcast(sOff), Seq("stripe"))
          .withColumn("rank", col("off") + row_number().over(wLoc))
          .crossJoin(broadcast(n))
          .withColumn("bin",
            expr("CAST((rank - 1) * 10 DIV n AS INT)"))
          .groupBy("bin").agg(
            count(lit(1)).as("n_rows"),
            min("o_totalprice").as("lo"),
            max("o_totalprice").as("hi"))
          .orderBy("bin")
      },
      Some("""
        WITH r AS (SELECT o_totalprice,
                     ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                       AS rank,
                     COUNT(*) OVER () AS n
                   FROM orders)
        SELECT CAST((rank - 1) * 10 // n AS INTEGER) AS bin,
               count(*) AS n_rows,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi
        FROM r GROUP BY 1 ORDER BY 1"""))
  )
}
