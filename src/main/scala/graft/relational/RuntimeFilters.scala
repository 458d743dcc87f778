package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det._

/** Runtime (adaptive) row-level filtering: Spark's bloom-filter runtime
  * filter injected across a shuffle join — the mechanism that lets a
  * selective dimension predicate prune the 100 TB fact side's shuffle
  * without broadcasting the dimension.
  */
object RuntimeFilters {

  /** Scope the configs that make Catalyst's `InjectRuntimeFilter` rule
    * fire at fixture scale: the application-side scan-size threshold
    * defaults to 10 GB (a local fixture never qualifies), and a
    * broadcast-able creation side suppresses the bloom (broadcast joins
    * already prune at the probe). At warehouse scale NEITHER override is
    * needed — the fact-side scan passes the 10 GB bar on its own, and the
    * filtered dimension can exceed the broadcast threshold while staying
    * under the 10 MB bloom creation bar. try/finally-scoped per the q77
    * precedent; the query EXECUTES inside the scope (localCheckpoint)
    * because runtime-filter injection happens at optimization time, which
    * for a lazily-returned frame would run after the restore.
    */
  private def withRuntimeFilterScope[T](s: SparkSession)(f: => T): T = {
    val kB = "spark.sql.autoBroadcastJoinThreshold"
    val kS = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val prevB = s.conf.get(kB)
    val prevS = s.conf.get(kS)
    s.conf.set(kB, "-1")
    s.conf.set(kS, "0")
    try f
    finally {
      s.conf.set(kB, prevB)
      s.conf.set(kS, prevS)
    }
  }

  /** The join: a doubly-selective predicate on orders (priority + a
    * 2-month date slice) against the lineitem fact table. The bloom built
    * from the filtered orders keys reaches lineitem BELOW its shuffle as
    * `might_contain(xxhash64(l_orderkey))` — non-qualifying fact rows are
    * dropped at the scan side of the exchange, so the shuffle carries ~2%
    * of lineitem instead of all of it. That is the entire point: at
    * 100 TB the exchange, not the join, is the bottleneck this removes.
    */
  private def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") < lit("1995-03-01"))
    val l = Tables(s, d, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderdate")
      .agg(count(lit(1)).as("n_items"),
        sum(dec4(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderdate")
  }

  /** Spec probe: execute inside the scope and hand back the executed plan
    * (the declared query returns a checkpointed frame whose plan is just
    * the checkpoint scan). */
  private[graft] def bloomPlanProbe(s: SparkSession, d: String): String =
    withRuntimeFilterScope(s) {
      val df = bloomJoin(s, d)
      df.collect()
      df.queryExecution.executedPlan.toString
    }

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q134:
    // Runtime bloom-filter join (see bloomJoin above). Result is the
    // plain join semantics — the bloom is a pure plan optimization, which
    // is exactly what makes it oracle-pairable; PlanShapeSpec pins the
    // might_contain/bloom_filter_agg plan shape so a Spark upgrade that
    // silently stops injecting the filter fails loudly.
    QueryDef(
      "q134_bloom_filter_join",
      (s, d) => withRuntimeFilterScope(s) { bloomJoin(s, d).localCheckpoint() },
      Some("""
        SELECT o.o_orderdate,
               count(*) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
          AND o.o_orderdate < DATE '1995-03-01'
        GROUP BY 1
        ORDER BY o_orderdate"""))
  )
}
