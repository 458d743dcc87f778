package graft.relational

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det._

/** `Dataset.observe()` as a declared, oracle-paired query (previously
  * spec-only — OperatorsSpec proves the listener mechanics; this makes
  * the surface part of the driver-checked suite).
  *
  * The operational point of observe(): data-quality metrics ride the
  * SAME physical pass as the business result — at 100 TB a separate
  * metrics query would double the scan, and a `.count()`-style probe
  * would add an action per metric. Here ONE pass produces both the
  * per-flag revenue aggregate and the scan-level audit metrics
  * (row count, suspicious-discount count, exact quantity sum, max ship
  * timestamp), and the audit values are stamped onto every output row —
  * the provenance-stamped shape a DQ pipeline lands in its lakehouse.
  */
object Observability {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q181:
    // observe()-stamped aggregate: per-returnflag revenue + scan-level
    // audit metrics from the same single pass over lineitem. The
    // localCheckpoint is the ONE action that drives the pass; obs.get
    // then returns without further work (collecting 4 scalars to the
    // driver — metrics, not data). All observed aggregates are
    // order-free (count / conditional count / decimal-exact sum / max),
    // so the stamp is deterministic under any partitioning.
    QueryDef(
      "q181_observe_metrics",
      (s, d) => {
        val obs = Observation()
        val li = Tables(s, d, "lineitem").observe(obs,
          count(lit(1)).as("n_rows"),
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
            .as("n_discounted"),
          dsum(col("l_quantity")).as("sum_qty"),
          // NTZ -> TIMESTAMP cast is micro-identical under the UTC
          // session TZ; unix_micros then matches DuckDB's epoch_us
          max(unix_micros(col("l_shipdate").cast("timestamp")))
            .as("max_ship_us"))
        val agg = li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_flag"),
            revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
          .localCheckpoint(true)
        val m = obs.get
        import s.implicits._
        val metrics = Seq((
            m("n_rows").asInstanceOf[Long],
            m("n_discounted").asInstanceOf[Long],
            m("sum_qty").asInstanceOf[Double],
            m("max_ship_us").asInstanceOf[Long]))
          .toDF("n_rows", "n_discounted", "sum_qty", "max_ship_us")
        agg.crossJoin(broadcast(metrics)).orderBy("l_returnflag")
      },
      Some("""
        WITH agg AS (
          SELECT l_returnflag, COUNT(*) AS n_flag,
                 CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
                   (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))),
                   4) AS DOUBLE) AS revenue
          FROM lineitem GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n_rows,
                 CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_discounted,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
                   AS sum_qty,
                 MAX(epoch_us(l_shipdate)) AS max_ship_us
          FROM lineitem)
        SELECT agg.*, m.* FROM agg CROSS JOIN m
        ORDER BY l_returnflag"""))
  )
}
