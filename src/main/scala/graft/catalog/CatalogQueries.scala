package graft.catalog

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** SQL-surface spelling of the CDC apply: the q131 changeset applied via
  * a real `MERGE INTO` statement against a [[GraftCatalog]] managed
  * table (VERDICT r8 item 7). q131 proves the MERGE *semantics* through
  * the DataFrame full-outer-join plan; q182 proves the SQL *surface* —
  * parser → `RewriteMergeIntoTable` → group-based copy-on-write
  * ReplaceData — over the engine's own `SupportsRowLevelOperations`
  * table. Both end states are identical by construction, so they share
  * one oracle.
  */
object CatalogQueries {

  /** q131's oracle, verbatim — the MERGE must land the same end state. */
  private val cdcOracle = """
    WITH snap AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
                  FROM orders),
    changes AS (
      SELECT o_orderkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
      FROM snap WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 'U', o_totalprice + 100.0
      FROM snap WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT o_orderkey + 100000000, 'I', o_totalprice
      FROM snap WHERE o_orderkey % 10 = 2)
    SELECT COALESCE(s.o_orderkey, c.k) AS o_orderkey,
           s.o_custkey AS o_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.new_price
                ELSE s.o_totalprice END AS o_totalprice,
           s.o_orderdate AS o_orderdate,
           CASE WHEN c.op IS NULL THEN 'kept'
                WHEN c.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS action
    FROM snap s FULL OUTER JOIN changes c ON s.o_orderkey = c.k
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY o_orderkey"""

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q182:
    // MERGE INTO as SQL text. Registering the catalog is a runtime-conf
    // write (catalog plugins resolve lazily) — infrastructure, like the
    // extensions registration, not per-query mutable state; setting it
    // twice is idempotent. The table is dropped and re-seeded every run,
    // so the query is deterministic under Verify re-runs and Bench
    // min-of-2. At 100 TB the identical statement runs against the
    // parquet-backed variant of the catalog: the rewrite plans the same
    // source-to-target join keyed on o_orderkey, and group granularity
    // (file/partition instead of whole-table) bounds the rewrite I/O.
    QueryDef(
      "q182_merge_into_sql",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_state")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
          .withColumn("action", lit("kept"))
          .createOrReplaceTempView("q182_snap")
        graft.relational.Temporal.cdcChangeset(s, d)
          .createOrReplaceTempView("q182_changes")
        s.sql("""CREATE TABLE graft_cat.default.orders_state
                 AS SELECT * FROM q182_snap""")
        s.sql("""
          MERGE INTO graft_cat.default.orders_state t
          USING q182_changes c
          ON t.o_orderkey = c.k
          WHEN MATCHED AND c.op = 'D' THEN DELETE
          WHEN MATCHED AND c.op = 'U' THEN
            UPDATE SET o_totalprice = c.new_price, action = 'updated'
          WHEN NOT MATCHED THEN
            INSERT (o_orderkey, o_custkey, o_totalprice, o_orderdate, action)
            VALUES (c.k, CAST(NULL AS BIGINT), c.new_price,
                    CAST(NULL AS TIMESTAMP), 'inserted')""")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                        action
                 FROM graft_cat.default.orders_state
                 ORDER BY o_orderkey""")
      },
      Some(cdcOracle))
  )
}
