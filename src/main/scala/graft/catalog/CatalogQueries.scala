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
        seedAndMerge(s, d)
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                        action
                 FROM graft_cat.default.orders_state
                 ORDER BY o_orderkey""")
      },
      Some(cdcOracle)),

    // -------------------------------------------------------------- q183:
    // SQL SCRIPTING (BEGIN/DECLARE/WHILE/SET) driving the managed
    // catalog: the classic incremental-backfill loop every warehouse
    // runs — one INSERT INTO per month partition, loop variable in the
    // predicate. Control flow lives in the SCRIPT interpreter; each
    // INSERT is still a full Catalyst-planned query, so nothing about
    // per-statement optimization or distribution changes — which is
    // exactly the point: the script is orchestration, not execution.
    // At 100 TB each iteration scans one month's partitions (partition
    // pruning on the predicate) and appends its aggregate — bounded
    // work per step, checkpointable between steps.
    QueryDef(
      "q183_scripted_backfill",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.backfill")
        s.sql("""CREATE TABLE graft_cat.default.backfill
                 (mon INT, o_orderpriority STRING, n BIGINT,
                  sum_total DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q183_orders")
        // scripting flag scoped to the script, restored on exit — the
        // declared-query contract: no side effects on shared session
        // state (withStreamConf discipline)
        val kScript = "spark.sql.scripting.enabled"
        val prev = s.conf.getOption(kScript)
        s.conf.set(kScript, "true")
        try s.sql("""
          BEGIN
            DECLARE m INT DEFAULT 1;
            WHILE m <= 6 DO
              INSERT INTO graft_cat.default.backfill
                SELECT m, o_orderpriority, COUNT(*),
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                         AS DOUBLE)
                FROM q183_orders
                WHERE YEAR(o_orderdate) = 1995 AND MONTH(o_orderdate) = m
                GROUP BY o_orderpriority;
              SET m = m + 1;
            END WHILE;
            SELECT 1;
          END""")
        finally prev.fold(s.conf.unset(kScript))(s.conf.set(kScript, _))
        s.sql("""SELECT mon, o_orderpriority, n, sum_total
                 FROM graft_cat.default.backfill
                 ORDER BY mon, o_orderpriority""")
      },
      Some("""
        SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
               o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_total
        FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6
        GROUP BY 1, 2
        ORDER BY mon, o_orderpriority""")),

    // -------------------------------------------------------------- q184:
    // TIME TRAVEL: `VERSION AS OF` over the managed table's commit
    // history — version 0 is the CTAS seed, version 1 the post-MERGE
    // state, and both remain queryable side by side (the lakehouse
    // snapshot contract; a versioned read resolves to a read-only
    // pinned table, so writing to the past is an analysis error). The
    // result is the per-version audit summary a CDC reviewer actually
    // runs: row count and action breakdown before and after the merge,
    // which doubles as the proof that the merge mutated exactly the
    // intended classes. All aggregates decimal-exact.
    QueryDef(
      "q184_time_travel",
      (s, d) => {
        seedAndMerge(s, d)
        def summary(v: Int) = s"""
          SELECT $v AS version, COUNT(*) AS n_rows,
                 CAST(SUM(CASE WHEN action = 'kept' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN action = 'updated' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_updated,
                 CAST(SUM(CASE WHEN action = 'inserted' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                   AS sum_price
          FROM graft_cat.default.orders_state VERSION AS OF $v"""
        s.sql(s"${summary(0)} UNION ALL ${summary(1)} ORDER BY version")
      },
      Some("""
        WITH snap AS (SELECT o_orderkey, o_custkey, o_totalprice,
                             o_orderdate, 'kept' AS action
                      FROM orders),
        changes AS (
          SELECT o_orderkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
          FROM snap WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, 'U', o_totalprice + 100.0
          FROM snap WHERE o_orderkey % 10 = 1
          UNION ALL
          SELECT o_orderkey + 100000000, 'I', o_totalprice
          FROM snap WHERE o_orderkey % 10 = 2),
        merged AS (
          SELECT COALESCE(s.o_orderkey, c.k) AS o_orderkey,
                 CASE WHEN c.op IS NOT NULL THEN c.new_price
                      ELSE s.o_totalprice END AS o_totalprice,
                 CASE WHEN c.op IS NULL THEN 'kept'
                      WHEN c.op = 'U' THEN 'updated'
                      ELSE 'inserted' END AS action
          FROM snap s FULL OUTER JOIN changes c ON s.o_orderkey = c.k
          WHERE c.op IS NULL OR c.op <> 'D'),
        v0 AS (SELECT 0 AS version, COUNT(*) AS n_rows,
                 COUNT(*) AS n_kept, CAST(0 AS BIGINT) AS n_updated,
                 CAST(0 AS BIGINT) AS n_inserted,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                   AS sum_price
               FROM snap),
        v1 AS (SELECT 1 AS version, COUNT(*) AS n_rows,
                 CAST(SUM(CASE WHEN action = 'kept' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN action = 'updated' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_updated,
                 CAST(SUM(CASE WHEN action = 'inserted' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                   AS sum_price
               FROM merged)
        SELECT * FROM v0 UNION ALL SELECT * FROM v1 ORDER BY version"""))
  ) ++ q186Defs

  // lazy: referenced from `defs` above its definition point
  private lazy val q186Defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q186:
    // the SAME MERGE statement against a MERGE-ON-READ table
    // ([[GraftDeltaTable]]): Catalyst plans WriteDelta instead of
    // ReplaceData, the write records only the |changeset| delta entries
    // (base untouched — GraftCatalogSpec pins base-row-count and
    // log-size), and the scan pays the log fold. Identical statement,
    // identical end state (same oracle as q182/q131), opposite
    // write/read amplification trade — which is the entire
    // copy-on-write vs merge-on-read decision a lakehouse table format
    // asks its users to make.
    QueryDef(
      "q186_merge_on_read",
      (s, d) => {
        seedAndMergeMor(s, d)
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                        action
                 FROM graft_cat.default.orders_mor
                 ORDER BY o_orderkey""")
      },
      Some(cdcOracle)),

    // -------------------------------------------------------------- q187:
    // MOR COMPACTION: after the q186 merge, fold the delta log into the
    // base (Iceberg rewrite_data_files / Delta OPTIMIZE) and return the
    // table content — which must be IDENTICAL to the pre-compaction
    // read (same oracle again: three queries, three storage states, one
    // answer). GraftCatalogSpec pins what actually changed: the log is
    // empty and the base holds the folded row count, so subsequent
    // reads stop paying the log fold. At 100 TB this is the scheduled
    // maintenance job that bounds MOR read amplification between
    // merges.
    QueryDef(
      "q187_mor_compaction",
      (s, d) => {
        seedAndMergeMor(s, d)
        morTable(s).compact(s, "graft_cat.default.orders_mor")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                        action
                 FROM graft_cat.default.orders_mor
                 ORDER BY o_orderkey""")
      },
      Some(cdcOracle))
  ) ++ q194Defs

  // lazy: referenced from `defs` above its definition point
  private lazy val q194Defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q194:
    // ALTER TABLE ADD COLUMN — schema evolution over the parquet-backed
    // catalog. Half the rows are written BEFORE the ALTER (their files
    // physically lack the column; the scan backfills null), half after
    // (their files carry it). The read-back COALESCEs the backfill, so
    // the result proves both populations coexist in one table under one
    // schema. At 100 TB this is the everyday lakehouse operation:
    // adding a column must be a metadata commit, never a table rewrite
    // — and here it is exactly one snapshot append, zero data I/O
    // (GraftStorageSpec pins old-snapshot schema isolation).
    QueryDef(
      "q194_alter_add_column",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_alter")
        s.sql("""CREATE TABLE graft_cat.default.orders_alter
                 (o_orderkey BIGINT, o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q194_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_alter
                 SELECT o_orderkey, o_totalprice FROM q194_orders
                 WHERE o_orderkey % 10 < 5""")
        s.sql("""ALTER TABLE graft_cat.default.orders_alter
                 ADD COLUMN price_band STRING""")
        s.sql("""INSERT INTO graft_cat.default.orders_alter
                 SELECT o_orderkey, o_totalprice,
                        CASE WHEN o_totalprice >= 100000 THEN 'high'
                             ELSE 'low' END
                 FROM q194_orders WHERE o_orderkey % 10 >= 5""")
        s.sql("""SELECT o_orderkey, o_totalprice,
                        COALESCE(price_band, 'unclassified') AS price_band
                 FROM graft_cat.default.orders_alter
                 ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 10 >= 5 THEN
                      (CASE WHEN o_totalprice >= 100000 THEN 'high'
                            ELSE 'low' END)
                    ELSE 'unclassified' END AS price_band
        FROM orders
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q195:
    // SQL UPDATE through the MERGE-ON-READ delta seam as a DECLARED
    // query (GraftCatalogSpec proved the plan shape in r9; the oracle
    // gate now owns the semantics too). The write is delta-sized — only
    // the |matched| rows enter the log, the base files are untouched —
    // and the read folds the log per partition. Same statement against
    // the copy-on-write table would rewrite every matched FILE; this is
    // the other half of the lakehouse write/read-amplification trade.
    QueryDef(
      "q195_mor_update_sql",
      (s, d) => {
        seedMorPlain(s, d, "orders_mupd", "q195")
        s.sql("""UPDATE graft_cat.default.orders_mupd
                 SET o_totalprice = o_totalprice + 50.0
                 WHERE o_orderkey % 7 = 0""")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                 FROM graft_cat.default.orders_mupd
                 ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q196:
    // SQL DELETE through the same delta seam: the log records only
    // |deleted| tombstones; the fold drops them at read. The predicate
    // keys on a NON-id column deliberately — the rewrite must read the
    // table (no metadata-only shortcut), dispatch per-row deletes by
    // row id, and the fold must still prune its id-set shipping by the
    // base files' id-range stats.
    QueryDef(
      "q196_mor_delete_sql",
      (s, d) => {
        seedMorPlain(s, d, "orders_mdel", "q196")
        s.sql("""DELETE FROM graft_cat.default.orders_mdel
                 WHERE o_custkey % 10 = 3""")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                 FROM graft_cat.default.orders_mdel
                 ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey % 10 <> 3
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q200:
    // PARTITIONED managed table — `PARTITIONED BY` (identity) on the
    // parquet-backed catalog, Iceberg-hidden-partitioning style: the
    // writers split output so each data file carries ONE partition
    // value, pinning its min/max stats to min == max, and the ordinary
    // stats-based file skipping becomes EXACT partition pruning (the
    // scan description reports skipped files; GraftStorageSpec pins
    // per-file single-valuedness and the skip count). At 100 TB this
    // is the layout that turns a priority-sliced read from a full
    // table scan into touching 1/5 of the files — with no hive
    // directory convention and no second pruning code path to keep
    // correct.
    QueryDef(
      "q200_partitioned_table",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_part")
        s.sql("""CREATE TABLE graft_cat.default.orders_part
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 PARTITIONED BY (o_orderpriority)""")
        Tables(s, d, "orders").createOrReplaceTempView("q200_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_part
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q200_orders""")
        s.sql("""SELECT o_orderkey, o_totalprice
                 FROM graft_cat.default.orders_part
                 WHERE o_orderpriority = '1-URGENT'
                 ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q201:
    // SQL CALL surface: the MOR maintenance op as a stored procedure
    // (`CALL graft_cat.system.compact(...)` — Spark 4.1's public
    // ProcedureCatalog seam, the Iceberg `rewrite_data_files` shape).
    // The audited columns are the DETERMINISTIC summary half: the
    // folded delta-op count (exactly the q186 changeset size) and the
    // post-compaction row count (the q182/q186 end-state cardinality);
    // physical file counts vary with write parallelism and stay out of
    // the oracle surface. The compaction itself runs distributed
    // (self-overwrite), and q187 separately proves content is
    // unchanged — this query proves the PROCEDURE surface reports the
    // operation faithfully.
    QueryDef(
      "q201_call_compact",
      (s, d) => {
        seedAndMergeMor(s, d)
        s.sql("CALL graft_cat.system.compact('default.orders_mor')")
          .select("delta_ops_folded", "rows")
      },
      Some("""
        WITH snap AS (SELECT o_orderkey FROM orders),
        changes AS (
          SELECT o_orderkey AS k, 'D' AS op FROM snap
          WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, 'U' FROM snap WHERE o_orderkey % 10 = 1
          UNION ALL
          SELECT o_orderkey + 100000000, 'I' FROM snap
          WHERE o_orderkey % 10 = 2)
        SELECT (SELECT COUNT(*) FROM changes) AS delta_ops_folded,
               (SELECT COUNT(*) FROM snap)
                 - (SELECT COUNT(*) FROM changes WHERE op = 'D')
                 + (SELECT COUNT(*) FROM changes WHERE op = 'I') AS rows""")),

    // -------------------------------------------------------------- q202:
    // PARTITION LIFECYCLE over the partitioned catalog: a
    // partition-sliced DELETE (decidable from pinned stats → Spark's
    // OptimizeMetadataOnlyDeleteFromTable swaps the rewrite for an
    // O(files) metadata commit — zero data I/O) followed by a STATIC
    // `INSERT OVERWRITE ... PARTITION (...)` (SupportsOverwriteV2 —
    // only that partition's files swap; GraftStorageSpec pins that the
    // other partitions' files never move). The read-back aggregate
    // proves all three populations coexist correctly: dropped, rebuilt
    // with reweighted prices, and untouched.
    QueryDef(
      "q202_partition_lifecycle",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_po")
        s.sql("""CREATE TABLE graft_cat.default.orders_po
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 PARTITIONED BY (o_orderpriority)""")
        Tables(s, d, "orders").createOrReplaceTempView("q202_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_po
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q202_orders""")
        s.sql("""DELETE FROM graft_cat.default.orders_po
                 WHERE o_orderpriority = '5-LOW'""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_po
                 PARTITION (o_orderpriority = '1-URGENT')
                 SELECT o_orderkey, o_totalprice + 1000.0
                 FROM q202_orders WHERE o_orderpriority = '1-URGENT'""")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
                          AS DOUBLE) AS sum_total
                 FROM graft_cat.default.orders_po
                 GROUP BY o_orderpriority
                 ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                                  THEN o_totalprice + 1000.0
                                  ELSE o_totalprice END
                        AS DECIMAL(14,4))) AS DOUBLE) AS sum_total
        FROM orders
        WHERE o_orderpriority <> '5-LOW'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q203:
    // DECIMAL in the managed catalog (VERDICT r10 item 1) — the
    // canonical money type, stored as unscaled INT64 parquet decimal
    // (p <= 18; p > 18 takes the unscaled-BINARY mapping), with
    // per-file min/max stats driving decimal-predicate pruning and
    // group-based DML. The full warehouse cycle in one declared query:
    // CREATE partitioned with DECIMAL(12,4), seed, MERGE (decimal
    // update arithmetic, deletes, cross-partition inserts), then a
    // static partition overwrite resetting 1-URGENT to pristine. Every
    // price mutation is exact decimal arithmetic, so the oracle replays
    // it digit-for-digit — no float tolerance anywhere. At 100 TB this
    // is the table a finance pipeline actually creates, and the plan
    // shapes are the same as q200/q202: partition-clustered writes,
    // stats-pruned scans, file-granularity rewrites.
    QueryDef(
      "q203_decimal_catalog",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_dec")
        s.sql("""CREATE TABLE graft_cat.default.orders_dec
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DECIMAL(12,4))
                 PARTITIONED BY (o_orderpriority)""")
        Tables(s, d, "orders").createOrReplaceTempView("q203_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_dec
                 SELECT o_orderkey, o_orderpriority,
                        CAST(o_totalprice AS DECIMAL(12,4))
                 FROM q203_orders""")
        s.sql("""
          MERGE INTO graft_cat.default.orders_dec t
          USING (
            SELECT o_orderkey AS k, 'D' AS op,
                   CAST(NULL AS DECIMAL(12,4)) AS p,
                   CAST(NULL AS STRING) AS pr
            FROM q203_orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey, 'U',
                   CAST(o_totalprice AS DECIMAL(12,4))
                     + CAST(100.0000 AS DECIMAL(12,4)),
                   CAST(NULL AS STRING)
            FROM q203_orders WHERE o_orderkey % 10 = 1
            UNION ALL
            SELECT o_orderkey + 100000000, 'I',
                   CAST(o_totalprice AS DECIMAL(12,4)), o_orderpriority
            FROM q203_orders WHERE o_orderkey % 10 = 2) c
          ON t.o_orderkey = c.k
          WHEN MATCHED AND c.op = 'D' THEN DELETE
          WHEN MATCHED AND c.op = 'U' THEN UPDATE SET o_totalprice = c.p
          WHEN NOT MATCHED THEN
            INSERT (o_orderkey, o_orderpriority, o_totalprice)
            VALUES (c.k, c.pr, c.p)""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_dec
                 PARTITION (o_orderpriority = '1-URGENT')
                 SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,4))
                 FROM q203_orders WHERE o_orderpriority = '1-URGENT'""")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(o_totalprice) AS DOUBLE) AS sum_total,
                        CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
                 FROM graft_cat.default.orders_dec
                 GROUP BY o_orderpriority
                 ORDER BY o_orderpriority""")
      },
      Some("""
        WITH seeded AS (
          SELECT o_orderkey, o_orderpriority,
                 CAST(o_totalprice AS DECIMAL(12,4)) AS p
          FROM orders),
        merged AS (
          SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderkey % 10 = 1
                      THEN p + CAST(100.0000 AS DECIMAL(12,4)) ELSE p END AS p
          FROM seeded WHERE o_orderkey % 10 <> 0
          UNION ALL
          SELECT o_orderkey + 100000000, o_orderpriority, p
          FROM seeded WHERE o_orderkey % 10 = 2),
        final AS (
          SELECT o_orderpriority, p FROM seeded
          WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_orderpriority, p FROM merged
          WHERE o_orderpriority <> '1-URGENT')
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(p) AS DOUBLE) AS sum_total,
               CAST(MIN(p) AS DOUBLE) AS min_price
        FROM final
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q204:
    // ALTER TABLE ADD COLUMN on a MERGE-ON-READ table (VERDICT r10
    // item 4) — q194's schema-evolution sequence, but with a LIVE delta
    // log spanning the ALTER: an UPDATE lands in the log before the new
    // column exists, a second UPDATE after it writes the column. Sound
    // because every file — base and delta — records the columns it was
    // written with, so the fold backfills null in pre-ALTER delta
    // entries exactly as the scan does for pre-ALTER base files. The
    // ALTER itself stays a metadata commit: zero data I/O, old
    // snapshots keep their schema (spec-pinned).
    QueryDef(
      "q204_mor_alter_add_column",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_malter")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .createOrReplaceTempView("q204_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_malter
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')
                 AS SELECT * FROM q204_orders""")
        s.sql("""UPDATE graft_cat.default.orders_malter
                 SET o_totalprice = o_totalprice + 50.0
                 WHERE o_orderkey % 7 = 0""")
        s.sql("""ALTER TABLE graft_cat.default.orders_malter
                 ADD COLUMN price_band STRING""")
        s.sql("""UPDATE graft_cat.default.orders_malter
                 SET price_band = CASE WHEN o_totalprice >= 100000
                                       THEN 'high' ELSE 'low' END
                 WHERE o_orderkey % 10 = 3""")
        s.sql("""SELECT o_orderkey, o_totalprice,
                        COALESCE(price_band, 'unclassified') AS price_band
                 FROM graft_cat.default.orders_malter
                 ORDER BY o_orderkey""")
      },
      Some("""
        WITH updated AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders)
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 10 = 3 THEN
                      (CASE WHEN o_totalprice >= 100000 THEN 'high'
                            ELSE 'low' END)
                    ELSE 'unclassified' END AS price_band
        FROM updated
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q205:
    // PARTITION LIFECYCLE on a partitioned MERGE-ON-READ table (VERDICT
    // r10 item 5) — the combination a CDC-heavy warehouse wants most:
    // partition-split base files (delta-sized row-level DML on top),
    // compaction folding the log back into partition-clustered base,
    // then the q202 partition operations — metadata DELETE of one
    // partition and a static partition overwrite — both gated on the
    // log being empty (live delta entries replaying over swapped files
    // would corrupt; spec-pinned loud refusal). Read-back proves the
    // three populations: dropped, rebuilt with reweighted prices, and
    // carry-over with the pre-compaction update applied.
    QueryDef(
      "q205_partitioned_mor_lifecycle",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_pmor")
        s.sql("""CREATE TABLE graft_cat.default.orders_pmor
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 PARTITIONED BY (o_orderpriority)
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')""")
        Tables(s, d, "orders").createOrReplaceTempView("q205_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_pmor
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q205_orders""")
        s.sql("""UPDATE graft_cat.default.orders_pmor
                 SET o_totalprice = o_totalprice + 50.0
                 WHERE o_orderkey % 7 = 0""")
        s.sql("CALL graft_cat.system.compact('default.orders_pmor')")
        s.sql("""DELETE FROM graft_cat.default.orders_pmor
                 WHERE o_orderpriority = '5-LOW'""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_pmor
                 PARTITION (o_orderpriority = '1-URGENT')
                 SELECT o_orderkey, o_totalprice + 1000.0
                 FROM q205_orders WHERE o_orderpriority = '1-URGENT'""")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
                          AS DOUBLE) AS sum_total
                 FROM graft_cat.default.orders_pmor
                 GROUP BY o_orderpriority
                 ORDER BY o_orderpriority""")
      },
      Some("""
        WITH updated AS (
          SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice + 1000.0
                      WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0
                      ELSE o_totalprice END AS p
          FROM orders
          WHERE o_orderpriority <> '5-LOW')
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(p AS DECIMAL(14,4))) AS DOUBLE) AS sum_total
        FROM updated
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q206:
    // MOR CHANGE FEED (VERDICT r10 item 6) — `readStream` over the
    // `orders_cdc$changes` companion table: the delta log itself as a
    // CDC stream `(__op, __id, row)` with offsets over delta-file
    // arrival, relayed through the exactly-once epoch sink into a
    // staging table, then applied to a mirror seeded from `VERSION AS
    // OF 0` — the standard snapshot-plus-changes CDC consumption. The
    // mirror must equal the direct table read, so this query SHARES the
    // q182/q186 oracle: four storage paths (DataFrame merge, CoW MERGE,
    // MOR MERGE, feed replay), one answer. At 100 TB each micro-batch
    // reads only newly committed change files — the feed never rescans
    // the table, and compaction doesn't erase history (spec-pinned).
    QueryDef(
      "q206_mor_change_feed",
      (s, d) => {
        seedAndMergeInto(s, d, "orders_cdc",
          "TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='o_orderkey')",
          "q206")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.cdc_stage")
        s.sql("""CREATE TABLE graft_cat.default.cdc_stage
                 (`__op` INT, `__id` BIGINT, o_orderkey BIGINT,
                  o_custkey BIGINT, o_totalprice DOUBLE,
                  o_orderdate TIMESTAMP, action STRING)""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q206-ckpt-").toString
        val q = s.readStream
          .table("graft_cat.default.`orders_cdc$changes`")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_cat.default.cdc_stage")
        q.awaitTermination()
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, action
          FROM (
            SELECT v.o_orderkey, v.o_custkey, v.o_totalprice,
                   v.o_orderdate, v.action
            FROM (SELECT * FROM graft_cat.default.orders_cdc
                  VERSION AS OF 0) v
            WHERE NOT EXISTS (SELECT 1 FROM graft_cat.default.cdc_stage c
                              WHERE c.`__id` = v.o_orderkey)
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, action
            FROM graft_cat.default.cdc_stage WHERE `__op` <> 2)
          ORDER BY o_orderkey""")
      },
      Some(cdcOracle)),

    // -------------------------------------------------------------- q207:
    // FILE-LIFECYCLE ACCOUNTING through the oracle gate (VERDICT r10
    // item 7): rewrite → CALL expire_snapshots → audit. The fixture
    // pins the file census exactly: two REPARTITION(1) seed inserts
    // (one file each), a whole-table UPDATE rewriting both, retention 1
    // snapshot and a 1-entry append-log window — so after the rewrite
    // exactly ONE file (the first seed file: superseded, snapshot
    // expired, aged out of the stream ledger) is unreferenced, and the
    // procedure must report orphan_files_deleted = 1 with 0ms grace
    // (single-writer maintenance; the default grace spares in-flight
    // writers — spec-pinned). The audit columns prove GC never touched
    // live data. At 100 TB this is the scheduled maintenance job that
    // bounds a lakehouse's storage growth, and its accounting is now a
    // correctness-gated result, not a log line.
    QueryDef(
      "q207_expire_snapshots",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, lit}
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_gc")
        s.sql("""CREATE TABLE graft_cat.default.orders_gc
                 (o_orderkey BIGINT, o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.retain'='1',
                                'graft.append_retain'='1')""")
        Tables(s, d, "orders").createOrReplaceTempView("q207_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_gc
                 SELECT /*+ REPARTITION(1) */ o_orderkey, o_totalprice
                 FROM q207_orders WHERE o_orderkey % 2 = 0""")
        s.sql("""INSERT INTO graft_cat.default.orders_gc
                 SELECT /*+ REPARTITION(1) */ o_orderkey, o_totalprice
                 FROM q207_orders WHERE o_orderkey % 2 = 1""")
        s.sql("""UPDATE graft_cat.default.orders_gc
                 SET o_totalprice = o_totalprice + 1.0""")
        val call = s.sql(
          "CALL graft_cat.system.expire_snapshots('default.orders_gc', 0)")
          .collect()(0)
        s.sql("""SELECT COUNT(*) AS n_rows,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
                          AS DOUBLE) AS sum_total
                 FROM graft_cat.default.orders_gc""")
          .select(
            lit(call.getLong(0)).as("orphan_files_deleted"),
            lit(call.getLong(1)).as("retained_snapshots"),
            col("n_rows"), col("sum_total"))
      },
      Some("""
        SELECT CAST(1 AS BIGINT) AS orphan_files_deleted,
               CAST(1 AS BIGINT) AS retained_snapshots,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice + 1.0 AS DECIMAL(14,4)))
                 AS DOUBLE) AS sum_total
        FROM orders""")),

    // -------------------------------------------------------------- q208:
    // ARRAY + STRUCT columns in the managed catalog — the other half of
    // VERDICT r10 item 1's parenthetical, and the type shape a
    // training-data warehouse actually stores: an embedding vector
    // (ARRAY<FLOAT>, standard 3-level parquet list) next to typed
    // STRUCT metadata. The query proves bit-exact float round-trip
    // through the catalog's writer/reader (the per-vector L2 norm —
    // computed by the engine's proven sequential-fold idiom — must
    // hash-match DuckDB folding the ORIGINAL parquet), struct field
    // access over the catalog scan, and a row-level DELETE whose
    // rewrite carries every nested value through untouched (the
    // modulo predicate is stats-undecidable by design, forcing the
    // full copy-on-write path over array-bearing files).
    QueryDef(
      "q208_embedding_catalog",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.emb_store")
        Tables(s, d, "embeddings").createOrReplaceTempView("q208_emb")
        s.sql("""CREATE TABLE graft_cat.default.emb_store
                 (vec_id BIGINT, label INT,
                  meta STRUCT<dim: INT, tag: STRING>,
                  embedding ARRAY<FLOAT>)""")
        s.sql("""INSERT INTO graft_cat.default.emb_store
                 SELECT vec_id, label,
                        named_struct('dim', size(embedding),
                                     'tag', concat('g', vec_id % 4)),
                        embedding
                 FROM q208_emb""")
        s.sql("""DELETE FROM graft_cat.default.emb_store
                 WHERE vec_id % 10 = 7""")
        s.sql("""SELECT vec_id, label, meta.dim AS dim, meta.tag AS tag,
                        round(sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
                          (a, x) -> a + CAST(x AS DOUBLE)
                                      * CAST(x AS DOUBLE))), 6) AS norm
                 FROM graft_cat.default.emb_store
                 ORDER BY vec_id""")
      },
      Some("""
        SELECT vec_id, label,
               CAST(len(embedding) AS INTEGER) AS dim,
               concat('g', CAST(vec_id % 4 AS VARCHAR)) AS tag,
               round(sqrt(list_reduce(list_transform(
                 generate_series(1, len(embedding)),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE)),
                 (a2, b2) -> a2 + b2)), 6) AS norm
        FROM embeddings
        WHERE vec_id % 10 <> 7
        ORDER BY vec_id""")),

    // -------------------------------------------------------------- q209:
    // WRITE-SIDE CLUSTERING (`graft.sort_by`): the insert range-
    // distributes and sorts on o_orderkey, so every data file covers a
    // DISJOINT key range and the stats-based file skipping turns the
    // BETWEEN read into touching only the files whose span intersects
    // (GraftStorageSpec pins pairwise-disjoint spans and the
    // files-minus-one skip count on a point lookup). At 100 TB this is
    // the knob that makes key-range scans O(files-in-range) instead of
    // O(all files) — Iceberg's write sort order, with no extra read
    // path: the ordinary min/max pruning does the work.
    QueryDef(
      "q209_sorted_table",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_sorted")
        s.sql("""CREATE TABLE graft_cat.default.orders_sorted
                 (o_orderkey BIGINT, o_custkey BIGINT,
                  o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.sort_by'='o_orderkey')""")
        Tables(s, d, "orders").createOrReplaceTempView("q209_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_sorted
                 SELECT o_orderkey, o_custkey, o_totalprice
                 FROM q209_orders""")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                 FROM graft_cat.default.orders_sorted
                 WHERE o_orderkey BETWEEN 100 AND 3000
                 ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey BETWEEN 100 AND 3000
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q210:
    // CONTINUOUS CDC APPLY — the textbook lakehouse replication loop,
    // entirely inside the engine: `readStream` over the MOR change feed,
    // each micro-batch applied to a managed MIRROR table with a real
    // `MERGE INTO` keyed on the change id (op 2 deletes, op 1 updates,
    // op 0 inserts). foreachBatch is at-least-once; the id-keyed MERGE
    // makes replays idempotent — the standard exactly-once-by-
    // idempotence CDC consumer. The mirror seeds from `VERSION AS OF 0`
    // (snapshot + changes), and its final content shares the
    // q182/q186/q206 oracle: FIVE independent paths to the same answer.
    // At 100 TB each batch's MERGE is group-pruned to the files whose
    // key ranges the batch touches — the apply cost scales with change
    // volume, not table size.
    QueryDef(
      "q210_cdc_merge_apply",
      (s, d) => {
        seedAndMergeInto(s, d, "orders_cdc2",
          "TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='o_orderkey')",
          "q210")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.cdc_mirror")
        s.sql("""CREATE TABLE graft_cat.default.cdc_mirror AS
                 SELECT * FROM graft_cat.default.orders_cdc2
                 VERSION AS OF 0""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q210-ckpt-").toString
        val q = s.readStream
          .table("graft_cat.default.`orders_cdc2$changes`")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.createOrReplaceTempView("q210_batch")
              batch.sparkSession.sql("""
                MERGE INTO graft_cat.default.cdc_mirror t
                USING q210_batch c
                ON t.o_orderkey = c.`__id`
                WHEN MATCHED AND c.`__op` = 2 THEN DELETE
                WHEN MATCHED THEN UPDATE SET
                  o_custkey = c.o_custkey,
                  o_totalprice = c.o_totalprice,
                  o_orderdate = c.o_orderdate,
                  action = c.action
                WHEN NOT MATCHED AND c.`__op` <> 2 THEN
                  INSERT (o_orderkey, o_custkey, o_totalprice,
                          o_orderdate, action)
                  VALUES (c.`__id`, c.o_custkey, c.o_totalprice,
                          c.o_orderdate, c.action)"""): Unit
          }
          .start()
        q.awaitTermination()
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                        action
                 FROM graft_cat.default.cdc_mirror
                 ORDER BY o_orderkey""")
      },
      Some(cdcOracle)),

    // -------------------------------------------------------------- q211:
    // CORPUS CURATION IN THE LAKEHOUSE — the training-data story and
    // the table format in ONE loop: the documents corpus lives in a
    // managed merge-on-read table, q40's exact-dedup (md5 of the
    // sorted distinct token set — bag-of-words identity) runs AGAINST
    // the catalog table, and the losers are removed with a real
    // `MERGE INTO ... WHEN MATCHED THEN DELETE` — delta-sized
    // tombstones, base files untouched, full history retained (the
    // pre-curation corpus stays one VERSION AS OF away). The census
    // read-back is integer-exact. At 100 TB this is exactly how a
    // curation pipeline should mutate a petabyte corpus: the dedup
    // plan shuffles fingerprints (never text), and the DML writes
    // |duplicates|, not the table.
    QueryDef(
      "q211_corpus_curation",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus")
        Tables(s, d, "documents").createOrReplaceTempView("q211_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='doc_id')
                 AS SELECT * FROM q211_docs""")
        s.sql("""
          MERGE INTO graft_cat.default.corpus t
          USING (
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                       AS rn
              FROM (SELECT doc_id,
                           md5(concat_ws('|', array_sort(array_distinct(
                             graft_tokens(text))))) AS fp
                    FROM graft_cat.default.corpus))
            WHERE rn > 1) dupes
          ON t.doc_id = dupes.doc_id
          WHEN MATCHED THEN DELETE""")
        s.sql("""SELECT lang, source, COUNT(*) AS n_docs,
                        SUM(n_chars) AS sum_chars
                 FROM graft_cat.default.corpus
                 GROUP BY lang, source
                 ORDER BY lang, source""")
      },
      Some(s"""
        WITH f AS (SELECT doc_id,
                          md5(array_to_string(list_sort(list_distinct(
                            ${graft.text.TextAnalysis.duckTokens})), '|')) fp
                   FROM documents),
        keep AS (SELECT MIN(doc_id) AS k FROM f GROUP BY fp),
        c AS (SELECT d.* FROM documents d JOIN keep ON d.doc_id = keep.k)
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM c GROUP BY lang, source
        ORDER BY lang, source""")),

    // -------------------------------------------------------------- q212:
    // STORAGE-PARTITIONED JOIN (VERDICT r11 item 1, Iceberg's
    // bucket-join): two managed tables PARTITIONED BY the same key join
    // with ZERO shuffle — each GraftScan reports its identity layout as
    // KeyGroupedPartitioning (every file pins its partition tuple via
    // min == max stats) and Spark's SPJ planner aligns same-key file
    // groups directly, eliding the Exchange on BOTH sides. At 100 TB
    // the fact-to-fact join shuffle is THE dominant cost a co-clustered
    // layout can avoid; the no-Exchange contract is pinned in
    // PlanShapeSpec. The join is materialized under the SPJ confs
    // (localCheckpoint executes eagerly), which are then restored so no
    // session-level planning knob leaks into later queries.
    QueryDef(
      "q212_storage_partitioned_join",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.nation_cust")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.nation_supp")
        s.sql("""CREATE TABLE graft_cat.default.nation_cust
                 (nk INT, customers BIGINT, cust_sum BIGINT)
                 PARTITIONED BY (nk)""")
        s.sql("""CREATE TABLE graft_cat.default.nation_supp
                 (nk INT, suppliers BIGINT, supp_sum BIGINT)
                 PARTITIONED BY (nk)""")
        Tables(s, d, "customer").createOrReplaceTempView("q212_cust")
        Tables(s, d, "supplier").createOrReplaceTempView("q212_supp")
        s.sql("""INSERT INTO graft_cat.default.nation_cust
                 SELECT c_nationkey, COUNT(*), SUM(c_custkey)
                 FROM q212_cust GROUP BY c_nationkey""")
        s.sql("""INSERT INTO graft_cat.default.nation_supp
                 SELECT s_nationkey, COUNT(*), SUM(s_suppkey)
                 FROM q212_supp GROUP BY s_nationkey""")
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
          // force the join to actually ride the storage layout (the
          // aggregates are small enough to broadcast, which would
          // bypass the seam this query exists to exercise)
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try
          s.sql("""SELECT a.nk AS nk, a.customers, a.cust_sum,
                          b.suppliers, b.supp_sum
                   FROM graft_cat.default.nation_cust a
                   JOIN graft_cat.default.nation_supp b ON a.nk = b.nk
                   ORDER BY nk""").localCheckpoint()
        finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""
        WITH a AS (SELECT c_nationkey AS nk, COUNT(*) AS customers,
                          CAST(SUM(c_custkey) AS BIGINT) AS cust_sum
                   FROM customer GROUP BY 1),
             b AS (SELECT s_nationkey AS nk, COUNT(*) AS suppliers,
                          CAST(SUM(s_suppkey) AS BIGINT) AS supp_sum
                   FROM supplier GROUP BY 1)
        SELECT a.nk AS nk, a.customers, a.cust_sum, b.suppliers, b.supp_sum
        FROM a JOIN b ON a.nk = b.nk
        ORDER BY nk""")),

    // -------------------------------------------------------------- q213:
    // SCHEMA EVOLUTION VIA FIELD IDS (VERDICT r11 item 3, Iceberg's
    // model): every column carries a stable integer id stamped at
    // CREATE; files record the ids they were written with; readers bind
    // BY ID. That makes RENAME a pure metadata commit (old files still
    // bind — the 'remarked' phase reads pre-rename data through the new
    // name), DROP a pure metadata commit (bytes die at the next
    // compaction), and drop+re-ADD resurrection-proof (the re-added
    // column gets a FRESH id, so the 'resurrect_check' phase must see
    // zero non-null values even though the old files physically hold
    // the column). Time travel replays the old schema ids and all.
    // At 100 TB schema evolution MUST be O(1) metadata — any rewrite-
    // the-table fallback is an outage.
    QueryDef(
      "q213_schema_evolution",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.evo")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .createOrReplaceTempView("q213_seed")
        s.sql("""CREATE TABLE graft_cat.default.evo AS
                 SELECT * FROM q213_seed""")                        // v0
        s.sql("ALTER TABLE graft_cat.default.evo ADD COLUMN note STRING")
        s.sql("""UPDATE graft_cat.default.evo
                 SET note = concat('n', o_orderkey)
                 WHERE o_orderkey % 10 = 3""")
        s.sql("ALTER TABLE graft_cat.default.evo RENAME COLUMN note TO remark")
        s.sql("ALTER TABLE graft_cat.default.evo DROP COLUMN o_custkey")
        s.sql("ALTER TABLE graft_cat.default.evo ADD COLUMN o_custkey BIGINT")
        s.sql("""
          SELECT 'remarked' AS phase, count(remark) AS n,
                 CAST(sum(CASE WHEN remark IS NOT NULL
                               THEN o_orderkey END) AS BIGINT) AS s
          FROM graft_cat.default.evo
          UNION ALL
          SELECT 'resurrect_check', count(o_custkey),
                 CAST(coalesce(sum(o_custkey), 0) AS BIGINT)
          FROM graft_cat.default.evo
          UNION ALL
          SELECT 'time_travel', count(*), CAST(sum(o_custkey) AS BIGINT)
          FROM graft_cat.default.evo VERSION AS OF 0
          ORDER BY phase""")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey FROM orders)
        SELECT 'remarked' AS phase,
               COUNT(CASE WHEN o_orderkey % 10 = 3 THEN 1 END) AS n,
               CAST(SUM(CASE WHEN o_orderkey % 10 = 3
                             THEN o_orderkey END) AS BIGINT) AS s
        FROM o
        UNION ALL
        SELECT 'resurrect_check', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'time_travel', COUNT(*), CAST(SUM(o_custkey) AS BIGINT)
        FROM o
        ORDER BY phase""")),

    // -------------------------------------------------------------- q214:
    // ARRAY<STRUCT<...>> catalog columns (VERDICT r11 item 4) — the
    // chunked-document / spans-with-scores shape one level deeper than
    // q208's flat vector+struct: each row stores a LIST OF TYPED
    // RECORDS as a standard parquet 3-level list of groups. The cycle
    // proves exact round-trip through the recursive writer/converter
    // (positions integer-exact, floats bit-exact via the q208 L2-norm
    // idiom), lambda access into the nested structs over the catalog
    // scan, and a row-level DELETE whose rewrite carries every nested
    // value through untouched. Map-of-struct and deeper stay loud
    // rejects (spec-pinned).
    QueryDef(
      "q214_chunk_store",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.chunk_store")
        Tables(s, d, "embeddings").createOrReplaceTempView("q214_emb")
        s.sql("""CREATE TABLE graft_cat.default.chunk_store
                 (vec_id BIGINT,
                  chunks ARRAY<STRUCT<pos: INT, val: FLOAT>>)""")
        s.sql("""INSERT INTO graft_cat.default.chunk_store
                 SELECT vec_id,
                        transform(embedding,
                          (x, i) -> named_struct('pos', CAST(i AS INT),
                                                 'val', x))
                 FROM q214_emb""")
        s.sql("""DELETE FROM graft_cat.default.chunk_store
                 WHERE vec_id % 7 = 3""")
        s.sql("""SELECT vec_id, size(chunks) AS n_chunks,
                        aggregate(chunks, CAST(0 AS BIGINT),
                          (a, c) -> a + c.pos) AS pos_sum,
                        round(sqrt(aggregate(chunks, CAST(0 AS DOUBLE),
                          (a, c) -> a + CAST(c.val AS DOUBLE)
                                      * CAST(c.val AS DOUBLE))), 6) AS norm
                 FROM graft_cat.default.chunk_store
                 ORDER BY vec_id""")
      },
      Some("""
        SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n_chunks,
               CAST(len(embedding) * (len(embedding) - 1) // 2
                 AS BIGINT) AS pos_sum,
               round(sqrt(list_reduce(list_transform(
                 generate_series(1, len(embedding)),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE)),
                 (a2, b2) -> a2 + b2)), 6) AS norm
        FROM embeddings
        WHERE vec_id % 7 <> 3
        ORDER BY vec_id""")),

    // -------------------------------------------------------------- q215:
    // Z-ORDER AS A TABLE PROPERTY (VERDICT r11 item 5): the managed
    // table clusters its writes on the Morton interleave of TWO columns
    // — the write builder demands an ordered distribution on the
    // catalog-resolved `zorder(o_custkey, o_totalprice)` function, so
    // every data file covers a compact box in BOTH dimensions and a
    // range predicate on EITHER column prunes files via ordinary
    // min/max stats (skip counts pinned in GraftStorageSpec; this query
    // pins content correctness through the z-shuffled write). At 100 TB
    // this is Delta's OPTIMIZE ZORDER as a standing write property:
    // multi-dim point-lookup workloads stop scanning the full sort
    // range of a 1-D clustering.
    QueryDef(
      "q215_zorder_table",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_z")
        s.sql("""CREATE TABLE graft_cat.default.orders_z
                 (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.zorder_by'='o_custkey,o_totalprice')""")
        Tables(s, d, "orders").createOrReplaceTempView("q215_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_z
                 SELECT o_orderkey, o_custkey, o_totalprice
                 FROM q215_orders""")
        s.sql("""
          SELECT 'by_cust' AS dim, count(*) AS n,
                 CAST(sum(o_orderkey) AS BIGINT) AS s
          FROM graft_cat.default.orders_z
          WHERE o_custkey BETWEEN 100 AND 300
          UNION ALL
          SELECT 'by_price', count(*), CAST(sum(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_z
          WHERE o_totalprice < 50000.0
          ORDER BY dim""")
      },
      Some("""
        SELECT 'by_cust' AS dim, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS s
        FROM orders
        WHERE o_custkey BETWEEN 100 AND 300
        UNION ALL
        SELECT 'by_price', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        WHERE o_totalprice < 50000.0
        ORDER BY dim""")),

    // -------------------------------------------------------------- q216:
    // NEAR-DUP CURATION IN THE LAKEHOUSE (VERDICT r11 item 6) — q211
    // took exact dedup into the managed table; this promotes q99's
    // INCREMENTAL MinHash pipeline: the corpus lives in a MOR table, a
    // new batch (doc_id % 10 = 0) is appended, the batch's band keys
    // are broadcast against the corpus band index COMPUTED FROM THE
    // CATALOG SCAN, verified >= 0.8-Jaccard losers are removed by
    // `MERGE ... WHEN MATCHED THEN DELETE` (delta-sized tombstones,
    // base untouched), and the pre-curation corpus stays one VERSION
    // AS OF away. Shares q99's oracle family. At 100 TB this is the
    // daily ingest loop: candidates touch only band-key matches, the
    // DML writes |losers|, never the table.
    QueryDef(
      "q216_neardup_curation",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_nd")
        Tables(s, d, "documents").createOrReplaceTempView("q216_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_nd
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='doc_id')
                 AS SELECT * FROM q216_docs WHERE doc_id % 10 <> 0""")
        s.sql("""INSERT INTO graft_cat.default.corpus_nd
                 SELECT * FROM q216_docs WHERE doc_id % 10 = 0""")
        graft.dedup.Dedup.incrementalNearDupLosers(
            s.table("graft_cat.default.corpus_nd"))
          .createOrReplaceTempView("q216_losers")
        s.sql("""
          MERGE INTO graft_cat.default.corpus_nd t
          USING q216_losers l
          ON t.doc_id = l.doc_id
          WHEN MATCHED THEN DELETE""")
        s.sql("""SELECT lang, source, COUNT(*) AS n_docs,
                        SUM(n_chars) AS sum_chars
                 FROM graft_cat.default.corpus_nd
                 GROUP BY lang, source
                 ORDER BY lang, source""")
      },
      Some(s"""
        WITH ${graft.dedup.Dedup.duckIncrementalLosers}
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        GROUP BY lang, source
        ORDER BY lang, source""")),

    // -------------------------------------------------------------- q217:
    // WRITE-AUDIT-PUBLISH (VERDICT r11 item 7) — the pattern every
    // production training-data pipeline runs: readers consume ONLY the
    // 'published' snapshot tag; a writer stages data into the live
    // table, an audit (DQ predicate) gates the publish, and only a
    // passing audit RE-POINTS the tag. The fail path is the contract:
    // after staging a bad batch, the tag reader provably still sees
    // the pre-write content (phase 'audit_fail_reader'); after the
    // remediation DELETE passes the audit, the tag moves and the
    // reader sees exactly the good batch added. Tags are retention-
    // pinned commits (`CALL system.tag`), so 'published' survives
    // unrelated commit churn. At 100 TB this replaces copy-the-table
    // staging with O(1) metadata.
    QueryDef(
      "q217_write_audit_publish",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_wap")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .createOrReplaceTempView("q217_seed")
        s.sql("""CREATE TABLE graft_cat.default.orders_wap AS
                 SELECT * FROM q217_seed""")
        s.sql("CALL graft_cat.system.tag('default.orders_wap', 'published')")
        // stage: a good batch and a bad batch land together
        s.sql("""INSERT INTO graft_cat.default.orders_wap VALUES
                 (900000001, 1, 10.0), (900000002, 2, 20.0),
                 (900000003, 3, 30.0), (900000004, 4, 40.0),
                 (900000005, 5, 50.0),
                 (910000001, 9, -5.0), (910000002, 9, -6.0)""")
        // audit: negative prices are a DQ violation -> DO NOT publish
        val violations = s.sql(
          """SELECT count(*) FROM graft_cat.default.orders_wap
             WHERE o_totalprice < 0""").head().getLong(0)
        val tagRead = """SELECT count(*) AS n,
                                CAST(sum(o_orderkey) AS BIGINT) AS s
                         FROM graft_cat.default.orders_wap
                         VERSION AS OF 'published'"""
        // the reader mid-flight: staged writes invisible through the tag
        val midReader = s.sql(tagRead).localCheckpoint()
        if (violations > 0) {
          // remediate, re-audit, and only then publish
          s.sql("""DELETE FROM graft_cat.default.orders_wap
                   WHERE o_totalprice < 0""")
          val post = s.sql(
            """SELECT count(*) FROM graft_cat.default.orders_wap
               WHERE o_totalprice < 0""").head().getLong(0)
          require(post == 0, "remediation left DQ violations")
          s.sql("CALL graft_cat.system.tag('default.orders_wap', 'published')")
        }
        val finalReader = s.sql(tagRead).localCheckpoint()
        import org.apache.spark.sql.functions.lit
        midReader.select(lit("audit_fail_reader").as("phase"),
            col("n"), col("s"))
          .unionAll(finalReader.select(lit("published_reader").as("phase"),
            col("n"), col("s")))
          .orderBy("phase")
      },
      Some("""
        SELECT 'audit_fail_reader' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS s
        FROM orders
        UNION ALL
        SELECT 'published_reader', COUNT(*) + 5,
               CAST(SUM(o_orderkey) + 4500000015 AS BIGINT)
        FROM orders
        ORDER BY phase""")),

    // -------------------------------------------------------------- q218:
    // BUCKETED STORAGE-PARTITIONED JOIN — the HIGH-CARDINALITY
    // companion to q212: an orders-to-lineitem join can never
    // identity-partition on the order key (one partition per key), but
    // both tables CAN be written into the same 16 hash buckets
    // (`graft.bucket_by`, clustered through the catalog-resolved
    // bucket(n, col) function), and the two scans then report
    // provably-identical KeyGroupedPartitioning layouts — the join
    // runs with ZERO Exchange on either side (spec-pinned, with
    // single-bucket point-lookup pruning). At 100 TB this is THE
    // production fact-to-fact shape: the join shuffle, the dominant
    // cost, is paid once at write time and amortized over every join.
    QueryDef(
      "q218_bucketed_join",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_bkt")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.lineitem_bkt")
        s.sql("""CREATE TABLE graft_cat.default.orders_bkt
                 (o_orderkey BIGINT, o_orderpriority STRING)
                 TBLPROPERTIES ('graft.bucket_by'='o_orderkey,16')""")
        s.sql("""CREATE TABLE graft_cat.default.lineitem_bkt
                 (l_orderkey BIGINT, l_linenumber INT)
                 TBLPROPERTIES ('graft.bucket_by'='l_orderkey,16')""")
        Tables(s, d, "orders").createOrReplaceTempView("q218_orders")
        Tables(s, d, "lineitem").createOrReplaceTempView("q218_lineitem")
        s.sql("""INSERT INTO graft_cat.default.orders_bkt
                 SELECT o_orderkey, o_orderpriority FROM q218_orders""")
        s.sql("""INSERT INTO graft_cat.default.lineitem_bkt
                 SELECT l_orderkey, l_linenumber FROM q218_lineitem""")
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
          // documented prerequisite for transform-partitioned SPJ: the
          // bucket expression matches the join key via its leaves
          "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try
          s.sql("""SELECT o.o_orderpriority AS priority,
                          count(*) AS n_lines,
                          CAST(sum(l.l_linenumber) AS BIGINT) AS line_sum
                   FROM graft_cat.default.orders_bkt o
                   JOIN graft_cat.default.lineitem_bkt l
                     ON o.o_orderkey = l.l_orderkey
                   GROUP BY o.o_orderpriority
                   ORDER BY priority""").localCheckpoint()
        finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""
        SELECT o.o_orderpriority AS priority, COUNT(*) AS n_lines,
               CAST(SUM(l.l_linenumber) AS BIGINT) AS line_sum
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY priority""")),

    // -------------------------------------------------------------- q219:
    // ALTER COLUMN TYPE WIDENING — the schema-evolution tail of q213
    // (rename/drop): INT -> BIGINT and DECIMAL(12,4) -> DECIMAL(20,4)
    // as PURE METADATA commits over live data. Files written before
    // the widen keep their narrow physical type (INT32 / INT64
    // decimal); the reader decodes each file at its own type and
    // upcasts, so the post-widen insert — values that genuinely
    // overflow the narrow types — aggregates exactly next to the old
    // files. At 100 TB this is the difference between an ALTER that
    // finishes in milliseconds and a full-table rewrite.
    QueryDef(
      "q219_type_widening",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_wide")
        s.sql("""CREATE TABLE graft_cat.default.orders_wide
                 (o_orderkey BIGINT, lnum INT, price DECIMAL(12,4))""")
        Tables(s, d, "orders").createOrReplaceTempView("q219_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_wide
                 SELECT o_orderkey, CAST(o_orderkey % 100000 AS INT),
                        CAST(o_totalprice AS DECIMAL(12,4))
                 FROM q219_orders WHERE o_orderkey % 4 != 0""")
        s.sql("""ALTER TABLE graft_cat.default.orders_wide
                 ALTER COLUMN lnum TYPE BIGINT""")
        s.sql("""ALTER TABLE graft_cat.default.orders_wide
                 ALTER COLUMN price TYPE DECIMAL(20,4)""")
        // wide-only values: a BIGINT beyond Int.MaxValue, a decimal
        // beyond precision 18 (BINARY physical vs the old INT64)
        s.sql("""INSERT INTO graft_cat.default.orders_wide
                 SELECT o_orderkey, o_orderkey % 100000 + 4000000000,
                        CAST(o_totalprice AS DECIMAL(20,4))
                          + 1000000000000000.0000
                 FROM q219_orders WHERE o_orderkey % 4 = 0""")
        s.sql("""
          SELECT CASE WHEN lnum >= 4000000000 THEN 'wide'
                      ELSE 'narrow' END AS phase,
                 COUNT(*) AS n, CAST(SUM(lnum) AS BIGINT) AS lnum_sum,
                 CAST(SUM(price) AS DOUBLE) AS price_sum
          FROM graft_cat.default.orders_wide
          GROUP BY 1 ORDER BY phase""")
      },
      Some("""
        SELECT CASE WHEN o_orderkey % 4 = 0 THEN 'wide'
                    ELSE 'narrow' END AS phase,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderkey % 4 = 0
                    THEN o_orderkey % 100000 + 4000000000
                    ELSE o_orderkey % 100000 END) AS BIGINT) AS lnum_sum,
               CAST(SUM(CASE WHEN o_orderkey % 4 = 0
                    THEN CAST(o_totalprice AS DECIMAL(20,4))
                         + 1000000000000000.0000
                    ELSE CAST(o_totalprice AS DECIMAL(12,4)) END)
                    AS DOUBLE) AS price_sum
        FROM orders GROUP BY 1 ORDER BY phase""")),

    // -------------------------------------------------------------- q220:
    // DEEP-NESTED CATALOG COLUMNS — the full q23/q68 events-props
    // shape IN the managed table (r11 verdict gap 4 closed): a
    // STRUCT<ARRAY, STRING> and a MAP<STRING, ARRAY<BIGINT>> column
    // stored natively (writer/type-mapping/reader all structurally
    // recursive), carried bit-exactly through a CoW DELETE rewrite,
    // then aggregated OUT of the nesting with higher-order lambdas —
    // the whole cycle hash-matched against DuckDB recomputing the
    // same arithmetic from the flat source. Nesting is columnar all
    // the way down (standard parquet LIST/MAP groups), so at 100 TB
    // a projection of one nested field still prunes the rest.
    QueryDef(
      "q220_nested_catalog",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_nest")
        s.sql("""CREATE TABLE graft_cat.default.orders_nest
                 (o_orderkey BIGINT,
                  meta STRUCT<tags: ARRAY<BIGINT>, label: STRING>,
                  buckets MAP<STRING, ARRAY<BIGINT>>)""")
        Tables(s, d, "orders").createOrReplaceTempView("q220_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_nest
                 SELECT o_orderkey,
                        named_struct('tags',
                          array(o_orderkey % 7, o_orderkey % 11),
                          'label', o_orderpriority),
                        map('a', array(o_orderkey % 3),
                            'b', array(o_orderkey % 5, o_orderkey % 9))
                 FROM q220_orders""")
        // CoW DML over the nested columns: carried rows bit-exact
        s.sql("""DELETE FROM graft_cat.default.orders_nest
                 WHERE o_orderkey % 10 = 0""")
        s.sql("""
          SELECT meta.label AS label, COUNT(*) AS n,
                 CAST(SUM(aggregate(meta.tags, 0L, (a, x) -> a + x))
                   AS BIGINT) AS tag_sum,
                 CAST(SUM(aggregate(flatten(map_values(buckets)), 0L,
                   (a, x) -> a + x)) AS BIGINT) AS bucket_sum
          FROM graft_cat.default.orders_nest
          GROUP BY 1 ORDER BY label""")
      },
      Some("""
        SELECT o_orderpriority AS label, COUNT(*) AS n,
               CAST(SUM(o_orderkey % 7 + o_orderkey % 11) AS BIGINT)
                 AS tag_sum,
               CAST(SUM(o_orderkey % 3 + o_orderkey % 5 + o_orderkey % 9)
                 AS BIGINT) AS bucket_sum
        FROM orders WHERE o_orderkey % 10 != 0
        GROUP BY 1 ORDER BY label""")),

    // -------------------------------------------------------------- q221:
    // COLUMN DEFAULT VALUES — DSv2 SUPPORT_COLUMN_DEFAULT_VALUE end to
    // end: CREATE with a DEFAULT (INSERT omit-fill by the analyzer),
    // then ALTER TABLE ADD COLUMN ... DEFAULT as a PURE METADATA
    // commit where every row in a pre-ADD file reads the frozen
    // EXISTS_DEFAULT — backfilled by the scan, visible to pruning
    // (min = max = default for pre-ADD files) — while post-ADD
    // inserts store real values. At 100 TB this is the other half of
    // zero-rewrite schema evolution: adding an attribute with a
    // meaningful fill never touches a data file.
    QueryDef(
      "q221_column_defaults",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_dfl")
        s.sql("""CREATE TABLE graft_cat.default.orders_dfl
                 (o_orderkey BIGINT, priority STRING,
                  src STRING DEFAULT 'seed')""")
        Tables(s, d, "orders").createOrReplaceTempView("q221_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_dfl
                 (o_orderkey, priority)
                 SELECT o_orderkey, o_orderpriority FROM q221_orders""")
        s.sql("""ALTER TABLE graft_cat.default.orders_dfl
                 ADD COLUMN region STRING DEFAULT 'emea'""")
        s.sql("""ALTER TABLE graft_cat.default.orders_dfl
                 ADD COLUMN boost BIGINT DEFAULT 10""")
        s.sql("""INSERT INTO graft_cat.default.orders_dfl
                 SELECT o_orderkey + 100000000, o_orderpriority,
                        'late', 'apac', o_orderkey % 5
                 FROM q221_orders""")
        s.sql("""
          SELECT src, region, COUNT(*) AS n,
                 CAST(SUM(boost) AS BIGINT) AS boost_sum
          FROM graft_cat.default.orders_dfl
          GROUP BY src, region ORDER BY src""")
      },
      Some("""
        SELECT 'late' AS src, 'apac' AS region, COUNT(*) AS n,
               CAST(SUM(o_orderkey % 5) AS BIGINT) AS boost_sum
        FROM orders
        UNION ALL
        SELECT 'seed', 'emea', COUNT(*), CAST(COUNT(*) * 10 AS BIGINT)
        FROM orders
        ORDER BY src""")),

    // -------------------------------------------------------------- q222:
    // ROLLBACK — the incident-response half of write-audit-publish
    // (q217 pins BEFORE publishing; this reverts AFTER a bad publish):
    // tag the good state, corrupt it with a DELETE + a stray INSERT,
    // `CALL system.rollback(tag)` — a NEW commit restoring the tagged
    // content, so the bad commits stay inspectable via time travel
    // while readers are back on clean data. The result proves both
    // sides: the 'corrupted' phase reads the bad snapshot (history
    // preserved), the 'restored' phase reads the table after rollback
    // — both hash-matched against DuckDB recomputing the arithmetic.
    QueryDef(
      "q222_rollback",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_rb")
        s.sql("""CREATE TABLE graft_cat.default.orders_rb
                 (o_orderkey BIGINT, o_orderpriority STRING)""")
        Tables(s, d, "orders").createOrReplaceTempView("q222_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_rb
                 SELECT o_orderkey, o_orderpriority FROM q222_orders""")
        s.sql("CALL graft_cat.system.tag('default.orders_rb', 'good')")
        // the bad batch
        s.sql("""DELETE FROM graft_cat.default.orders_rb
                 WHERE o_orderkey % 3 = 0""")
        s.sql("""INSERT INTO graft_cat.default.orders_rb
                 VALUES (424242424242, 'OOPS')""")
        val bad = s.sql(
          "CALL graft_cat.system.history('default.orders_rb')")
          .agg(org.apache.spark.sql.functions.max("version"))
          .head().getLong(0)
        s.sql("CALL graft_cat.system.rollback('default.orders_rb', 'good')")
        s.sql(s"""
          SELECT 'corrupted' AS phase, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_rb VERSION AS OF $bad
          UNION ALL
          SELECT 'restored', COUNT(*),
                 CAST(SUM(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_rb
          ORDER BY phase""")
      },
      Some("""
        SELECT 'corrupted' AS phase, COUNT(*) + 1 AS n,
               CAST(SUM(o_orderkey) + 424242424242 AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 3 != 0
        UNION ALL
        SELECT 'restored', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        ORDER BY phase""")),

    // -------------------------------------------------------------- q223:
    // CHECK CONSTRAINTS — DSv2 SUPPORT_TABLE_CONSTRAINT end to end:
    // an enforced CHECK declared at CREATE compiles into EVERY write
    // (a violating INSERT or UPDATE fails the job before any file
    // commits — data-quality contracts move from pipeline code into
    // the table), and ALTER TABLE ADD CONSTRAINT scans existing rows
    // before accepting. The result proves enforcement both ways: the
    // accepted corpus aggregates exactly, and the 'leaked' probe —
    // rows violating the predicate after two rejected writes — is
    // provably zero.
    QueryDef(
      "q223_check_constraint",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_ck")
        s.sql("""CREATE TABLE graft_cat.default.orders_ck
                 (o_orderkey BIGINT, price DECIMAL(12,4),
                  CONSTRAINT price_pos CHECK (price >= 0))""")
        Tables(s, d, "orders").createOrReplaceTempView("q223_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_ck
                 SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,4))
                 FROM q223_orders""")
        // both violating writes must fail LOUDLY and commit nothing
        val rejected =
          Seq("INSERT INTO graft_cat.default.orders_ck VALUES (1, -1.0)",
            """UPDATE graft_cat.default.orders_ck SET price = -5.0
               WHERE o_orderkey % 100 = 0""").count { stmt =>
            try { s.sql(stmt); false }
            catch { case _: Exception => true }
          }
        require(rejected == 2, s"CHECK enforcement let a write through")
        // ADD CONSTRAINT validates the existing corpus (full scan)
        s.sql("""ALTER TABLE graft_cat.default.orders_ck
                 ADD CONSTRAINT key_pos CHECK (o_orderkey >= 0)""")
        s.sql("""
          SELECT 'accepted' AS phase, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_ck
          UNION ALL
          SELECT 'leaked', COUNT(*), CAST(COALESCE(SUM(o_orderkey), 0)
            AS BIGINT)
          FROM graft_cat.default.orders_ck
          WHERE price < 0 OR o_orderkey < 0
          ORDER BY phase""")
      },
      Some("""
        SELECT 'accepted' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        UNION ALL
        SELECT 'leaked', 0, 0
        ORDER BY phase""")),

    // -------------------------------------------------------------- q224:
    // RUNTIME FILE SKIPPING — the star-schema join every warehouse
    // lives on: the fact table's effective predicate sits in the DIM
    // (invisible at plan time), so the scan advertises its layout
    // columns through SupportsRuntimeV2Filtering, Spark runs the dim
    // side first as a dynamic-pruning subquery, and the distinct join
    // keys arrive at EXECUTION time as an IN list that drops every
    // sorted fact file whose key span excludes them all (bucket ids
    // prune hash-bucketed facts the same way). At 100 TB this turns
    // "scan the fact table" into "open the files the dim selection
    // touches" — Iceberg's runtime file filtering (spec-pinned: the
    // dynamic-pruning subquery in the plan and the post-execution
    // file narrowing; this query pins the end-to-end result).
    QueryDef(
      "q224_runtime_file_skipping",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.lineitem_rt")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_rt")
        s.sql("""CREATE TABLE graft_cat.default.lineitem_rt
                 (l_orderkey BIGINT, l_linenumber INT)
                 TBLPROPERTIES ('graft.sort_by'='l_orderkey')""")
        s.sql("""CREATE TABLE graft_cat.default.orders_rt
                 (o_orderkey BIGINT, o_orderpriority STRING)""")
        Tables(s, d, "lineitem").createOrReplaceTempView("q224_lineitem")
        Tables(s, d, "orders").createOrReplaceTempView("q224_orders")
        s.sql("""INSERT INTO graft_cat.default.lineitem_rt
                 SELECT l_orderkey, l_linenumber FROM q224_lineitem""")
        s.sql("""INSERT INTO graft_cat.default.orders_rt
                 SELECT o_orderkey, o_orderpriority FROM q224_orders""")
        s.sql("""
          SELECT d.o_orderpriority AS priority, COUNT(*) AS n_lines,
                 CAST(SUM(f.l_linenumber) AS BIGINT) AS line_sum
          FROM graft_cat.default.lineitem_rt f
          JOIN graft_cat.default.orders_rt d
            ON f.l_orderkey = d.o_orderkey
          WHERE d.o_orderpriority = '1-URGENT'
             OR d.o_orderkey % 1000 = 7
          GROUP BY d.o_orderpriority ORDER BY priority""")
      },
      Some("""
        SELECT o.o_orderpriority AS priority, COUNT(*) AS n_lines,
               CAST(SUM(l.l_linenumber) AS BIGINT) AS line_sum
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT' OR o.o_orderkey % 1000 = 7
        GROUP BY o.o_orderpriority ORDER BY priority""")),

    // -------------------------------------------------------------- q225:
    // $files METADATA TABLE — Iceberg's `files` companion: the live
    // file census (exact per-file rows/bytes, bucket ids, the full
    // stats map) queryable in plain SQL, driver-local by construction
    // (it IS driver metadata — a LocalScan, zero executor work). The
    // operator questions at 100 TB — small-file pressure, skew, stats
    // coverage — become one-line queries instead of log spelunking.
    // The oracle cross-checks the census against the DATA: summed
    // file rows and the stats-map key min/max must equal what DuckDB
    // computes from the rows themselves.
    QueryDef(
      "q225_files_census",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_census")
        s.sql("""CREATE TABLE graft_cat.default.orders_census
                 (o_orderkey BIGINT, o_orderpriority STRING)
                 TBLPROPERTIES ('graft.sort_by'='o_orderkey')""")
        Tables(s, d, "orders").createOrReplaceTempView("q225_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_census
                 SELECT o_orderkey, o_orderpriority FROM q225_orders""")
        s.sql("""
          SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
                 CAST(MIN(CAST(stats['o_orderkey'].min AS BIGINT))
                   AS BIGINT) AS key_min,
                 CAST(MAX(CAST(stats['o_orderkey'].max AS BIGINT))
                   AS BIGINT) AS key_max,
                 CAST(SUM(stats['o_orderkey'].nulls) AS BIGINT)
                   AS null_count
          FROM graft_cat.default.`orders_census$files`""")
      },
      Some("""
        SELECT COUNT(*) AS total_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
               CAST(MAX(o_orderkey) AS BIGINT) AS key_max,
               CAST(0 AS BIGINT) AS null_count
        FROM orders""")),

    // -------------------------------------------------------------- q226:
    // MANIFEST-SERVED AGGREGATE PUSHDOWN — an unfiltered COUNT(*)/
    // COUNT(col)/MIN/MAX over a managed table answers from the commit
    // refs' exact per-file stats: ZERO data files opened, zero tasks
    // (a LocalScan — the spec pins the reader-open census at 0). At
    // 100 TB the commonest operational queries stop costing a corpus
    // scan. The oracle recomputes the same aggregates from the actual
    // rows in DuckDB, proving metadata == data. The nullable clerk
    // column exercises the exact null-count path; the DOUBLE price and
    // STRING priority exercise min/max decoding across types.
    QueryDef(
      "q226_agg_pushdown",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_agg")
        Tables(s, d, "orders").createOrReplaceTempView("q226_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_agg
                 AS SELECT o_orderkey, o_totalprice, o_orderpriority,
                           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                                ELSE o_orderstatus END AS clerk
                    FROM q226_orders""")
        s.sql("""
          SELECT COUNT(*) AS n_rows,
                 COUNT(clerk) AS n_clerk,
                 MIN(o_totalprice) AS min_price,
                 MAX(o_totalprice) AS max_price,
                 MIN(o_orderpriority) AS min_pri,
                 CAST(MAX(o_orderkey) AS BIGINT) AS max_key
          FROM graft_cat.default.orders_agg""")
      },
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                          ELSE o_orderstatus END) AS n_clerk,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               MIN(o_orderpriority) AS min_pri,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM orders""")),

    // -------------------------------------------------------------- q227:
    // TopN / LIMIT PUSHDOWN — `ORDER BY key LIMIT k` on a
    // sort_by-clustered managed table reads ONLY the file span(s) that
    // can contribute to the top k (per-file exact min/max bound the
    // k-th key; files provably beyond the bound never open). The
    // "latest 10 events on a 100 TB clustered log" query stops costing
    // a corpus-wide TakeOrdered. Spec pins the 1-file narrowing; this
    // query proves end-to-end equality with DuckDB's full sort on both
    // directions plus a bare LIMIT row-count contract.
    QueryDef(
      "q227_topn_pushdown",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_topn")
        Tables(s, d, "orders").createOrReplaceTempView("q227_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_topn
                 TBLPROPERTIES ('graft.sort_by'='o_orderkey')
                 AS SELECT o_orderkey, o_totalprice, o_orderpriority
                    FROM q227_orders""")
        s.sql("""
          SELECT * FROM (
            SELECT o_orderkey, o_totalprice, 'first' AS side
            FROM graft_cat.default.orders_topn
            ORDER BY o_orderkey LIMIT 5)
          UNION ALL
          SELECT * FROM (
            SELECT o_orderkey, o_totalprice, 'last' AS side
            FROM graft_cat.default.orders_topn
            ORDER BY o_orderkey DESC LIMIT 5)
          ORDER BY side, o_orderkey""")
      },
      Some("""
        SELECT * FROM (
          SELECT o_orderkey, o_totalprice, 'first' AS side
          FROM orders ORDER BY o_orderkey LIMIT 5)
        UNION ALL
        SELECT * FROM (
          SELECT o_orderkey, o_totalprice, 'last' AS side
          FROM orders ORDER BY o_orderkey DESC LIMIT 5)
        ORDER BY side, o_orderkey""")),

    // -------------------------------------------------------------- q228:
    // PER-FILE BLOOM FILTERS (`graft.bloom_by`) — point-lookup file
    // skipping on a high-cardinality UNSORTED column, the axis min/max
    // stats can't serve (every unsorted file's span admits every key).
    // The writing task commits a 4 KB bloom per (file, column) into
    // the ref; `WHERE k = v` / IN-lists (static or runtime-DPP) open
    // only the files whose bloom admits the probe. Spec pins the
    // 1-of-2 and 0-of-2 skip counts on provably-overlapping spans plus
    // cold-reload persistence; this query proves end-to-end equality
    // with DuckDB on a mixed present/absent IN probe.
    QueryDef(
      "q228_bloom_skipping",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_bloom")
        Tables(s, d, "orders").createOrReplaceTempView("q228_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_bloom
                 TBLPROPERTIES ('graft.bloom_by'='o_orderkey')
                 AS SELECT o_orderkey, o_totalprice, o_orderpriority
                    FROM q228_orders""")
        s.sql("""
          SELECT o_orderkey, o_totalprice, o_orderpriority
          FROM graft_cat.default.orders_bloom
          WHERE o_orderkey IN (1, 7, 32, 33, 4000, 999999999)
          ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey IN (1, 7, 32, 33, 4000, 999999999)
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------- q229:
    // INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the production MV
    // loop over an append-only managed fact table: `readStream.table`
    // tails the APPEND LOG (offsets index committed files, so each
    // refresh reads ONLY files landed since the checkpoint — never the
    // table), each micro-batch's per-key aggregate delta is MERGEd
    // into the MV as increments (+count, +decimal-exact sum). Two
    // separate refresh cycles over the same checkpoint prove the
    // increment path: the second reads just the second INSERT's files.
    // At 100 TB the refresh cost scales with NEW data, not table size
    // — the whole point of an MV. Crash-replay hardened (VERDICT r12
    // item 7): each batch's MERGE runs under [[GraftTable
    // .applyBatchOnce]], which stamps (appId -> batchId) into the SAME
    // commit — a batch re-delivered after a crash between the MERGE
    // and the checkpoint commit finds itself in the ledger and skips
    // (the Delta txnAppId/txnVersion pattern; spec-pinned in
    // MvExactlyOnceSpec). Oracle: DuckDB recomputes the aggregate from
    // ALL rows — incremental == full recompute.
    QueryDef(
      "q229_incremental_mv",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.mv_src")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.mv_totals")
        Tables(s, d, "orders").createOrReplaceTempView("q229_orders")
        s.sql("""CREATE TABLE graft_cat.default.mv_src
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)""")
        s.sql("""CREATE TABLE graft_cat.default.mv_totals
                 (o_orderpriority STRING, n_orders BIGINT,
                  total DECIMAL(18,4))""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q229-ckpt-").toString
        def refresh(): Unit = {
          val q = s.readStream
            .table("graft_cat.default.mv_src")
            .writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch {
              (batch: org.apache.spark.sql.DataFrame, id: Long) =>
                // decimal-exact sum (Det discipline): cast each price
                // to DECIMAL(12,4) before summing in BOTH engines.
                // applyBatchOnce makes the at-least-once foreachBatch
                // exactly-once: the MERGE's commit carries the batch-id
                // ledger stamp, so a crash-replayed batch skips.
                batch.createOrReplaceTempView("q229_batch")
                catalogTable(batch.sparkSession, "mv_totals")
                  .applyBatchOnce("q229_incremental_mv", id) {
                    batch.sparkSession.sql("""
                      MERGE INTO graft_cat.default.mv_totals t
                      USING (SELECT o_orderpriority,
                                    COUNT(*) AS dn,
                                    SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                                      AS dt
                             FROM q229_batch GROUP BY o_orderpriority) c
                      ON t.o_orderpriority = c.o_orderpriority
                      WHEN MATCHED THEN UPDATE SET
                        n_orders = t.n_orders + c.dn,
                        total = CAST(t.total + c.dt AS DECIMAL(18,4))
                      WHEN NOT MATCHED THEN
                        INSERT (o_orderpriority, n_orders, total)
                        VALUES (c.o_orderpriority, c.dn,
                                CAST(c.dt AS DECIMAL(18,4)))"""): Unit
                  }: Unit
            }
            .start()
          q.awaitTermination()
        }
        s.sql("""INSERT INTO graft_cat.default.mv_src
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q229_orders WHERE o_orderkey % 2 = 0""")
        refresh() // cycle 1: the even half
        s.sql("""INSERT INTO graft_cat.default.mv_src
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q229_orders WHERE o_orderkey % 2 = 1""")
        refresh() // cycle 2: reads ONLY the second insert's files
        // Det discipline (VERDICT r12 item 2): the MV stores the
        // decimal-exact total; the DECLARED output casts it to DOUBLE
        // so the driver's hash canonicalization sees one type in both
        // engines
        s.sql("""SELECT o_orderpriority, n_orders,
                        CAST(total AS DOUBLE) AS total
                 FROM graft_cat.default.mv_totals
                 ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                 AS DOUBLE) AS total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q230:
    // ZERO-COPY CLONE — `CALL system.clone` forks a 100-TB table for
    // O(files) metadata ops and ZERO data movement (hard links share
    // inodes), with fully independent lifecycles: the dev-branch
    // pattern (clone prod, mutate the clone, prod never moves) that a
    // petabyte pipeline uses for experiments and backfills. This query
    // clones a managed orders table, doubles urgent prices ON THE
    // CLONE via real UPDATE DML, and reads both sides — the oracle
    // recomputes both from the raw rows, proving the clone mutated and
    // the source stayed bit-identical. Spec pins the shared inodes,
    // the DROP-source survival, and the MOR compact-first gate.
    QueryDef(
      "q230_zero_copy_clone",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_dev")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_main")
        Tables(s, d, "orders").createOrReplaceTempView("q230_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_main
                 AS SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM q230_orders""")
        s.sql("""CALL graft_cat.system.clone('default.orders_main',
                                             'default.orders_dev')""")
        s.sql("""UPDATE graft_cat.default.orders_dev
                 SET o_totalprice = o_totalprice * 2
                 WHERE o_orderpriority = '1-URGENT'""")
        s.sql("""
          SELECT side, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                   AS DOUBLE) AS total
          FROM (
            SELECT 'main' AS side, o_totalprice
            FROM graft_cat.default.orders_main
            UNION ALL
            SELECT 'dev' AS side, o_totalprice
            FROM graft_cat.default.orders_dev)
          GROUP BY side ORDER BY side""")
      },
      Some("""
        SELECT side, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                 AS DOUBLE) AS total
        FROM (
          SELECT 'main' AS side, o_totalprice FROM orders
          UNION ALL
          SELECT 'dev' AS side,
                 CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice * 2 ELSE o_totalprice END
            AS o_totalprice
          FROM orders)
        GROUP BY side ORDER BY side""")),

    // -------------------------------------------------------------- q231:
    // GROUPED AGGREGATE PUSHDOWN — `GROUP BY <partition col>` with
    // COUNT/MIN/MAX serves from the manifest too: identity-partitioned
    // writes pin every file to ONE partition value (min == max, zero
    // nulls), so the refs group by their pinned tuples and each
    // group's aggregates fold driver-side — zero files opened, zero
    // tasks. The per-partition census of a 100-TB table ("how many
    // rows per day?") becomes a metadata query, Iceberg's `partitions`
    // table generalized to arbitrary COUNT/MIN/MAX. Spec pins the
    // zero-opens census and the null-partition refusal; this query
    // proves value equality with DuckDB's full recompute.
    QueryDef(
      "q231_grouped_agg_pushdown",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_part_agg")
        Tables(s, d, "orders").createOrReplaceTempView("q231_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_part_agg
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 PARTITIONED BY (o_orderpriority)""")
        s.sql("""INSERT INTO graft_cat.default.orders_part_agg
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q231_orders""")
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
                 CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
                 MIN(o_totalprice) AS min_price
          FROM graft_cat.default.orders_part_agg
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
               MIN(o_totalprice) AS min_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q232:
    // MERGE WITH SCHEMA EVOLUTION — the upstream-added-a-field CDC
    // reality: the changeset carries a column the target lacks, and
    // the single MERGE statement both evolves the schema (routed
    // through the same ADD COLUMN schema-commit as explicit DDL —
    // time travel to the pre-merge version still shows the old
    // schema) and applies the rows. Works on the MOR table: old base
    // AND delta entries backfill the new column as null at fold.
    // Without the clause a star-merge silently ignores extra source
    // columns (spec-pinned); with it nothing is lost. Oracle
    // recomputes the evolved end state from the raw rows.
    QueryDef(
      "q232_merge_schema_evolution",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_mse")
        Tables(s, d, "orders").createOrReplaceTempView("q232_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_mse
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')
                 AS SELECT o_orderkey, o_totalprice FROM q232_orders""")
        s.sql("""CREATE OR REPLACE TEMP VIEW q232_changes AS
                 SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                        'doubled' AS origin
                 FROM q232_orders WHERE o_orderkey % 7 = 0""")
        s.sql("""MERGE WITH SCHEMA EVOLUTION
                 INTO graft_cat.default.orders_mse t
                 USING q232_changes c ON t.o_orderkey = c.o_orderkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
        s.sql("""
          SELECT origin, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                   AS DOUBLE) AS total
          FROM graft_cat.default.orders_mse
          GROUP BY origin ORDER BY origin NULLS FIRST""")
      },
      Some("""
        SELECT origin, COUNT(*) AS n,
               CAST(SUM(CAST(price AS DECIMAL(13,4))) AS DOUBLE)
                 AS total
        FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                          ELSE o_totalprice END AS price,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'doubled' END
                       AS origin
              FROM orders)
        GROUP BY origin ORDER BY origin NULLS FIRST""")),

    // -------------------------------------------------------------- q233:
    // PARTITION-SCOPED COMPACTION — `CALL system.compact(t, where)`
    // rewrites ONLY the partitions the predicate selects (REPLACE
    // WHERE; the commit re-validates the replaced set), leaving every
    // other file byte-identical. At 100 TB the hot partition's
    // small-file pileup is maintained for the cost of that partition,
    // not the table — the only affordable maintenance shape. Spec
    // pins the 3-to-1 file collapse with untouched-sibling paths and
    // the undecidable-predicate reject; this query proves content
    // integrity across seed -> appends -> scoped compaction.
    QueryDef(
      "q233_partition_scoped_compact",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_psc")
        Tables(s, d, "orders").createOrReplaceTempView("q233_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_psc
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 PARTITIONED BY (o_orderpriority)""")
        // three appends -> small-file pileup in every partition
        (0 to 2).foreach { i =>
          s.sql(s"""INSERT INTO graft_cat.default.orders_psc
                    SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM q233_orders WHERE o_orderkey % 3 = $i""")
        }
        s.sql("""CALL graft_cat.system.compact('default.orders_psc',
                 where => "o_orderpriority = '1-URGENT'")""")
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                   AS DOUBLE) AS total
          FROM graft_cat.default.orders_psc
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                 AS DOUBLE) AS total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q234:
    // ATOMIC CREATE OR REPLACE TABLE AS — the StagingTableCatalog seam:
    // the replacement's output lands in STAGED storage and the name
    // binding swaps only at commit, so readers never observe a
    // half-written table and a failed replacement aborts to the
    // previous one (spec pins the failure path and the staged-dir
    // cleanup with raise_error mid-write). The nightly-rebuild pattern
    // every production mart runs. This query rebuilds a summary table
    // twice — the second REPLACE must fully supersede the first — and
    // the oracle recomputes the final build from the raw rows.
    QueryDef(
      "q234_atomic_replace_table",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Tables(s, d, "orders").createOrReplaceTempView("q234_orders")
        s.sql("""CREATE OR REPLACE TABLE graft_cat.default.orders_mart AS
                 SELECT o_orderpriority, COUNT(*) AS n
                 FROM q234_orders GROUP BY o_orderpriority""")
        s.sql("""CREATE OR REPLACE TABLE graft_cat.default.orders_mart AS
                 SELECT o_orderpriority,
                        COUNT(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                          AS DOUBLE) AS total
                 FROM q234_orders
                 WHERE o_orderkey % 2 = 0
                 GROUP BY o_orderpriority""")
        s.sql("""SELECT o_orderpriority, n, total
                 FROM graft_cat.default.orders_mart
                 ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                 AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 2 = 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q235:
    // SMALL-FILE BIN PACKING — `CALL system.rewrite_small_files` reads
    // ONLY the files below the threshold (pruned to exactly them via
    // the `_file` metadata-column predicate), packs their rows into
    // ~threshold-sized outputs, and swaps old-for-new in ONE atomic
    // selective-replace commit; every file already at size survives
    // byte-identical. At 100 TB maintenance cost is proportional to
    // the small-file pileup, not the table — the knob that keeps a
    // streaming-ingested corpus readable without ever paying a full
    // compaction. Spec pins the pack-only-small selectivity, the
    // surviving big-file path, idempotence, and the clustered-table
    // reject; this query proves row-level integrity across seed ->
    // small appends -> pack.
    QueryDef(
      "q235_small_file_packing",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_pack")
        Tables(s, d, "orders").createOrReplaceTempView("q235_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_pack
                 AS SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM q235_orders WHERE o_orderkey % 5 <> 0""")
        // five drip appends -> five small files on top of the seed
        (0 to 4).foreach { i =>
          s.sql(s"""INSERT INTO graft_cat.default.orders_pack
                    SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM q235_orders
                    WHERE o_orderkey % 5 = 0 AND o_orderkey % 25 = ${i * 5}""")
        }
        s.sql("""CALL graft_cat.system.rewrite_small_files(
                   'default.orders_pack')""")
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                   AS DOUBLE) AS total,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_pack
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                 AS DOUBLE) AS total,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q236:
    // WRITE-SIDE TARGET FILE SIZE (`graft.target_file_bytes`) — the
    // small-file PREVENTION knob: the write reports an advisory
    // partition size through RequiresDistributionAndOrdering, so AQE
    // rebalances every INSERT toward ~N-byte outputs regardless of
    // upstream parallelism (a 32-task trickle write lands ONE file,
    // spec-pinned; a huge write splits). At 100 TB this is what keeps
    // a streaming-ingested table readable without leaning on
    // after-the-fact compaction. This query writes orders through a
    // 64 MB-target table in three 24-task inserts and proves content
    // integrity; the FILE-COUNT pin (one rebalanced file per insert)
    // lives in the spec's controlled environment, not the oracle
    // contract — AQE's advisory coalescing is best-effort and
    // environment-dependent (ADVICE r12).
    QueryDef(
      "q236_target_file_size",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_tfs")
        Tables(s, d, "orders").repartition(24)
          .createOrReplaceTempView("q236_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_tfs
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.target_file_bytes'='67108864')""")
        (0 to 2).foreach { i =>
          s.sql(s"""INSERT INTO graft_cat.default.orders_tfs
                    SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM q236_orders WHERE o_orderkey % 3 = $i""")
        }
        s.sql("""
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                   AS DOUBLE) AS total
          FROM graft_cat.default.orders_tfs""")
      },
      Some("""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4)))
                 AS DOUBLE) AS total
        FROM orders""")),

    // -------------------------------------------------------------- q237:
    // $history METADATA TABLE — the commit audit trail in plain SQL
    // (Iceberg's `history`/`snapshots`): one row per retained
    // snapshot with base/delta censuses and the TAGS pinning it.
    // Operators answer "what changed, when, and what's published?"
    // with a SELECT instead of log spelunking; driver-local by
    // construction (a LocalScan over driver metadata). The oracle is
    // exact because the whole history is derivable from the data:
    // the MOR seed commits |orders| base rows at v0, the MERGE
    // commits one delta op per changeset row at v1, and the TAG is
    // itself a commit (v2, content unchanged) carrying the pin —
    // history records every state change, including publishes.
    QueryDef(
      "q237_history_table",
      (s, d) => {
        seedAndMergeMor(s, d) // -> versions [0 seed, 1 merge]
        s.sql("CALL graft_cat.system.tag('default.orders_mor', 'audited')")
        s.sql("""
          SELECT version, base_rows, delta_ops, tags
          FROM graft_cat.default.`orders_mor$history`
          ORDER BY version""")
      },
      Some("""
        WITH n AS (SELECT COUNT(*) AS base FROM orders),
        c AS (SELECT COUNT(*) AS ops FROM orders
              WHERE o_orderkey % 10 IN (0, 1, 2))
        SELECT CAST(0 AS BIGINT) AS version, base AS base_rows,
               CAST(0 AS BIGINT) AS delta_ops, '' AS tags FROM n
        UNION ALL
        SELECT CAST(1 AS BIGINT), base, ops, '' FROM n, c
        UNION ALL
        SELECT CAST(2 AS BIGINT), base, ops, 'audited' FROM n, c
        ORDER BY version""")),

    // -------------------------------------------------------------- q238:
    // INCREMENTAL CORPUS INGEST, END TO END — the training-data loop
    // composed from this round's parts, the pipeline a 100-TB corpus
    // actually runs: (1) the corpus is a managed MOR table with an
    // ENFORCED CHECK quality gate (n_chars > 0 — junk fails the WRITE,
    // it never lands) and a bloom on doc_id for point audits; (2) a
    // second ingest batch arrives OVERLAPPING the first (re-delivered
    // docs) and lands through an id-keyed `MERGE … WHEN NOT MATCHED
    // INSERT` — at-least-once delivery made exactly-once, the q210
    // idempotence pattern at ingest time; (3) exact near-dup curation
    // removes bag-of-words duplicates with a MERGE DELETE
    // (delta-sized tombstones, q211's shape); (4) the result is
    // PUBLISHED under a tag, and the reader consumes `VERSION AS OF
    // 'published'` — write-audit-publish, so a later bad write can
    // never reach this reader. The oracle rebuilds the same corpus
    // arithmetic from the raw rows: union of both batches, id-dedup,
    // fingerprint-dedup keeping the smallest doc_id.
    QueryDef(
      "q238_incremental_ingest",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_live")
        Tables(s, d, "documents").createOrReplaceTempView("q238_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_live
                 (doc_id BIGINT, text STRING, lang STRING,
                  source STRING, n_chars BIGINT,
                  CONSTRAINT quality CHECK (n_chars > 0))
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='doc_id',
                                'graft.bloom_by'='doc_id')""")
        s.sql("""INSERT INTO graft_cat.default.corpus_live
                 SELECT * FROM q238_docs WHERE doc_id % 3 <> 0""")
        // batch 2: the remaining docs PLUS a re-delivered overlap slice
        s.sql("""CREATE OR REPLACE TEMP VIEW q238_batch2 AS
                 SELECT * FROM q238_docs WHERE doc_id % 3 = 0
                 UNION ALL
                 SELECT * FROM q238_docs WHERE doc_id % 6 = 1""")
        s.sql("""MERGE INTO graft_cat.default.corpus_live t
                 USING q238_batch2 b ON t.doc_id = b.doc_id
                 WHEN NOT MATCHED THEN INSERT *""")
        // curation: drop bag-of-words duplicates, keep smallest doc_id
        s.sql("""
          MERGE INTO graft_cat.default.corpus_live t
          USING (
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                       AS rn
              FROM (SELECT doc_id,
                           md5(concat_ws('|', array_sort(array_distinct(
                             graft_tokens(text))))) AS fp
                    FROM graft_cat.default.corpus_live))
            WHERE rn > 1) dupes
          ON t.doc_id = dupes.doc_id
          WHEN MATCHED THEN DELETE""")
        s.sql(
          "CALL graft_cat.system.tag('default.corpus_live', 'published')")
        s.sql("""
          SELECT lang, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                 CAST(SUM(doc_id) AS BIGINT) AS id_sum
          FROM graft_cat.default.corpus_live VERSION AS OF 'published'
          GROUP BY lang ORDER BY lang""")
      },
      Some(s"""
        WITH f AS (SELECT doc_id,
                          md5(array_to_string(list_sort(list_distinct(
                            ${graft.text.TextAnalysis.duckTokens})), '|')) fp
                   FROM documents),
        keep AS (SELECT MIN(doc_id) AS k FROM f GROUP BY fp),
        c AS (SELECT d.* FROM documents d JOIN keep ON d.doc_id = keep.k)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM c GROUP BY lang ORDER BY lang""")),

    // -------------------------------------------------------------- q239:
    // STREAMING ADMISSION CONTROL — `maxFilesPerTrigger` +
    // Trigger.AvailableNow on the catalog streams: a backfill over a
    // huge table processes a BOUNDED number of committed files per
    // micro-batch (bounded task count and state, steady checkpoint
    // cadence — the backpressure shape a 100-TB replay needs) and
    // terminates at the end offset PINNED at query start, even while
    // writers keep committing. Six single-file appends stream as
    // exactly three 2-file batches (spec also pins the change feed's
    // 1-delta-per-batch variant); the batch boundaries are
    // deterministic because offsets index the append ledger in commit
    // order, so the oracle recomputes each batch's row count and key
    // sum from the corresponding modular slices.
    QueryDef(
      "q239_stream_admission_control",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_ac")
        Tables(s, d, "orders").createOrReplaceTempView("q239_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_ac
                 (o_orderkey BIGINT)""")
        (0 until 6).foreach { i =>
          s.sql(s"""INSERT INTO graft_cat.default.orders_ac
                    SELECT o_orderkey FROM q239_orders
                    WHERE o_orderkey % 6 = $i""")
        }
        val stats =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        val ckpt = java.nio.file.Files
          .createTempDirectory("q239-ckpt-").toString
        s.readStream
          .option("maxFilesPerTrigger", "2")
          .table("graft_cat.default.orders_ac")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, id: Long) =>
              val r = b.agg(
                org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)),
                org.apache.spark.sql.functions.sum("o_orderkey")).head()
              stats.synchronized {
                stats += ((id, r.getLong(0), r.getLong(1))): Unit
              }
          }
          .start().awaitTermination()
        import s.implicits._
        stats.toSeq.sortBy(_._1)
          .toDF("batch", "n_rows", "key_sum")
      },
      Some("""
        SELECT CAST((o_orderkey % 6) // 2 AS BIGINT) AS batch,
               COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders GROUP BY 1 ORDER BY batch""")),

    // -------------------------------------------------------------- q241:
    // STRING-PREFIX PREDICATE PUSHDOWN (SupportsPushDownV2Filters,
    // VERDICT r12 item 4) — `LIKE 'P%'` on a `graft.sort_by` string
    // table prunes at FILE granularity: Catalyst rewrites the LIKE to
    // StartsWith, pushes it through the V2 predicate seam, and the
    // scan drops every file whose [min, max] span provably excludes
    // the prefix range [P, P·∞). The write path range-partitions a
    // sorted insert, so spans are near-disjoint and the prefix lookup
    // on a 100-TB key-sorted table opens O(matching) files — the
    // "fetch one tenant/entity block by key prefix" shape. The spec
    // pins the file skips (opens < files) and the AND/OR tree pruning;
    // this query proves value equality with DuckDB recomputing the
    // same prefix selection from the raw rows.
    QueryDef(
      "q241_prefix_pushdown",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_pfx")
        s.sql("""CREATE TABLE graft_cat.default.orders_pfx
                 (okey STRING, o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.sort_by'='okey')""")
        Tables(s, d, "orders").createOrReplaceTempView("q241_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_pfx
                 SELECT 'K' || lpad(CAST(o_orderkey AS STRING), 8, '0'),
                        o_totalprice
                 FROM q241_orders""")
        s.sql("""SELECT okey, o_totalprice
                 FROM graft_cat.default.orders_pfx
                 WHERE okey LIKE 'K0000012%'
                 ORDER BY okey""")
      },
      Some("""
        SELECT okey, o_totalprice FROM (
          SELECT 'K' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS okey,
                 o_totalprice
          FROM orders)
        WHERE okey LIKE 'K0000012%'
        ORDER BY okey""")),

    // -------------------------------------------------------------- q242:
    // AGGREGATE PUSHDOWN UNDER PARTITION-EXACT WHERE (VERDICT r12 item
    // 5) — `COUNT/MIN/MAX ... WHERE <partition col> = v` on an
    // identity-partitioned table is pure metadata: every file pins its
    // partition tuple, so the filter is applied EXACTLY by selecting
    // the must-match files, no residual Filter remains, and Spark
    // pushes the aggregation — served from those files' manifest stats
    // with ZERO files opened (spec-pinned via the fileOpens census).
    // The "how big is partition X?" census of a 100-TB table costs
    // O(refs) driver work, no cluster time. q226/q231 covered the
    // unfiltered and grouped shapes; this closes the filtered one the
    // r12 builder note called unreachable.
    QueryDef(
      "q242_partition_exact_agg",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_pea")
        s.sql("""CREATE TABLE graft_cat.default.orders_pea
                 (o_orderkey BIGINT, o_totalprice DOUBLE,
                  o_orderpriority STRING)
                 PARTITIONED BY (o_orderpriority)""")
        Tables(s, d, "orders").createOrReplaceTempView("q242_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_pea
                 SELECT o_orderkey, o_totalprice, o_orderpriority
                 FROM q242_orders""")
        s.sql("""SELECT COUNT(*) AS n,
                        CAST(MIN(o_orderkey) AS BIGINT) AS key_lo,
                        CAST(MAX(o_orderkey) AS BIGINT) AS key_hi
                 FROM graft_cat.default.orders_pea
                 WHERE o_orderpriority = '1-URGENT'""")
      },
      Some("""
        SELECT COUNT(*) AS n,
               CAST(MIN(o_orderkey) AS BIGINT) AS key_lo,
               CAST(MAX(o_orderkey) AS BIGINT) AS key_hi
        FROM orders WHERE o_orderpriority = '1-URGENT'"""))
  ,

    // -------------------------------------------------------------- q243:
    // MULTI-NAMESPACE DDL (VERDICT r12 item 6) — real warehouse
    // schemas: CREATE/DROP NAMESPACE (persisted in the warehouse,
    // cross-process-locked with the table index), tables addressed by
    // two-level identifiers, and the staging->publish promotion as a
    // pure METADATA rename ACROSS namespaces (the table directory
    // never moves — promoting a loaded 100-TB staging table to the
    // analytics schema costs one index write). This query runs the
    // whole lifecycle — create schemas, CTAS into staging, promote by
    // cross-namespace rename, read back from the published name — and
    // the oracle recomputes the published content from the raw rows.
    QueryDef(
      "q243_multi_namespace",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP NAMESPACE IF EXISTS graft_cat.analytics CASCADE")
        s.sql("DROP NAMESPACE IF EXISTS graft_cat.staging CASCADE")
        s.sql("CREATE NAMESPACE graft_cat.staging")
        s.sql("""CREATE NAMESPACE graft_cat.analytics
                 WITH PROPERTIES ('team' = 'pipeline')""")
        Tables(s, d, "orders").createOrReplaceTempView("q243_orders")
        s.sql("""CREATE TABLE graft_cat.staging.ord_inbox AS
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q243_orders WHERE o_orderkey % 2 = 0""")
        // promote: metadata-only rename across namespaces
        s.sql("""ALTER TABLE graft_cat.staging.ord_inbox
                 RENAME TO analytics.ord_pub""")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
                 FROM graft_cat.analytics.ord_pub
                 GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 2 = 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q244:
    // COMPOSED LAYOUT PRUNING: Z-ORDER SPANS x BLOOM FILTERS — the two
    // skipping mechanisms are INDEPENDENT axes and a scan applies both:
    // `graft.zorder_by (a, b)` clusters files into near-disjoint
    // 2-D tiles (range predicates on EITHER dimension prune by
    // min/max span), while `graft.bloom_by c` catches point lookups on
    // an UNCLUSTERED high-cardinality column whose value spans admit
    // everything. The multi-tenant analytics shape at 100 TB: range-
    // slice by the clustered dimensions AND pin an exact id, and the
    // scan opens only files that survive BOTH tests. Spec pins the
    // composed file skips; this query proves value equality for
    // range-AND-point, point-only, and range-only selections.
    QueryDef(
      "q244_zorder_bloom_compose",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_zb")
        s.sql("""CREATE TABLE graft_cat.default.orders_zb
                 (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
                 TBLPROPERTIES (
                   'graft.zorder_by'='o_custkey,o_totalprice',
                   'graft.bloom_by'='o_orderkey')""")
        Tables(s, d, "orders").createOrReplaceTempView("q244_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_zb
                 SELECT o_orderkey, o_custkey, o_totalprice
                 FROM q244_orders""")
        s.sql("""
          SELECT 'range_and_point' AS shape, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS s
          FROM graft_cat.default.orders_zb
          WHERE o_custkey BETWEEN 100 AND 300 AND o_orderkey = 742
          UNION ALL
          SELECT 'point_only', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_zb WHERE o_orderkey = 742
          UNION ALL
          SELECT 'range_only', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_zb
          WHERE o_custkey BETWEEN 100 AND 300 AND o_totalprice < 150000.0
          ORDER BY shape""")
      },
      Some("""
        SELECT 'range_and_point' AS shape, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS s
        FROM orders
        WHERE o_custkey BETWEEN 100 AND 300 AND o_orderkey = 742
        UNION ALL
        SELECT 'point_only', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders WHERE o_orderkey = 742
        UNION ALL
        SELECT 'range_only', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        WHERE o_custkey BETWEEN 100 AND 300 AND o_totalprice < 150000.0
        ORDER BY shape""")),

    // -------------------------------------------------------------- q245:
    // $partitions METADATA TABLE — the per-partition census (Iceberg's
    // `partitions` table): one row per live partition tuple with exact
    // file/row/byte counts folded from the commit refs, driver-local
    // by construction. The operator questions at 100 TB — "which
    // partition is skewed?", "where did the small files pile up?" —
    // become one-line SQL with zero cluster work. The oracle pins the
    // ROW counts against DuckDB's full recompute (file counts are
    // writer-parallelism-dependent and census in the spec instead).
    QueryDef(
      "q245_partitions_table",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_pt")
        s.sql("""CREATE TABLE graft_cat.default.orders_pt
                 (o_orderkey BIGINT, o_orderpriority STRING)
                 PARTITIONED BY (o_orderpriority)""")
        Tables(s, d, "orders").createOrReplaceTempView("q245_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_pt
                 SELECT o_orderkey, o_orderpriority FROM q245_orders""")
        s.sql("""SELECT partition, n_rows
                 FROM graft_cat.default.`orders_pt$partitions`
                 ORDER BY partition""")
      },
      Some("""
        SELECT 'o_orderpriority=' || o_orderpriority AS partition,
               COUNT(*) AS n_rows
        FROM orders GROUP BY 1 ORDER BY partition""")),

    // -------------------------------------------------------------- q246:
    // OFFSET PUSHDOWN (`SupportsPushDownOffset`) — `OFFSET n` on an
    // unfiltered managed scan drops exactly n rows INSIDE the scan:
    // whole leading files the offset provably spans are never opened
    // (spec-pinned: 2 of 4 files), the boundary file drops a row
    // prefix at the source. Paginating a 100-TB export with
    // LIMIT/OFFSET costs O(page), not O(scanned-so-far). The table is
    // built as four ascending key-sliced commits, so the scan's
    // deterministic commit-order read makes "the first 600 rows" the
    // 600 smallest keys — which is what DuckDB's ORDER BY ... OFFSET
    // recomputes for the oracle.
    QueryDef(
      "q246_offset_pushdown",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, ntile}
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_ofs")
        s.sql("CREATE TABLE graft_cat.default.orders_ofs (k BIGINT)")
        val w = org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")
        val tiled = Tables(s, d, "orders")
          .select(col("o_orderkey"))
          .withColumn("tile", ntile(4).over(w))
        (1 to 4).foreach { i =>
          tiled.filter(col("tile") === i)
            .select(col("o_orderkey").as("k"))
            .orderBy("k").coalesce(1)
            .createOrReplaceTempView("q246_slice")
          s.sql("""INSERT INTO graft_cat.default.orders_ofs
                   SELECT k FROM q246_slice""")
        }
        s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(k) AS BIGINT) AS key_sum
                 FROM (SELECT k FROM graft_cat.default.orders_ofs
                       OFFSET 600)""")
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM (SELECT o_orderkey FROM orders
              ORDER BY o_orderkey OFFSET 600)""")),

    // -------------------------------------------------------------- q248:
    // NESTED ADD COLUMN — the chunk-store evolution story: annotate
    // every element of a 100-TB ARRAY<STRUCT> corpus with a new
    // subfield (`ALTER TABLE ... ADD COLUMN chunks.element.quality`)
    // as a PURE METADATA commit. Files written before the ALTER lack
    // the leaf; the reader clips its parquet request per file and
    // binds clipped children back to the current struct BY NAME, so
    // pre-ADD chunks read the subfield as null (array lengths and
    // struct presence survive even when a projection asks only for
    // the new leaf — the presence-witness clip; NestedEvolutionSpec
    // pins struct/array/map parents, MOR folds across both eras, DML
    // carry-over, and the loud rejects). This query aggregates OUT of
    // the nesting across both eras — coalescing pre-ADD nulls to a
    // sentinel the oracle reproduces — proving old and new files
    // compute side by side, digit for digit.
    QueryDef(
      "q248_nested_add_column",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.docs_ev")
        s.sql("""CREATE TABLE graft_cat.default.docs_ev
                 (doc_id BIGINT,
                  chunks ARRAY<STRUCT<pos: BIGINT, toks: BIGINT>>)""")
        Tables(s, d, "orders").createOrReplaceTempView("q248_orders")
        s.sql("""INSERT INTO graft_cat.default.docs_ev
                 SELECT o_orderkey,
                        array(named_struct('pos', 0L,
                                'toks', o_orderkey % 7),
                              named_struct('pos', 1L,
                                'toks', o_orderkey % 11))
                 FROM q248_orders WHERE o_orderkey % 2 = 0""")
        s.sql("""ALTER TABLE graft_cat.default.docs_ev
                 ADD COLUMN chunks.element.quality DOUBLE""")
        s.sql("""INSERT INTO graft_cat.default.docs_ev
                 SELECT o_orderkey,
                        array(named_struct('pos', 0L,
                                'toks', o_orderkey % 7,
                                'quality',
                                CAST(o_orderkey % 100 AS DOUBLE)),
                              named_struct('pos', 1L,
                                'toks', o_orderkey % 11,
                                'quality',
                                CAST(o_orderkey % 9 AS DOUBLE)))
                 FROM q248_orders WHERE o_orderkey % 2 = 1""")
        s.sql("""
          SELECT CASE WHEN doc_id % 2 = 0 THEN 'pre' ELSE 'post' END
                   AS era,
                 COUNT(*) AS n,
                 CAST(SUM(aggregate(chunks, 0L,
                   (a, c) -> a + c.toks)) AS BIGINT) AS tok_sum,
                 CAST(SUM(aggregate(chunks, CAST(0.0 AS DOUBLE),
                   (a, c) -> a + coalesce(c.quality,
                     CAST(-1.0 AS DOUBLE)))) AS DOUBLE) AS q_sum
          FROM graft_cat.default.docs_ev
          GROUP BY 1 ORDER BY era""")
      },
      Some("""
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'pre' ELSE 'post' END
                 AS era,
               COUNT(*) AS n,
               CAST(SUM(o_orderkey % 7 + o_orderkey % 11) AS BIGINT)
                 AS tok_sum,
               CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN -2.0
                        ELSE CAST(o_orderkey % 100 + o_orderkey % 9
                               AS DOUBLE) END) AS DOUBLE) AS q_sum
        FROM orders GROUP BY 1 ORDER BY era""")),

    // -------------------------------------------------------------- q249:
    // LIVE TABLE RETUNING (`ALTER TABLE ... SET TBLPROPERTIES`) — the
    // tunable layout knobs apply to FUTURE writes without touching a
    // byte of existing data: a table starts bare, gets
    // `graft.bloom_by` + `graft.sort_by` retuned mid-ingest, and keeps
    // ingesting — new files carry blooms and narrow sort spans (the
    // spec pins that a post-retune bloom actually prunes), old files
    // stay exactly as written, and every scan sees one coherent table.
    // At 100 TB this is how a layout decision gets corrected without a
    // rewrite: point lookups on the retuned key get faster file by
    // file as new data lands. The oracle proves content integrity
    // across both eras plus the point-lookup and range shapes.
    QueryDef(
      "q249_retune_properties",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_rt2")
        s.sql("""CREATE TABLE graft_cat.default.orders_rt2
                 (o_orderkey BIGINT, o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q249_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_rt2
                 SELECT o_orderkey, o_totalprice FROM q249_orders
                 WHERE o_orderkey % 2 = 0""")
        s.sql("""ALTER TABLE graft_cat.default.orders_rt2
                 SET TBLPROPERTIES ('graft.bloom_by' = 'o_orderkey',
                                    'graft.sort_by' = 'o_orderkey')""")
        s.sql("""INSERT INTO graft_cat.default.orders_rt2
                 SELECT o_orderkey, o_totalprice FROM q249_orders
                 WHERE o_orderkey % 2 = 1""")
        s.sql("""
          SELECT 'point' AS shape, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_rt2 WHERE o_orderkey IN (41, 42)
          UNION ALL
          SELECT 'range', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_rt2
          WHERE o_orderkey BETWEEN 100 AND 999
          UNION ALL
          SELECT 'all', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
          FROM graft_cat.default.orders_rt2
          ORDER BY shape""")
      },
      Some("""
        SELECT 'point' AS shape, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey IN (41, 42)
        UNION ALL
        SELECT 'range', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders WHERE o_orderkey BETWEEN 100 AND 999
        UNION ALL
        SELECT 'all', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        ORDER BY shape""")),

    // -------------------------------------------------------------- q250:
    // HIDDEN (TRANSFORM) PARTITIONING — `PARTITIONED BY (days(ts))`,
    // Iceberg's signature time-partitioning ([[GraftPartField]]).
    // Identity-partitioning a timestamp would split one file per
    // MICROSECOND; days() splits one file per day per write (the write
    // distribution clusters on the catalog-resolved days() transform),
    // each file's ts min/max pin to a one-day span, and the user's
    // predicates stay on `ts` — a day-range WHERE prunes to exactly
    // the covered days with NO query rewrite, and day-aligned ranges
    // become fully-decidable (exact partition pushdown, file-level
    // dynamic overwrite). The query runs the production loop: ingest a
    // month, dynamically overwrite ONE day with corrected values (only
    // that day's file is replaced — TransformPartitionSpec pins the
    // layout), then read per-day aggregates across the repair seam.
    QueryDef(
      "q250_hidden_partitioning",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.events_hp")
        s.sql("""CREATE TABLE graft_cat.default.events_hp
                 (event_id BIGINT, ts TIMESTAMP, event_type STRING,
                  value DOUBLE)
                 PARTITIONED BY (days(ts))""")
        Tables(s, d, "events").createOrReplaceTempView("q250_events")
        s.sql("""INSERT INTO graft_cat.default.events_hp
                 SELECT event_id, ts, event_type, value FROM q250_events""")
        // repair day 10: dynamic overwrite replaces exactly that day's
        // file with value-corrected rows; every other day is untouched
        val prev = try Some(s.conf.get(
          "spark.sql.sources.partitionOverwriteMode"))
          catch { case _: Exception => None }
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try s.sql("""INSERT OVERWRITE graft_cat.default.events_hp
                 SELECT event_id, ts, event_type, value * 2 FROM q250_events
                 WHERE CAST(ts AS DATE) = DATE'2024-01-10'""")
        finally prev.fold(s.conf.unset(
          "spark.sql.sources.partitionOverwriteMode"))(
          s.conf.set("spark.sql.sources.partitionOverwriteMode", _))
        s.sql("""
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS value_sum
          FROM graft_cat.default.events_hp
          WHERE ts >= TIMESTAMP'2024-01-08 00:00:00'
            AND ts < TIMESTAMP'2024-01-13 00:00:00'
          GROUP BY 1 ORDER BY day""")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) = DATE'2024-01-10'
                                  THEN value * 2 ELSE value END
                             AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE ts >= TIMESTAMP'2024-01-08 00:00:00'
          AND ts < TIMESTAMP'2024-01-13 00:00:00'
        GROUP BY 1 ORDER BY day""")),

    // -------------------------------------------------------------- q251:
    // MATERIALIZED-VIEW AUTO-REWRITE ([[graft.plans.MvRewrite]]) — the
    // query half of the q229 incremental-MV machinery: a registered,
    // FRESH MV transparently serves matching aggregates over its base
    // (the optimizer redirects the scan — MvRewriteSpec pins the plan),
    // and ANY base commit staleness-kills the rewrite until the next
    // refresh stamps the new base version. The three phases run the
    // same user query — served (fresh MV), direct (stale after an
    // append), re-served (after re-refresh) — and the oracle recomputes
    // each phase's truth from the raw data: right answers from BOTH
    // plans, which is the whole MV contract. At 100 TB the served
    // phases read a few thousand pre-aggregated rows instead of the
    // corpus.
    QueryDef(
      "q251_mv_auto_rewrite",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_mvb")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_mvv")
        s.sql("""CREATE TABLE graft_cat.default.orders_mvb
                 (o_orderpriority STRING, o_orderkey BIGINT)""")
        Tables(s, d, "orders").createOrReplaceTempView("q251_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_mvb
                 SELECT o_orderpriority, o_orderkey FROM q251_orders
                 WHERE o_orderkey % 3 != 0""")
        s.sql("""CREATE TABLE graft_cat.default.orders_mvv
                 (o_orderpriority STRING, key_sum BIGINT, n BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_mvb',
                   'graft.mv.group' = 'o_orderpriority',
                   'graft.mv.agg' = 'sum:o_orderkey:key_sum,count:*:n')""")
        def refresh(): Unit = {
          s.sql("""INSERT OVERWRITE graft_cat.default.orders_mvv
                   SELECT o_orderpriority, SUM(o_orderkey), COUNT(*)
                   FROM graft_cat.default.orders_mvb GROUP BY 1""")
          val v = s.sql(
            "SHOW TBLPROPERTIES graft_cat.default.orders_mvb").collect()
            .collectFirst {
              case r if r.getString(0) == "graft.current_version" =>
                r.getString(1)
            }.get
          s.sql(s"""ALTER TABLE graft_cat.default.orders_mvv
                    SET TBLPROPERTIES ('graft.mv.base_version' = '$v')""")
        }
        refresh()
        s.sql("""ALTER TABLE graft_cat.default.orders_mvb
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_mvv')""")
        val phase1 = s.sql(
          """SELECT 'served' AS phase, o_orderpriority,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n
             FROM graft_cat.default.orders_mvb GROUP BY 2""")
        val p1 = phase1.collect() // materialize BEFORE the append
        s.sql("""INSERT INTO graft_cat.default.orders_mvb
                 SELECT o_orderpriority, o_orderkey FROM q251_orders
                 WHERE o_orderkey % 3 = 0""")
        val p2 = s.sql(
          """SELECT 'stale_direct' AS phase, o_orderpriority,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n
             FROM graft_cat.default.orders_mvb GROUP BY 2""").collect()
        refresh()
        val p3 = s.sql(
          """SELECT 'reserved' AS phase, o_orderpriority,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n
             FROM graft_cat.default.orders_mvb GROUP BY 2""").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3).toSeq.asJava, phase1.schema)
          .orderBy("phase", "o_orderpriority")
      },
      Some("""
        SELECT 'served' AS phase, o_orderpriority,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum, COUNT(*) AS n
        FROM orders WHERE o_orderkey % 3 != 0 GROUP BY 2
        UNION ALL
        SELECT 'stale_direct', o_orderpriority,
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*)
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'reserved', o_orderpriority,
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*)
        FROM orders GROUP BY 2
        ORDER BY phase, o_orderpriority""")),

    // -------------------------------------------------------------- q252:
    // BRANCH -> REPAIR -> FAST-FORWARD (CALL system.create_branch /
    // fast_forward) — Iceberg's branch workflow over the zero-copy
    // clone substrate. A multi-statement repair (delete bad rows,
    // backfill corrected ones) runs on the branch while main keeps
    // serving the pre-branch content; the audited branch then lands on
    // main as ONE atomic O(files) metadata commit (BranchSpec pins the
    // hard-link zero-copy layout, the divergence refusal, and the
    // single-commit publish). The two phases read main BEFORE and
    // AFTER the publish; the oracle recomputes both truths from the
    // raw data.
    QueryDef(
      "q252_branch_fast_forward",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS " +
          "graft_cat.default.orders_br_branch_repair")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_br")
        s.sql("""CREATE TABLE graft_cat.default.orders_br
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q252_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_br
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q252_orders""")
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.orders_br', 'repair')")
        // the repair, on the branch: drop 1-URGENT rows with key % 7 = 0
        // and backfill them price-corrected (+1000)
        s.sql("""DELETE FROM graft_cat.default.orders_br_branch_repair
                 WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0""")
        s.sql("""INSERT INTO graft_cat.default.orders_br_branch_repair
                 SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0
                 FROM q252_orders
                 WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0""")
        val pre = s.sql(
          """SELECT 'before_publish' AS phase, COUNT(*) AS n,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      AS DOUBLE) AS price_sum
             FROM graft_cat.default.orders_br
             WHERE o_orderpriority = '1-URGENT'""")
        val p1 = pre.collect() // main BEFORE the publish
        s.sql("CALL graft_cat.system.fast_forward(" +
          "'default.orders_br', 'repair')")
        val p2 = s.sql(
          """SELECT 'after_publish' AS phase, COUNT(*) AS n,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      AS DOUBLE) AS price_sum
             FROM graft_cat.default.orders_br
             WHERE o_orderpriority = '1-URGENT'""").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2).toSeq.asJava, pre.schema)
          .orderBy("phase")
      },
      Some("""
        SELECT 'after_publish' AS phase, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                                  THEN o_totalprice + 1000.0
                                  ELSE o_totalprice END
                             AS DECIMAL(18,4))) AS DOUBLE) AS price_sum
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'before_publish', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY phase""")),

    // -------------------------------------------------------------- q254:
    // PERSISTENT SQL VIEWS (DSv2 ViewCatalog + the CALL DDL surface +
    // the injected read resolution — Spark doesn't route view SQL to
    // DSv2 catalogs, see [[graft.plans.ResolveGraftViews]]). A view is
    // pure metadata re-analyzed per query: after more rows land in the
    // base table, the SAME view text serves the new truth — phase 1
    // reads the view over the seed, phase 2 re-reads it after an
    // append, phase 3 reads a REPLACEd definition. The oracle
    // recomputes all three from the raw data. ViewCatalogSpec pins the
    // API (alter/rename/list), persistence across catalog reloads,
    // name-collision rules, and views-over-views.
    QueryDef(
      "q254_sql_views",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("CALL graft_cat.system.drop_view('default.pri_stats')")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_vw")
        s.sql("""CREATE TABLE graft_cat.default.orders_vw
                 (o_orderkey BIGINT, o_orderpriority STRING)""")
        Tables(s, d, "orders").createOrReplaceTempView("q254_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_vw
                 SELECT o_orderkey, o_orderpriority FROM q254_orders
                 WHERE o_orderkey % 2 = 0""")
        s.sql("""CALL graft_cat.system.create_view('default.pri_stats',
          'SELECT o_orderpriority, COUNT(*) AS n,
                  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
           FROM graft_cat.default.orders_vw GROUP BY o_orderpriority')""")
        val q = "SELECT o_orderpriority, n, key_sum " +
          "FROM graft_cat.default.pri_stats"
        val shape = s.sql(q)
        val p1 = s.sql(q).withColumn("phase", lit("seed")).collect()
        s.sql("""INSERT INTO graft_cat.default.orders_vw
                 SELECT o_orderkey, o_orderpriority FROM q254_orders
                 WHERE o_orderkey % 2 = 1""")
        val p2 = s.sql(q).withColumn("phase", lit("appended")).collect()
        s.sql("""CALL graft_cat.system.create_view('default.pri_stats',
          'SELECT o_orderpriority, COUNT(*) AS n,
                  CAST(MAX(o_orderkey) AS BIGINT) AS key_sum
           FROM graft_cat.default.orders_vw GROUP BY o_orderpriority',
          'true')""")
        val p3 = s.sql(q).withColumn("phase", lit("replaced")).collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3).toSeq.asJava,
          shape.withColumn("phase", lit("x")).schema)
          .select("phase", "o_orderpriority", "n", "key_sum")
          .orderBy("phase", "o_orderpriority")
      },
      Some("""
        SELECT 'seed' AS phase, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 2
        UNION ALL
        SELECT 'appended', o_orderpriority, COUNT(*),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'replaced', o_orderpriority, COUNT(*),
               CAST(MAX(o_orderkey) AS BIGINT)
        FROM orders GROUP BY 2
        ORDER BY phase, o_orderpriority""")),

    // -------------------------------------------------------------- q255:
    // ALTER COLUMN FIRST/AFTER — metadata-only column REORDER
    // (GraftTable.alterMoveColumn): pre-move files bind by stable field
    // id, post-move INSERTs write the new order, the MOR fold and time
    // travel stay exact (NestedEvolutionSpec pins CoW + MOR + travel).
    // Reordering a 100-TB table's columns for reader ergonomics costs
    // one commit, zero rewrites — the q213/q219 evolution family's
    // last missing verb. The query ingests half the rows, moves a
    // column, ingests the rest through the NEW order, and reads a
    // canonical projection the oracle recomputes from raw data.
    QueryDef(
      "q255_column_reorder",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_mv_pos")
        s.sql("""CREATE TABLE graft_cat.default.orders_mv_pos
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q255_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_mv_pos
                 SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q255_orders WHERE o_orderkey % 2 = 0""")
        s.sql("""ALTER TABLE graft_cat.default.orders_mv_pos
                 ALTER COLUMN o_totalprice FIRST""")
        // the post-move INSERT writes through the REORDERED schema
        s.sql("""INSERT INTO graft_cat.default.orders_mv_pos
                 SELECT o_totalprice, o_orderkey, o_orderpriority
                 FROM q255_orders WHERE o_orderkey % 2 = 1""")
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                   AS DOUBLE) AS price_sum
          FROM graft_cat.default.orders_mv_pos
          GROUP BY 1 ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS price_sum
        FROM orders GROUP BY 1 ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q256:
    // PARTITION-SPEC EVOLUTION — Iceberg's ADD/REPLACE PARTITION FIELD
    // through the retuning surface: a table that STARTED unpartitioned
    // is re-specced to days(ts) mid-ingest; new writes split per day,
    // old files stay byte-identical and keep serving, system.compact
    // re-splits the whole table under the new spec in one distributed
    // pass, and a day-scoped dynamic overwrite then repairs exactly
    // one day. Spec-sensitive ops on the MIXED layout are loud, never
    // lossy (PartitionEvolutionSpec pins the refusal + file counts).
    // At 100 TB this is how a table wrongly created unpartitioned is
    // fixed without downtime: retune, keep ingesting, compact when
    // convenient. The oracle recomputes the post-repair truth raw.
    QueryDef(
      "q256_partition_evolution",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.events_pe")
        s.sql("""CREATE TABLE graft_cat.default.events_pe
                 (event_id BIGINT, ts TIMESTAMP, value DOUBLE)""")
        Tables(s, d, "events").createOrReplaceTempView("q256_events")
        s.sql("""INSERT INTO graft_cat.default.events_pe
                 SELECT event_id, ts, value FROM q256_events
                 WHERE event_id % 2 = 0""")
        s.sql("""ALTER TABLE graft_cat.default.events_pe
                 SET TBLPROPERTIES ('graft.partitioned_by' = 'days(ts)')""")
        s.sql("""INSERT INTO graft_cat.default.events_pe
                 SELECT event_id, ts, value FROM q256_events
                 WHERE event_id % 2 = 1""")
        s.sql("CALL graft_cat.system.compact('default.events_pe')")
        val prev = try Some(s.conf.get(
          "spark.sql.sources.partitionOverwriteMode"))
          catch { case _: Exception => None }
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try s.sql("""INSERT OVERWRITE graft_cat.default.events_pe
                 SELECT event_id, ts, value * 10 FROM q256_events
                 WHERE CAST(ts AS DATE) = DATE'2024-01-20'""")
        finally prev.fold(s.conf.unset(
          "spark.sql.sources.partitionOverwriteMode"))(
          s.conf.set("spark.sql.sources.partitionOverwriteMode", _))
        s.sql("""
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS value_sum
          FROM graft_cat.default.events_pe
          WHERE ts >= TIMESTAMP'2024-01-18 00:00:00'
            AND ts < TIMESTAMP'2024-01-23 00:00:00'
          GROUP BY 1 ORDER BY day""")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) = DATE'2024-01-20'
                                  THEN value * 10 ELSE value END
                             AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE ts >= TIMESTAMP'2024-01-18 00:00:00'
          AND ts < TIMESTAMP'2024-01-23 00:00:00'
        GROUP BY 1 ORDER BY day"""))
  ) ++ q258Defs ++ q262Defs

  // ---------------------------------------------------------------- q262:
  // VERSION-BOUNDED INCREMENTAL CHANGE READ (Iceberg incremental read /
  // Delta table_changes) — the polling-consumer half of the CDC surface
  // q206/q210 stream: `spark.read.option("from_version", a)
  // .option("to_version", b).table("t$changes")` returns exactly the
  // change ops committed in (a, b], sliced from the ledger's commit-
  // version stamps with NO streaming checkpoint. The query proves the
  // contract three ways: (1) the op census of a single version's slice,
  // (2) a mirror reconstructed from `VERSION AS OF 0` + two consecutive
  // bounded slices equals (3) the direct `VERSION AS OF 2` read — the
  // bounded feed IS the difference between snapshots. Soundness edges
  // (future to_version, from > to, retention-trimmed ranges, bounded
  // streaming) reject loudly — ChangeBoundsSpec. At 100 TB a bounded
  // read costs O(delta files in range), selected from commit metadata;
  // the consumer never rescans the table and never stores a checkpoint.
  private lazy val q262Defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q262_incremental_changes",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_inc")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .createOrReplaceTempView("q262_seed")
        s.sql("""CREATE TABLE graft_cat.default.orders_inc
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')
                 AS SELECT * FROM q262_seed""")           // version 0
        s.sql("""UPDATE graft_cat.default.orders_inc
                 SET o_totalprice = o_totalprice + 10.0
                 WHERE o_orderkey % 5 = 0""")             // version 1
        s.sql("""DELETE FROM graft_cat.default.orders_inc
                 WHERE o_orderkey % 7 = 0""")             // version 2
        s.sql("""UPDATE graft_cat.default.orders_inc
                 SET o_totalprice = o_totalprice + 100.0
                 WHERE o_orderkey % 11 = 0""")            // version 3
        def bounded(from: Int, to: Option[Int]) = {
          val r = s.read.option("from_version", from.toString)
          to.fold(r)(t => r.option("to_version", t.toString))
            .table("graft_cat.default.`orders_inc$changes`")
        }
        bounded(0, Some(1)).createOrReplaceTempView("q262_c1")
        bounded(1, Some(2)).createOrReplaceTempView("q262_c2")
        bounded(2, None).createOrReplaceTempView("q262_tail")
        s.sql("""
          WITH s0 AS (SELECT o_orderkey, o_totalprice
                      FROM graft_cat.default.orders_inc VERSION AS OF 0),
          s1 AS (    -- apply (0,1]: the v1 updates, keyed by row id
            SELECT v.o_orderkey,
                   CASE WHEN c.`__id` IS NOT NULL THEN c.o_totalprice
                        ELSE v.o_totalprice END AS o_totalprice
            FROM s0 v LEFT JOIN q262_c1 c
              ON v.o_orderkey = c.`__id` AND c.`__op` = 1),
          s2 AS (    -- apply (1,2]: the v2 deletes
            SELECT * FROM s1 v
            WHERE NOT EXISTS (SELECT 1 FROM q262_c2 c
                              WHERE c.`__id` = v.o_orderkey
                                AND c.`__op` = 2))
          SELECT 'v2_ops' AS phase, COUNT(*) AS n,
                 CAST(SUM(`__id`) AS DOUBLE) AS agg
          FROM q262_c2 WHERE `__op` = 2
          UNION ALL
          SELECT 'mid_state', COUNT(*),
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          FROM s2
          UNION ALL
          SELECT 'mid_direct', COUNT(*),
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          FROM (SELECT o_totalprice
                FROM graft_cat.default.orders_inc VERSION AS OF 2)
          UNION ALL
          SELECT 'tail_ops', COUNT(*), CAST(SUM(`__id`) AS DOUBLE)
          FROM q262_tail WHERE `__op` = 1
          ORDER BY phase""")
      },
      Some("""
        WITH mid AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 7 <> 0)
        SELECT 'v2_ops' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS DOUBLE) AS agg
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 'mid_state', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM mid
        UNION ALL
        SELECT 'mid_direct', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM mid
        UNION ALL
        SELECT 'tail_ops', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM mid WHERE o_orderkey % 11 = 0
        ORDER BY phase""")),

    // -------------------------------------------------------------- q263:
    // MERGE ... WHEN NOT MATCHED BY SOURCE — the full-sync clause family
    // (Spark 3.4+ / Delta / Iceberg parity): the source is the TRUTH and
    // the target must converge to it in ONE statement. Two variants over
    // the same seed drift: copy-on-write target DELETEs rows the source
    // no longer has (hard sync — target becomes exactly the source), and
    // a merge-on-read target soft-deletes them with an UPDATE flag (the
    // auditable variant; delta-sized tombstone-free retirement). Both
    // row-level paths compile the BY SOURCE clause group through the
    // same DSv2 rewrite as the matched clauses — at 100 TB the CoW
    // variant rewrites only files containing affected rows, the MOR
    // variant writes only delta files sized to the drift.
    QueryDef(
      "q263_merge_by_source",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .createOrReplaceTempView("q263_orders")
        // target drift: missing every %3=0 row, stale price on %5=0
        s.sql("""SELECT o_orderkey,
                        CASE WHEN o_orderkey % 5 = 0
                             THEN o_totalprice + 7.0
                             ELSE o_totalprice END AS o_totalprice,
                        'y' AS alive
                 FROM q263_orders WHERE o_orderkey % 3 <> 0""")
          .createOrReplaceTempView("q263_target_seed")
        // the source of truth: the even keys at their real price
        s.sql("""SELECT o_orderkey, o_totalprice, 'y' AS alive
                 FROM q263_orders WHERE o_orderkey % 2 = 0""")
          .createOrReplaceTempView("q263_source")
        def sync(table: String, props: String, bySource: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$table")
          s.sql(s"""CREATE TABLE graft_cat.default.$table $props
                    AS SELECT * FROM q263_target_seed""")
          s.sql(s"""
            MERGE INTO graft_cat.default.$table t
            USING q263_source c ON t.o_orderkey = c.o_orderkey
            WHEN MATCHED THEN
              UPDATE SET o_totalprice = c.o_totalprice, alive = 'y'
            WHEN NOT MATCHED THEN
              INSERT (o_orderkey, o_totalprice, alive)
              VALUES (c.o_orderkey, c.o_totalprice, 'y')
            WHEN NOT MATCHED BY SOURCE THEN $bySource""")
        }
        sync("orders_sync_cow", "", "DELETE")
        sync("orders_sync_mor",
          """TBLPROPERTIES ('graft.mode'='mor',
                            'graft.row_id'='o_orderkey')""",
          "UPDATE SET alive = 'dead'")
        s.sql("""
          SELECT 'cow' AS variant, alive, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS price_sum,
                 SUM(o_orderkey) AS key_sum
          FROM graft_cat.default.orders_sync_cow GROUP BY alive
          UNION ALL
          SELECT 'mor', alive, COUNT(*),
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
                 SUM(o_orderkey)
          FROM graft_cat.default.orders_sync_mor GROUP BY alive
          ORDER BY variant, alive""")
      },
      Some("""
        WITH src AS (SELECT o_orderkey, o_totalprice FROM orders
                     WHERE o_orderkey % 2 = 0),
        dead AS (SELECT o_orderkey,
                        CASE WHEN o_orderkey % 5 = 0
                             THEN o_totalprice + 7.0
                             ELSE o_totalprice END AS o_totalprice
                 FROM orders
                 WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0)
        SELECT 'cow' AS variant, 'y' AS alive, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS price_sum,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM src
        UNION ALL
        SELECT 'mor', 'dead', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM dead
        UNION ALL
        SELECT 'mor', 'y', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM src
        ORDER BY variant, alive""")),

    // -------------------------------------------------------------- q264:
    // DELETION VECTORS (Iceberg v3 DVs / Delta deletion vectors) — the
    // position-delete table mode for data with NO natural row id:
    // `graft.mode = 'dv'` keys row-level DML by PHYSICAL POSITION
    // (`_file`, `_pos` metadata columns drive a delta write), so DELETE
    // writes O(matched) vector entries and rewrites nothing, UPDATE is
    // delete + re-insert, and MERGE runs every clause group — all on a
    // table the MOR mode would reject (no unique id column). The query
    // runs the full lifecycle — CTAS seed, positional DELETE on a
    // stats-undecidable predicate, conditional UPDATE, a MERGE whose
    // NOT MATCHED arm re-inserts previously deleted keys — then
    // aggregates the LIVE state, compacts (vectors fold away, base is
    // rewritten, the full-pushdown scan path returns), and aggregates
    // again: the two phases must be identical, and the pre-DML seed is
    // one `VERSION AS OF 0` away. DeletionVectorSpec pins the storage
    // facts (byte-identical base files under DELETE, vector-sized
    // deltas, conflict on rewritten references). At 100 TB this is the
    // only affordable DELETE on an id-less corpus: vector-sized writes,
    // compaction-bounded read overhead.
    QueryDef(
      "q264_deletion_vectors",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_dv")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .createOrReplaceTempView("q264_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_dv
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT o_orderkey, o_totalprice, 'seed' AS note
                 FROM q264_orders""")                        // version 0
        s.sql("""DELETE FROM graft_cat.default.orders_dv
                 WHERE o_orderkey % 7 = 3""")                // version 1
        s.sql("""UPDATE graft_cat.default.orders_dv
                 SET o_totalprice = o_totalprice + 25.0, note = 'upd'
                 WHERE o_orderkey % 5 = 2""")                // version 2
        s.sql("""
          MERGE INTO graft_cat.default.orders_dv t
          USING (SELECT o_orderkey AS k, o_totalprice AS p
                 FROM q264_orders WHERE o_orderkey % 9 = 4) s
          ON t.o_orderkey = s.k
          WHEN MATCHED THEN
            UPDATE SET o_totalprice = s.p + 1000.0, note = 'merged'
          WHEN NOT MATCHED THEN
            INSERT (o_orderkey, o_totalprice, note)
            VALUES (s.k, s.p, 'rein')""")                    // version 3
        def agg(phase: String) = s.sql(s"""
          SELECT '$phase' AS phase, note, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS price_sum,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_dv GROUP BY note""")
        // materialize the LIVE phase BEFORE compaction — this row set
        // is produced by the vector-applying scan, not the rewritten
        // base (a lazy plan would silently re-read post-compact state)
        val live = s.createDataFrame(
          java.util.Arrays.asList(agg("live").collect(): _*),
          agg("live").schema)
        s.sql("CALL graft_cat.system.compact('default.orders_dv')")
        val compacted = agg("z_compacted")
        val v0 = s.sql("""
          SELECT 'v0' AS phase, 'seed' AS note, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS price_sum,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM graft_cat.default.orders_dv VERSION AS OF 0""")
        live.unionAll(compacted).unionAll(v0).orderBy("phase", "note")
      },
      Some("""
        WITH fin AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 3 AND o_orderkey % 9 = 4
                        THEN 'rein'
                      WHEN o_orderkey % 9 = 4 THEN 'merged'
                      WHEN o_orderkey % 5 = 2 THEN 'upd'
                      ELSE 'seed' END AS note,
                 CASE WHEN o_orderkey % 7 = 3 AND o_orderkey % 9 = 4
                        THEN o_totalprice
                      WHEN o_orderkey % 9 = 4 THEN o_totalprice + 1000.0
                      WHEN o_orderkey % 5 = 2 THEN o_totalprice + 25.0
                      ELSE o_totalprice END AS price
          FROM orders
          WHERE o_orderkey % 7 <> 3 OR o_orderkey % 9 = 4),
        ag AS (
          SELECT note, COUNT(*) AS n,
                 CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
                   AS price_sum,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM fin GROUP BY note)
        SELECT 'live' AS phase, note, n, price_sum, key_sum FROM ag
        UNION ALL
        SELECT 'z_compacted', note, n, price_sum, key_sum FROM ag
        UNION ALL
        SELECT 'v0', 'seed', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        ORDER BY phase, note""")),

    // -------------------------------------------------------------- q265:
    // ANALYZE TABLE (Iceberg's compute_table_stats / classic RDBMS
    // ANALYZE): `CALL system.analyze(t, columns)` computes TABLE-LEVEL
    // column distinct counts in one distributed pass and persists them
    // as version-stamped graft.stats.* properties; the scan's CBO
    // column statistics then serve the TRUE cardinalities instead of
    // the summed per-file upper bound (which overcounts every value
    // appearing in more than one file), until the next commit
    // invalidates the stamp — AnalyzeSpec pins the serve, the
    // staleness fallback, the approx mode's error bound, and cold-
    // reload persistence. The ORACLE is the procedure's own output:
    // exact NDVs recomputed by DuckDB. At 100 TB this is the scheduled
    // stats job that turns multi-join plans from bound-guessing into
    // measured-cardinality reordering.
    QueryDef(
      "q265_analyze_stats",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_an")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderpriority")
          .createOrReplaceTempView("q265_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_an
                 AS SELECT * FROM q265_orders""")
        s.sql("""CALL graft_cat.system.analyze('default.orders_an',
                 'o_custkey,o_orderpriority')""")
          .orderBy("column")
      },
      Some("""
        SELECT 'o_custkey' AS "column",
               COUNT(DISTINCT o_custkey) AS ndv,
               CAST(0 AS BIGINT) AS analyzed_version
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority),
               CAST(0 AS BIGINT)
        FROM orders
        ORDER BY "column"""")),

    // -------------------------------------------------------------- q266:
    // GENERATED ALWAYS AS columns (Delta generated columns / SQL:2003
    // computed columns) on the managed catalog: definitions arrive on
    // Spark 4's v2 Column channel (the StructType fallback DROPS them —
    // every create path here re-captures from the Column objects),
    // validate at CREATE, persist in the schema metadata under Spark's
    // own key, and are RECOMPUTED by every write — an INSERT omitting
    // them computes, an UPDATE of a source column recomputes the
    // derived value through the row-level rewrite, and a user INSERT
    // supplying a WRONG explicit value rejects loudly
    // (GeneratedColumnSpec pins all paths plus file pruning on the
    // generated column's real stats). The query seeds from orders
    // omitting both derived columns, UPDATEs a price slice, and
    // aggregates BY the generated year with a sum OF the generated
    // cents — everything the oracle recomputes from first principles.
    // At 100 TB generated columns are how a time-derived or
    // unit-normalized column stays consistent without trusting every
    // writer to recompute it.
    QueryDef(
      "q266_generated_columns",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_gen")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderdate")
          .createOrReplaceTempView("q266_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_gen
                 (o_orderkey BIGINT, o_totalprice DOUBLE,
                  o_orderdate TIMESTAMP,
                  o_year INT GENERATED ALWAYS AS
                    (CAST(year(o_orderdate) AS INT)),
                  cents BIGINT GENERATED ALWAYS AS
                    (CAST(round(o_totalprice * 100) AS BIGINT)))""")
        s.sql("""INSERT INTO graft_cat.default.orders_gen
                 (o_orderkey, o_totalprice, o_orderdate)
                 SELECT * FROM q266_orders""")
        s.sql("""UPDATE graft_cat.default.orders_gen
                 SET o_totalprice = o_totalprice + 10.0
                 WHERE o_orderkey % 4 = 1""")
        s.sql("""SELECT o_year, COUNT(*) AS n, SUM(cents) AS cents_sum,
                        SUM(o_orderkey) AS key_sum
                 FROM graft_cat.default.orders_gen
                 GROUP BY o_year ORDER BY o_year""")
      },
      Some("""
        WITH g AS (
          SELECT o_orderkey,
                 CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 CAST(round((CASE WHEN o_orderkey % 4 = 1
                                  THEN o_totalprice + 10.0
                                  ELSE o_totalprice END) * 100)
                   AS BIGINT) AS cents
          FROM orders)
        SELECT o_year, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents_sum,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM g GROUP BY o_year ORDER BY o_year""")),

    // -------------------------------------------------------------- q267:
    // CORPUS CURATION ON A DELETION-VECTOR TABLE — the LLM-pipeline
    // case deletion vectors exist for: raw text dumps have no unique
    // row id to key a MOR delta log on (q211 required declaring one),
    // but positional tombstones need none. The corpus lands as
    // `graft.mode='dv'`, exact dedup (q40's bag-of-words fingerprint)
    // finds the losers, and a `DELETE ... WHERE doc_id IN (subquery)`
    // — the subquery-DELETE SQL surface, rewritten by Spark into the
    // positional delta write — tombstones them at O(losers) cost with
    // every base file byte-identical on disk; the pre-curation corpus
    // stays one `VERSION AS OF 0` away, and compaction later folds the
    // vectors into clean files. Same oracle family as q211 (MOR
    // MERGE-DELETE curation): four storage paths, one answer. At
    // 100 TB this curates an id-less crawl in place: tombstone writes
    // sized to the duplicates, zero base rewrite until maintenance.
    QueryDef(
      "q267_dv_curation",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_dv")
        Tables(s, d, "documents").createOrReplaceTempView("q267_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_dv
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT * FROM q267_docs""")
        s.sql("""
          DELETE FROM graft_cat.default.corpus_dv
          WHERE doc_id IN (
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                       AS rn
              FROM (SELECT doc_id,
                           md5(concat_ws('|', array_sort(array_distinct(
                             graft_tokens(text))))) AS fp
                    FROM graft_cat.default.corpus_dv))
            WHERE rn > 1)""")
        s.sql("""
          SELECT 'curated' AS phase, lang, source, COUNT(*) AS n_docs,
                 SUM(n_chars) AS sum_chars
          FROM graft_cat.default.corpus_dv
          GROUP BY lang, source
          UNION ALL
          SELECT 'z_raw_v0', lang, source, COUNT(*), SUM(n_chars)
          FROM graft_cat.default.corpus_dv VERSION AS OF 0
          GROUP BY lang, source
          ORDER BY phase, lang, source""")
      },
      Some(s"""
        WITH f AS (SELECT doc_id,
                          md5(array_to_string(list_sort(list_distinct(
                            ${graft.text.TextAnalysis.duckTokens})), '|')) fp
                   FROM documents),
        keep AS (SELECT MIN(doc_id) AS k FROM f GROUP BY fp),
        c AS (SELECT d.* FROM documents d JOIN keep ON d.doc_id = keep.k)
        SELECT 'curated' AS phase, lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM c GROUP BY lang, source
        UNION ALL
        SELECT 'z_raw_v0', lang, source, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT)
        FROM documents GROUP BY lang, source
        ORDER BY phase, lang, source""")),

    // -------------------------------------------------------------- q268:
    // CHANGE FEED ON A DELETION-VECTOR TABLE (VERDICT r14 item 1) —
    // the q267 curation finally has a tail: an ID-LESS corpus curated
    // in place now DRIVES a downstream incremental pipeline (the
    // produce→predict shape lifted to corpus scale). `corpus_cdc` is a
    // DV table; a positional DELETE (curation) and an UPDATE
    // (lang re-tag, honest delete+insert pair) land as vectors; a
    // STREAMING read of `corpus_cdc$changes` — positional deletes
    // resolved to full delete-rows against the base files at read
    // time, each op stamped with its commit version — is MERGE-applied
    // per micro-batch into a derived "tokenized" mirror, collapsing
    // each key to its highest-version op (insert beats its paired
    // delete within one version) and RECOMPUTING the derived token
    // estimate on every upsert. The mirror's final census is the
    // oracle. At 100 TB the downstream never rescans the corpus: the
    // feed read costs O(touched row groups) per change commit and the
    // id-keyed MERGE is group-pruned to the mirror files the batch's
    // keys hit.
    QueryDef(
      "q268_dv_change_apply",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_cdc")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_tok")
        Tables(s, d, "documents").createOrReplaceTempView("q268_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_cdc
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT doc_id, lang, source, n_chars
                 FROM q268_docs""")                        // version 0
        // downstream mirror seeds from the snapshot the feed starts
        // after; tok is the DERIVED column the pipeline maintains
        s.sql("""CREATE TABLE graft_cat.default.corpus_tok
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='doc_id')
                 AS SELECT doc_id, lang, n_chars,
                           CAST(n_chars DIV 4 AS BIGINT) AS tok
                 FROM graft_cat.default.corpus_cdc VERSION AS OF 0""")
        // curation DELETE: stats-undecidable -> positional vectors
        s.sql("""DELETE FROM graft_cat.default.corpus_cdc
                 WHERE n_chars % 7 = 3""")
        // re-tag UPDATE: surfaces as delete+insert sharing one __ver
        s.sql("""UPDATE graft_cat.default.corpus_cdc
                 SET lang = 'und' WHERE n_chars % 11 = 5""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q268-ckpt-").toString
        val q = s.readStream
          .table("graft_cat.default.`corpus_cdc$changes`")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.createOrReplaceTempView("q268_batch")
              batch.sparkSession.sql("""
                MERGE INTO graft_cat.default.corpus_tok t
                USING (
                  SELECT doc_id, lang, n_chars, `__op` FROM (
                    SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY `__ver` DESC,
                               CASE WHEN `__op` = 0 THEN 0 ELSE 1 END)
                      AS rn
                    FROM q268_batch) WHERE rn = 1) c
                ON t.doc_id = c.doc_id
                WHEN MATCHED AND c.`__op` = 2 THEN DELETE
                WHEN MATCHED THEN UPDATE SET
                  lang = c.lang, n_chars = c.n_chars,
                  tok = CAST(c.n_chars DIV 4 AS BIGINT)
                WHEN NOT MATCHED AND c.`__op` = 0 THEN
                  INSERT (doc_id, lang, n_chars, tok)
                  VALUES (c.doc_id, c.lang, c.n_chars,
                          CAST(c.n_chars DIV 4 AS BIGINT))"""): Unit
          }
          .start()
        q.awaitTermination()
        s.sql("""SELECT lang, COUNT(*) AS n_docs,
                        SUM(n_chars) AS sum_chars, SUM(tok) AS sum_tok
                 FROM graft_cat.default.corpus_tok
                 GROUP BY lang ORDER BY lang""")
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 CASE WHEN n_chars % 11 = 5 THEN 'und' ELSE lang END
                   AS lang,
                 n_chars
          FROM documents WHERE n_chars % 7 <> 3)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_chars // 4) AS BIGINT) AS sum_tok
        FROM m GROUP BY lang ORDER BY lang""")),

    // -------------------------------------------------------------- q269:
    // MULTI-DIM STAR MV WITH A COMPOUND KEY (VERDICT r14 item 2) —
    // q260 generalized: the MV's definition is a fact ⨝ dim1 ⨝ dim2
    // aggregate where dim2 joins on a COMPOUND equi-key (priority AND
    // parity), recorded as 'graft.mv.join_dim' = 'd1,d2' /
    // 'graft.mv.join_on' = 'k=k;a=a&b=b' / per-dim versions. Phases:
    // the full (segment × class) join-agg serves from the MV; a
    // ROLL-UP to class alone re-aggregates the same MV (the snowflake-
    // dashboard composition with q258); a commit on ONE dim
    // staleness-kills it (truth unchanged — the inserted dim row is
    // unreferenced — but the plan must not trust a drifted
    // constituent); a refresh re-serves. MvRewriteSpec pins the
    // per-dim staleness kills and the compound-key refusal→acceptance
    // boundary. At 100 TB the two-dim dashboard family reads
    // |segments × classes| MV rows instead of re-joining three tables.
    QueryDef(
      "q269_mv_star2",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("orders_s2f", "cust_s2d", "prio_s2d", "orders_s2mv")
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "orders").createOrReplaceTempView("q269_orders")
        Tables(s, d, "customer").createOrReplaceTempView("q269_customer")
        s.sql("""CREATE TABLE graft_cat.default.orders_s2f
                 (o_custkey BIGINT, o_prio STRING, o_parity BIGINT,
                  o_orderkey BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.orders_s2f
                 SELECT o_custkey, o_orderpriority, o_orderkey % 2,
                        o_orderkey FROM q269_orders""")
        s.sql("""CREATE TABLE graft_cat.default.cust_s2d
                 (c_custkey BIGINT, c_mktsegment STRING)""")
        s.sql("""INSERT INTO graft_cat.default.cust_s2d
                 SELECT c_custkey, c_mktsegment FROM q269_customer""")
        s.sql("""CREATE TABLE graft_cat.default.prio_s2d
                 (p_prio STRING, p_parity BIGINT, p_class STRING)""")
        s.sql("""INSERT INTO graft_cat.default.prio_s2d
                 SELECT DISTINCT o_orderpriority, o_orderkey % 2,
                        concat(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                    THEN 'hot_' ELSE 'cold_' END,
                               o_orderkey % 2)
                 FROM q269_orders""")
        s.sql("""CREATE TABLE graft_cat.default.orders_s2mv
                 (c_mktsegment STRING, p_class STRING, key_sum BIGINT,
                  n BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_s2f',
                   'graft.mv.join_dim' =
                     'default/cust_s2d,default/prio_s2d',
                   'graft.mv.join_on' =
                     'o_custkey=c_custkey;o_prio=p_prio&o_parity=p_parity',
                   'graft.mv.group' = 'c_mktsegment,p_class',
                   'graft.mv.agg' = 'sum:o_orderkey:key_sum,count:*:n')""")
        def refresh(): Unit = {
          s.sql("""INSERT OVERWRITE graft_cat.default.orders_s2mv
                   SELECT c.c_mktsegment, p.p_class, SUM(f.o_orderkey),
                          COUNT(*)
                   FROM graft_cat.default.orders_s2f f
                   JOIN graft_cat.default.cust_s2d c
                     ON f.o_custkey = c.c_custkey
                   JOIN graft_cat.default.prio_s2d p
                     ON f.o_prio = p.p_prio AND f.o_parity = p.p_parity
                   GROUP BY 1, 2""")
          def ver(t: String): String = s.sql(
            s"SHOW TBLPROPERTIES graft_cat.default.$t").collect()
            .collectFirst {
              case r if r.getString(0) == "graft.current_version" =>
                r.getString(1)
            }.get
          s.sql(s"""ALTER TABLE graft_cat.default.orders_s2mv
                    SET TBLPROPERTIES (
                      'graft.mv.base_version' = '${ver("orders_s2f")}',
                      'graft.mv.dim_version' =
                        '${ver("cust_s2d")},${ver("prio_s2d")}')""")
        }
        refresh()
        s.sql("""ALTER TABLE graft_cat.default.orders_s2f
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_s2mv')""")
        def full(name: String) = s.sql(
          s"""SELECT '$name' AS phase, c.c_mktsegment, p.p_class,
                     SUM(f.o_orderkey) AS key_sum, COUNT(*) AS n
              FROM graft_cat.default.orders_s2f f
              JOIN graft_cat.default.cust_s2d c
                ON f.o_custkey = c.c_custkey
              JOIN graft_cat.default.prio_s2d p
                ON f.o_prio = p.p_prio AND f.o_parity = p.p_parity
              GROUP BY 2, 3""")
        def rollup(name: String) = s.sql(
          s"""SELECT '$name' AS phase, 'ALL' AS c_mktsegment, p.p_class,
                     SUM(f.o_orderkey) AS key_sum, COUNT(*) AS n
              FROM graft_cat.default.orders_s2f f
              JOIN graft_cat.default.cust_s2d c
                ON f.o_custkey = c.c_custkey
              JOIN graft_cat.default.prio_s2d p
                ON f.o_prio = p.p_prio AND f.o_parity = p.p_parity
              GROUP BY 3""")
        val shape = full("a_served")
        val p1 = shape.collect()
        val p2 = rollup("b_rollup").collect()
        // a dim commit (unreferenced row: truth unchanged) must
        // staleness-kill the MV; the direct plan re-derives the truth
        s.sql("""INSERT INTO graft_cat.default.prio_s2d
                 VALUES ('9-NONE', 7, 'junk')""")
        val p3 = full("c_stale_direct").collect()
        refresh()
        val p4 = full("d_reserved").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3 ++ p4).toSeq.asJava,
          shape.schema)
          .orderBy("phase", "c_mktsegment", "p_class")
      },
      Some("""
        WITH f AS (
          SELECT o_custkey, o_orderkey,
                 concat(CASE WHEN o_orderpriority IN
                               ('1-URGENT', '2-HIGH')
                             THEN 'hot_' ELSE 'cold_' END,
                        o_orderkey % 2) AS p_class
          FROM orders),
        j AS (
          SELECT c.c_mktsegment, f.p_class, f.o_orderkey
          FROM f JOIN customer c ON f.o_custkey = c.c_custkey),
        fullagg AS (
          SELECT c_mktsegment, p_class,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                 COUNT(*) AS n
          FROM j GROUP BY 1, 2),
        ru AS (
          SELECT 'ALL' AS c_mktsegment, p_class,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                 COUNT(*) AS n
          FROM j GROUP BY 2)
        SELECT 'a_served' AS phase, * FROM fullagg
        UNION ALL SELECT 'b_rollup', * FROM ru
        UNION ALL SELECT 'c_stale_direct', * FROM fullagg
        UNION ALL SELECT 'd_reserved', * FROM fullagg
        ORDER BY phase, c_mktsegment, p_class""")),

    // -------------------------------------------------------------- q270:
    // TIMESTAMP-BOUNDED INCREMENTAL CHANGE READ (VERDICT r14 item 6) —
    // q262's polling contract on the WALL-CLOCK axis: `spark.read
    // .option("from_timestamp", t1).option("to_timestamp", t2)
    // .table("t$changes")` resolves each instant through the snapshot
    // commit-time stamps (the same axis TIMESTAMP AS OF travels on) to
    // a version, then serves exactly the ops committed in between —
    // the consumer tracks a clock reading, not a version counter.
    // Instants are captured BETWEEN the DML statements, so the op
    // census is deterministic; refusal edges (pre-history instants on
    // trimmed tables, axis mixing, garbage spellings) are
    // ChangeBoundsSpec-pinned. At 100 TB the read is still O(ledger
    // entries in range): commit metadata maps time → version → slice,
    // no scan.
    QueryDef(
      "q270_timestamp_changes",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_tsc")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .createOrReplaceTempView("q270_seed")
        def tick(): Long = { Thread.sleep(3); System.currentTimeMillis() }
        s.sql("""CREATE TABLE graft_cat.default.orders_tsc
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')
                 AS SELECT * FROM q270_seed""")
        val t0 = tick()
        s.sql("""UPDATE graft_cat.default.orders_tsc
                 SET o_totalprice = o_totalprice + 10.0
                 WHERE o_orderkey % 5 = 0""")
        val t1 = tick()
        s.sql("""DELETE FROM graft_cat.default.orders_tsc
                 WHERE o_orderkey % 7 = 0""")
        val t2 = tick()
        s.sql("""UPDATE graft_cat.default.orders_tsc
                 SET o_totalprice = o_totalprice + 100.0
                 WHERE o_orderkey % 11 = 0""")
        def bounded(from: Long, to: Option[String]) = {
          val r = s.read.option("from_timestamp", from.toString)
          to.fold(r)(x => r.option("to_timestamp", x))
            .table("graft_cat.default.`orders_tsc$changes`")
        }
        bounded(t0, Some(t1.toString))
          .createOrReplaceTempView("q270_c1")
        bounded(t1, Some(t2.toString))
          .createOrReplaceTempView("q270_c2")
        // ISO-8601 spelling for the open tail
        bounded(t2, Some("2099-01-01T00:00:00Z"))
          .createOrReplaceTempView("q270_tail")
        s.sql("""
          SELECT 'c1_updates' AS phase, COUNT(*) AS n,
                 CAST(SUM(`__id`) AS DOUBLE) AS agg
          FROM q270_c1 WHERE `__op` = 1
          UNION ALL
          SELECT 'c2_deletes', COUNT(*), CAST(SUM(`__id`) AS DOUBLE)
          FROM q270_c2 WHERE `__op` = 2
          UNION ALL
          SELECT 'tail_updates', COUNT(*), CAST(SUM(`__id`) AS DOUBLE)
          FROM q270_tail WHERE `__op` = 1
          ORDER BY phase""")
      },
      Some("""
        SELECT 'c1_updates' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS DOUBLE) AS agg
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT 'c2_deletes', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 'tail_updates', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
        ORDER BY phase""")),

    // -------------------------------------------------------------- q271:
    // HISTOGRAM STATISTICS FOR CBO (VERDICT r14 item 5) — `CALL
    // system.analyze(t, cols, approx, buckets)` additionally builds
    // per-column EQUI-HEIGHT histograms ((lo, hi, ndv) bins, persisted
    // with the same version stamp) and serves them through DSv2
    // ColumnStatistics.histogram(), which Spark maps into catalyst
    // ColumnStat — so CBO's selectivity stops assuming uniformity over
    // the NDV. The fixture's filter column is 90%-hot: NDV-only stats
    // price `s = 1` at rows/NDV (~0.02% — three orders of magnitude
    // under), histograms price it at its true mass; AnalyzeSpec pins
    // the observable consequence (the mis-broadcast flips to a shuffle
    // join). This query runs the SAME skewed filter+join under both
    // statistics regimes — truth is identical, which is exactly the
    // point: stats change plans, never answers. At 100 TB the flipped
    // decision is the difference between broadcasting a "tiny" 10-TB
    // side and shuffling it.
    QueryDef(
      "q271_analyze_histogram",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_hf")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_hd")
        Tables(s, d, "orders").createOrReplaceTempView("q271_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_hf AS
                 SELECT o_orderkey AS k,
                        CASE WHEN o_orderkey % 10 < 9 THEN CAST(1 AS BIGINT)
                             ELSE o_orderkey END AS sk
                 FROM q271_orders""")
        s.sql("""CREATE TABLE graft_cat.default.orders_hd AS
                 SELECT o_orderkey AS k, o_custkey AS w
                 FROM q271_orders""")
        val probe =
          """SELECT f.k, d.w FROM graft_cat.default.orders_hf f
             JOIN graft_cat.default.orders_hd d ON f.k = d.k
             WHERE f.sk = 1"""
        def phase(name: String) = s.sql(
          s"""SELECT '$name' AS phase, COUNT(*) AS n,
                     SUM(k) AS key_sum, SUM(w) AS w_sum
              FROM ($probe)""")
        s.sql("CALL graft_cat.system.analyze('default.orders_hf', 'sk')")
        val shape = phase("a_ndv_only")
        val p1 = shape.collect()
        s.sql("""CALL graft_cat.system.analyze('default.orders_hf',
                 'sk', false, 10)""")
        val p2 = phase("b_histogram").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2).toSeq.asJava, shape.schema)
          .orderBy("phase")
      },
      Some("""
        WITH j AS (
          SELECT o_orderkey AS k, o_custkey AS w
          FROM orders WHERE o_orderkey % 10 < 9)
        SELECT 'a_ndv_only' AS phase, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS key_sum,
               CAST(SUM(w) AS BIGINT) AS w_sum
        FROM j
        UNION ALL
        SELECT 'b_histogram', COUNT(*), CAST(SUM(k) AS BIGINT),
               CAST(SUM(w) AS BIGINT)
        FROM j
        ORDER BY phase""")),

    // -------------------------------------------------------------- q272:
    // STREAMING CDC UPSERT INTO A DELETION-VECTOR TABLE (VERDICT r14
    // item 7) — the id-less table finally takes a keyed CDC stream
    // WITHOUT a per-batch position scan: `writeStream.option(
    // 'graft.upsert_keys', 'o_orderkey').toTable(dv)` writes each
    // epoch's rows as ordinary data files PLUS one equality-delete
    // file of the epoch's keys, fenced at the pre-commit base count
    // (Iceberg v2 upsert semantics; Flink-CDC-into-Iceberg's shape).
    // Write cost is O(epoch); the key→position resolution happens at
    // read (fenced key-set probe, DvEqualityDeleteSpec pins the fold)
    // and vanishes at compaction. Two waves through ONE checkpoint
    // prove epoch tracking: the second stream run picks up only the
    // new CDC arrivals; the final census is taken with eq entries
    // STILL LIVE (the fold is the thing under test) and oracle-matched
    // against a direct recompute.
    QueryDef(
      "q272_dv_streaming_upsert",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_up")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_cdcfeed")
        Tables(s, d, "orders").createOrReplaceTempView("q272_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_up
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM q272_orders""")
        s.sql("""CREATE TABLE graft_cat.default.orders_cdcfeed
                 (o_orderkey BIGINT, o_orderpriority STRING,
                  o_totalprice DOUBLE)""")
        // wave 1: price corrections for %3 keys + brand-new rows
        s.sql("""INSERT INTO graft_cat.default.orders_cdcfeed
                 SELECT o_orderkey, o_orderpriority, o_totalprice + 5.0
                 FROM q272_orders WHERE o_orderkey % 3 = 0""")
        s.sql("""INSERT INTO graft_cat.default.orders_cdcfeed
                 SELECT o_orderkey + 100000000, 'X-NEW', 1.0
                 FROM q272_orders WHERE o_orderkey % 1000 = 1""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q272-ckpt-").toString
        def applyWave(): Unit = {
          val q = s.readStream.table("graft_cat.default.orders_cdcfeed")
            .writeStream
            .option("checkpointLocation", ckpt)
            .option("graft.upsert_keys", "o_orderkey")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("graft_cat.default.orders_up")
          q.awaitTermination()
        }
        applyWave()
        // wave 2 through the SAME checkpoint: only the new arrivals —
        // %5 keys re-corrected from the ORIGINAL price (last wins)
        s.sql("""INSERT INTO graft_cat.default.orders_cdcfeed
                 SELECT o_orderkey, o_orderpriority, o_totalprice + 50.0
                 FROM q272_orders WHERE o_orderkey % 5 = 0""")
        applyWave()
        // census with the eq entries LIVE (no compaction): the fenced
        // key-set fold is what produces these numbers
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS price_sum
                 FROM graft_cat.default.orders_up
                 GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        WITH fin AS (
          SELECT o_orderpriority,
                 CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 50.0
                      WHEN o_orderkey % 3 = 0 THEN o_totalprice + 5.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders
          UNION ALL
          SELECT 'X-NEW' AS o_orderpriority, 1.0 AS o_totalprice
          FROM orders WHERE o_orderkey % 1000 = 1)
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS price_sum
        FROM fin GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q273:
    // INCREMENTAL MV MAINTENANCE OFF THE DV CHANGE FEED — the q229
    // append-only incremental refresh finally handles DELETES: the MV
    // over a curated DV corpus is maintained from `$changes` slices
    // (delete-rows SUBTRACT their group contributions, inserts add;
    // a version-bounded read selects exactly the unapplied commits),
    // then re-stamped so [[graft.plans.MvRewrite]] serves the user's
    // aggregate from it again — refresh cost is O(changed rows), and
    // the dashboard query never rescans the corpus. Four phases:
    // MV-served, stale-direct after a curation DELETE, re-served after
    // the feed-applied refresh, re-served again after a lang re-tag
    // UPDATE (whose delete+insert pair moves mass between groups,
    // including into a BRAND-NEW group). Oracle recomputes each phase
    // from the raw corpus. At 100 TB this closes the loop the
    // reference's produce→predict pipeline wants: curate in place,
    // maintain the dashboard from the diff, serve reads from the MV.
    QueryDef(
      "q273_dv_feed_mv",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_fm")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_fm_mv")
        Tables(s, d, "documents").createOrReplaceTempView("q273_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_fm
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT doc_id, lang, n_chars FROM q273_docs""")
        s.sql("""CREATE TABLE graft_cat.default.corpus_fm_mv
                 (lang STRING, n_docs BIGINT, sum_chars BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/corpus_fm',
                   'graft.mv.group' = 'lang',
                   'graft.mv.agg' = 'count:*:n_docs,sum:n_chars:sum_chars')""")
        def ver(): Int = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.corpus_fm").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.current_version" =>
              r.getString(1).toInt
          }.get
        def stamp(): Unit = s.sql(
          s"""ALTER TABLE graft_cat.default.corpus_fm_mv
              SET TBLPROPERTIES ('graft.mv.base_version' = '${ver()}')""")
        // initial FULL refresh (the only corpus scan in this query)
        s.sql("""INSERT OVERWRITE graft_cat.default.corpus_fm_mv
                 SELECT lang, COUNT(*), SUM(n_chars)
                 FROM graft_cat.default.corpus_fm GROUP BY lang""")
        stamp()
        s.sql("""ALTER TABLE graft_cat.default.corpus_fm
                 SET TBLPROPERTIES ('graft.mv.tables' = 'corpus_fm_mv')""")
        // INCREMENTAL refresh: apply exactly the feed slice
        // (appliedVer, now] to the MV partials, then re-stamp
        var appliedVer = ver()
        def refreshIncremental(): Unit = {
          val cur = ver()
          s.read.option("from_version", appliedVer.toString)
            .option("to_version", cur.toString)
            .table("graft_cat.default.`corpus_fm$changes`")
            .createOrReplaceTempView("q273_slice")
          s.sql("""
            MERGE INTO graft_cat.default.corpus_fm_mv t
            USING (
              SELECT lang,
                     SUM(CASE WHEN `__op` = 0 THEN 1 ELSE -1 END) AS dn,
                     SUM(CASE WHEN `__op` = 0 THEN n_chars
                              ELSE -n_chars END) AS dc
              FROM q273_slice GROUP BY lang) c
            ON t.lang = c.lang
            WHEN MATCHED AND t.n_docs + c.dn = 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET
              n_docs = t.n_docs + c.dn,
              sum_chars = t.sum_chars + c.dc
            WHEN NOT MATCHED AND c.dn > 0 THEN
              INSERT (lang, n_docs, sum_chars) VALUES (c.lang, c.dn, c.dc)""")
          appliedVer = cur
          stamp()
        }
        def phase(name: String) = s.sql(
          s"""SELECT '$name' AS phase, lang, COUNT(*) AS n_docs,
                     SUM(n_chars) AS sum_chars
              FROM graft_cat.default.corpus_fm
              GROUP BY lang""")
        val shape = phase("a_served")
        val p1 = shape.collect()
        s.sql("""DELETE FROM graft_cat.default.corpus_fm
                 WHERE n_chars % 7 = 3""")           // curation
        val p2 = phase("b_stale_direct").collect()
        refreshIncremental()
        val p3 = phase("c_reserved").collect()
        s.sql("""UPDATE graft_cat.default.corpus_fm
                 SET lang = 'und' WHERE n_chars % 11 = 5""") // re-tag
        refreshIncremental()
        val p4 = phase("d_reserved2").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3 ++ p4).toSeq.asJava,
          shape.schema).orderBy("phase", "lang")
      },
      Some("""
        WITH cur AS (SELECT lang, n_chars FROM documents
                     WHERE n_chars % 7 <> 3),
        tagged AS (
          SELECT CASE WHEN n_chars % 11 = 5 THEN 'und' ELSE lang END
                   AS lang, n_chars
          FROM cur)
        SELECT 'a_served' AS phase, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
        UNION ALL
        SELECT 'b_stale_direct', lang, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT)
        FROM cur GROUP BY lang
        UNION ALL
        SELECT 'c_reserved', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        FROM cur GROUP BY lang
        UNION ALL
        SELECT 'd_reserved2', lang, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT)
        FROM tagged GROUP BY lang
        ORDER BY phase, lang""")),

    // -------------------------------------------------------------- q274:
    // INCREMENTAL APPEND READ ON A PLAIN CoW TABLE — the last gap in
    // the `$changes` surface: Iceberg's incremental append scan,
    // served as a retained-snapshot set diff. A bounded batch read of
    // `<t>$changes` on an ordinary (no MOR/DV machinery) table returns
    // the rows of exactly the files ADDED in (from, to], each stamped
    // with its commit `__ver`; a range containing a REMOVAL (DML,
    // overwrite, compaction) refuses loudly rather than under-deliver
    // (CowChangeFeedSpec pins the refusal matrix). Three insert waves,
    // sliced two ways and reconstructed: snapshot v0 + the slices
    // equals the direct read. At 100 TB this is the zero-bookkeeping
    // polling consumer for append-only facts: the diff is O(files)
    // commit metadata, and only the NEW files are ever opened.
    QueryDef(
      "q274_incremental_append",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_app")
        Tables(s, d, "orders").createOrReplaceTempView("q274_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_app
                 (o_orderkey BIGINT, o_totalprice DOUBLE)""")
        (0 to 2).foreach(w => s.sql(
          s"""INSERT INTO graft_cat.default.orders_app
              SELECT o_orderkey, o_totalprice FROM q274_orders
              WHERE o_orderkey % 3 = $w"""))        // versions 0, 1, 2
        def bounded(from: Int, to: Option[Int]) = {
          val r = s.read.option("from_version", from.toString)
          to.fold(r)(x => r.option("to_version", x.toString))
            .table("graft_cat.default.`orders_app$changes`")
        }
        bounded(0, Some(1)).createOrReplaceTempView("q274_w2")
        bounded(1, None).createOrReplaceTempView("q274_w3")
        s.sql("""
          SELECT 'w2' AS phase, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS DOUBLE) AS key_sum
          FROM q274_w2 WHERE `__op` = 0 AND `__ver` = 1
          UNION ALL
          SELECT 'w3', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
          FROM q274_w3 WHERE `__op` = 0 AND `__ver` = 2
          UNION ALL
          SELECT 'mirror', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
          FROM (SELECT o_orderkey
                FROM graft_cat.default.orders_app VERSION AS OF 0
                UNION ALL SELECT o_orderkey FROM q274_w2
                UNION ALL SELECT o_orderkey FROM q274_w3)
          UNION ALL
          SELECT 'direct', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
          FROM graft_cat.default.orders_app
          ORDER BY phase""")
      },
      Some("""
        SELECT 'w2' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS DOUBLE) AS key_sum
        FROM orders WHERE o_orderkey % 3 = 1
        UNION ALL
        SELECT 'w3', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM orders WHERE o_orderkey % 3 = 2
        UNION ALL
        SELECT 'mirror', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'direct', COUNT(*), CAST(SUM(o_orderkey) AS DOUBLE)
        FROM orders
        ORDER BY phase""")),

    // -------------------------------------------------------------- q275:
    // PERSISTED ANN INDEX MAINTAINED OFF THE CHANGE FEED (VERDICT r15
    // item 2) — the q56 IVF structure stops being a session-cached
    // artifact: the coarse quantizer (`ann_cells`, frozen at build — the
    // standard IVF contract) and the cell ASSIGNMENTS (`ann_idx`, a MOR
    // table keyed on vec_id) are managed graft tables. A curation wave
    // on the DV corpus (embedding re-encode UPDATE, curation DELETE,
    // new-vector INSERT) is then re-indexed INCREMENTALLY: one bounded
    // `$changes` read since the indexed version, one key-pruned MERGE
    // that deletes tombstoned ids and (re)assigns only the changed
    // vectors against the broadcast 16-entry codebook. Output = the full
    // index census (every cell's population — the oracle recomputes
    // assignment of the FINAL corpus from scratch, so incremental ≡
    // rebuild is oracle-checked, not just spec-checked) + the top-10
    // ANN search for 4 query vectors SERVED from the index table.
    // At 100 TB: sessions stop paying the per-session centroid/assign
    // rebuild (one corpus scan, amortized forever), re-index cost is
    // O(changed rows), and the search shuffle stays cell-sized.
    // AnnIndexFeedSpec additionally pins assignment-table equality vs a
    // full rebuild after the waves.
    QueryDef(
      "q275_ann_index_feed",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("emb_cdc", "ann_cells", "ann_idx")
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "embeddings").createOrReplaceTempView("q275_src")
        s.sql("""CREATE TABLE graft_cat.default.emb_cdc
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT vec_id, embedding FROM q275_src""") // version 0
        // coarse quantizer: FROZEN at index build (IVF contract — DML
        // never moves centroids, only assignments), q56's deterministic
        // first-16 codebook so the oracle replays it exactly
        s.sql("""CREATE TABLE graft_cat.default.ann_cells
                 AS SELECT vec_id AS cell_id, embedding AS cb_emb
                 FROM graft_cat.default.emb_cdc VERSION AS OF 0
                 WHERE vec_id < 16""")
        // assignments: ONE corpus scan ever. max_by partial-aggregates
        // map-side over the broadcast codebook (q56's shape); ordering
        // (cd, -cell_id) = oracle's max-cd-then-min-cell tie-break.
        // PARTITIONED BY (cell_id) — VERDICT r16 item 3: the index
        // table's layout IS the IVF contract. Identity-partitioned by
        // cell (16 cells — file-friendly), a probe's literal cell list
        // prunes the scan to nprobe/ncells of the index FILES through
        // the ordinary exact-partition machinery; unpartitioned, every
        // probe paid a full index scan, the very ratio IVF exists to
        // buy back. PlanShapeSpec pins files-opened == probed cells.
        s.sql("""CREATE TABLE graft_cat.default.ann_idx
                 PARTITIONED BY (cell_id)
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='vec_id')
                 AS SELECT v.vec_id,
                           max_by(c.cell_id, named_struct(
                             'cd', cosine_sim(v.embedding, c.cb_emb),
                             'nc', -c.cell_id)) AS cell_id
                 FROM graft_cat.default.emb_cdc VERSION AS OF 0 v
                 CROSS JOIN graft_cat.default.ann_cells c
                 GROUP BY v.vec_id""")
        // curation waves on the corpus: re-encode (moves vectors BETWEEN
        // cells), curation delete, brand-new vectors
        s.sql("""UPDATE graft_cat.default.emb_cdc
                 SET embedding = transform(embedding, x -> -x)
                 WHERE vec_id % 11 = 5""")
        s.sql("""DELETE FROM graft_cat.default.emb_cdc
                 WHERE vec_id % 7 = 3""")
        s.sql("""INSERT INTO graft_cat.default.emb_cdc
                 SELECT vec_id + 100000, transform(embedding, x -> -x)
                 FROM q275_src WHERE vec_id % 9 = 4""")
        // incremental re-index: exactly the feed slice since the indexed
        // version; collapse each key to its final state (q268's
        // discipline), score ONLY the changed vectors against the
        // codebook, MERGE key-pruned into the index
        s.read.option("from_version", "0")
          .table("graft_cat.default.`emb_cdc$changes`")
          .createOrReplaceTempView("q275_slice")
        s.sql("""
          MERGE INTO graft_cat.default.ann_idx t
          USING (
            SELECT f.vec_id, f.`__op`,
                   max_by(c.cell_id, named_struct(
                     'cd', cosine_sim(f.embedding, c.cb_emb),
                     'nc', -c.cell_id)) AS cell_id
            FROM (
              SELECT vec_id, embedding, `__op` FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY `__ver` DESC,
                           CASE WHEN `__op` = 0 THEN 0 ELSE 1 END) AS rn
                FROM q275_slice) WHERE rn = 1) f
            CROSS JOIN graft_cat.default.ann_cells c
            GROUP BY f.vec_id, f.`__op`) c
          ON t.vec_id = c.vec_id
          WHEN MATCHED AND c.`__op` = 2 THEN DELETE
          WHEN MATCHED THEN UPDATE SET cell_id = c.cell_id
          WHEN NOT MATCHED AND c.`__op` = 0 THEN
            INSERT (vec_id, cell_id) VALUES (c.vec_id, c.cell_id)""")
        // PROBE PLANNING, two-phase (r16 item 3): score the query
        // vectors against the 16-entry codebook and COLLECT the distinct
        // probed cells — bounded by nqueries × nprobe (≤ 10 values) by
        // construction, the IVF analogue of collecting a filter's
        // partition list. Inlined as a literal IN, the probe prunes the
        // partitioned index scan STATICALLY (files-opened == probed
        // cells) instead of relying on runtime join filtering.
        val probedCells = s.sql("""
          SELECT DISTINCT cell_id FROM (
            SELECT c.cell_id,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY cosine_sim(q.embedding, c.cb_emb) DESC,
                              c.cell_id) AS rn
            FROM (SELECT vec_id, embedding
                  FROM graft_cat.default.emb_cdc WHERE vec_id < 5) q
            CROSS JOIN graft_cat.default.ann_cells c) WHERE rn <= 2""")
          .collect().map(_.getLong(0)).sorted
        // serve: census of the maintained index (oracle recomputes the
        // final corpus's assignment from scratch — incremental ≡ rebuild
        // is hash-checked) + top-10 search probing 2 cells per query,
        // candidates from the INDEX table pruned to the probed cells'
        // partitions, embeddings from the corpus
        s.sql(s"""
          WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                     FROM graft_cat.default.emb_cdc WHERE vec_id < 5),
          qc AS (SELECT query_id, q_emb, cell_id FROM (
                   SELECT query_id, q_emb, c.cell_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim(q_emb, c.cb_emb) DESC,
                                     c.cell_id) AS rn
                   FROM q CROSS JOIN graft_cat.default.ann_cells c)
                 WHERE rn <= 2),
          scored AS (
            SELECT qc.query_id, i.vec_id AS cand_id, qc.cell_id,
                   cosine_sim(qc.q_emb, v.embedding) AS cos
            FROM qc JOIN graft_cat.default.ann_idx i
                   ON qc.cell_id = i.cell_id
                 JOIN graft_cat.default.emb_cdc v
                   ON i.vec_id = v.vec_id
            WHERE i.vec_id <> qc.query_id
              AND i.cell_id IN (${probedCells.mkString(", ")})),
          r AS (SELECT query_id, cand_id, cos,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, cand_id) AS rank
                FROM scored)
          SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
                 CAST(-1 AS BIGINT) AS k3, CAST(0.0 AS DOUBLE) AS score
          FROM graft_cat.default.ann_idx GROUP BY cell_id
          UNION ALL
          SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
                 round(cos, 6)
          FROM r WHERE rank <= 10
          ORDER BY phase, k1, k2""")
      },
      Some("""
        WITH raw AS (SELECT vec_id, embedding FROM embeddings),
        cur AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 11 = 5
                      THEN list_transform(embedding, x -> -x)
                      ELSE embedding END AS embedding
          FROM raw WHERE vec_id % 7 <> 3
          UNION ALL
          SELECT vec_id + 100000, list_transform(embedding, x -> -x)
          FROM raw WHERE vec_id % 9 = 4),
        vn AS (SELECT vec_id, embedding,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) norm
               FROM cur),
        cb AS (SELECT vec_id AS cell_id, embedding AS cb_emb,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) cb_norm
               FROM raw WHERE vec_id < 16),
        ass AS (SELECT vn.vec_id, vn.embedding, vn.norm, cb.cell_id,
                 list_reduce(list_transform(
                   generate_series(1, len(vn.embedding)),
                   i -> CAST(vn.embedding[i] AS DOUBLE)
                        * CAST(cb.cb_emb[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (vn.norm * cb.cb_norm) AS cd
                FROM vn CROSS JOIN cb),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cd DESC, cell_id) AS arn FROM ass),
        assigned AS (SELECT vec_id, embedding, norm, cell_id
                     FROM rk WHERE arn = 1),
        qc AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      norm AS q_norm, cell_id
               FROM rk WHERE vec_id < 5 AND arn <= 2),
        scored AS (SELECT q.query_id, a.vec_id AS cand_id, q.cell_id,
                 list_reduce(list_transform(
                   generate_series(1, len(q.q_emb)),
                   i -> CAST(q.q_emb[i] AS DOUBLE)
                        * CAST(a.embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (q.q_norm * a.norm) AS cos
                 FROM qc q JOIN assigned a USING (cell_id)
                 WHERE a.vec_id <> q.query_id),
        r AS (SELECT query_id, cand_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, cand_id) AS rank
              FROM scored)
        SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
               CAST(-1 AS BIGINT) AS k3, CAST(0.0 AS DOUBLE) AS score
        FROM assigned GROUP BY cell_id
        UNION ALL
        SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
               round(cos, 6)
        FROM r WHERE rank <= 10
        ORDER BY phase, k1, k2""")),

    // -------------------------------------------------------------- q276:
    // MCV STATISTICS FOR STRING COLUMNS (VERDICT r15 item 4) — `CALL
    // system.analyze(t, cols, approx, buckets, mcv)` persists the
    // top-K most-common values + frequencies for string columns (the
    // skew statistic equi-height histograms can't express for the
    // dimension keys real schemas join on), version-stamped under the
    // same provenance discipline as NDVs. The query builds an
    // 80%-hot key, analyzes, then emits the PERSISTED artifact parsed
    // back from the table property — the oracle recomputes the same
    // top-K from raw data, so the stored counts (not just the query
    // path) are hash-checked. AnalyzeSpec pins version-gating and the
    // drift re-check; SaltSkewJoin (q277) is the consumer.
    QueryDef(
      "q276_analyze_mcv",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.ord_mcv")
        Tables(s, d, "orders").createOrReplaceTempView("q276_orders")
        s.sql("""CREATE TABLE graft_cat.default.ord_mcv
                 (k STRING, o_orderkey BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.ord_mcv
                 SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'HOT'
                             ELSE o_orderpriority END,
                        o_orderkey
                 FROM q276_orders""")
        s.sql("""CALL graft_cat.system.analyze(
                   table => 'default.ord_mcv', columns => 'k',
                   mcv => 3)""").collect()
        // read back the PERSISTED artifact: `total|v:c;v:c;v:c`
        val enc = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.ord_mcv").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.stats.mcv.k" =>
              r.getString(1)
          }.getOrElse(throw new IllegalStateException(
            "analyze did not persist graft.stats.mcv.k"))
        val Array(tot, list) = enc.split('|')
        val rows = ("__total", tot.toLong) +: list.split(';').toSeq.map {
          e =>
            val i = e.lastIndexOf(':')
            (java.net.URLDecoder.decode(e.take(i), "UTF-8"),
              e.drop(i + 1).toLong)
        }
        import s.implicits._
        rows.toDF("value", "cnt").orderBy(col("cnt").desc, col("value"))
      },
      Some("""
        WITH t AS (SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'HOT'
                               ELSE o_orderpriority END AS k
                   FROM orders),
        top AS (SELECT k AS value, COUNT(*) AS cnt FROM t
                GROUP BY k ORDER BY cnt DESC, k LIMIT 3)
        SELECT value, cnt FROM (
          SELECT '__total' AS value, COUNT(*) AS cnt FROM t
          UNION ALL
          SELECT value, cnt FROM top)
        ORDER BY cnt DESC, value""")),

    // -------------------------------------------------------------- q277:
    // STATISTICS-DRIVEN AUTO-SALTED JOIN (VERDICT r15 item 9) — q47's
    // hand-written salted shape, emitted by the optimizer
    // (plans/SaltSkewJoin) because the engine's own MCV statistics
    // prove the key is hot: a 90%-hot string fact key joins its dim
    // and the plan grows the salt projection + the dim explode
    // automatically (PlanShapeSpec pins the shape, the staleness
    // refusal, and salted≡unsalted results). The rewrite is physical-
    // only, so the oracle runs the plain join. Broadcast is disabled
    // for the demonstration query because the r16 PROFIT gates
    // (correctly) refuse to salt a join BHJ already owns — at sf0.01
    // the dim is ~51 rows; the production shape this models is a
    // shuffle join whose dim exceeds the broadcast threshold.
    // PlanShapeSpec pins the broadcast-small and co-bucketed-SPJ
    // refusals alongside the firing shape. At 100 TB this turns the
    // one reducer holding 90% of the shuffle into n balanced tasks
    // without anyone editing the query.
    QueryDef(
      "q277_auto_salted_join",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.fact_skew")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.dim_skew")
        Tables(s, d, "orders").createOrReplaceTempView("q277_orders")
        s.sql("""CREATE TABLE graft_cat.default.fact_skew
                 (k STRING, v BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.fact_skew
                 SELECT CASE WHEN o_orderkey % 10 < 9 THEN 'HOT'
                             ELSE concat('c', o_custkey % 50) END,
                        o_orderkey
                 FROM q277_orders""")
        s.sql("""CREATE TABLE graft_cat.default.dim_skew
                 (k STRING, d STRING)""")
        s.sql("""INSERT INTO graft_cat.default.dim_skew
                 SELECT DISTINCT k, concat('d_', k)
                 FROM graft_cat.default.fact_skew""")
        s.sql("""CALL graft_cat.system.analyze(
                   table => 'default.fact_skew', columns => 'k',
                   mcv => 5)""").collect()
        val savedBhj =
          try Some(s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
          catch { case _: Exception => None }
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val df = s.sql("""
            SELECT dm.d, COUNT(*) AS n, SUM(f.v) AS sum_v
            FROM graft_cat.default.fact_skew f
            JOIN graft_cat.default.dim_skew dm ON f.k = dm.k
            GROUP BY dm.d ORDER BY dm.d""")
          // EXECUTE inside the conf scope: any downstream count()/write
          // re-optimizes under the restored threshold and BHJ would
          // re-own the join — the salted shape this query demonstrates
          // would never run. The result is one row per dim key (~51),
          // so handing back a local frame is bounded by construction.
          s.createDataFrame(
            java.util.Arrays.asList(df.collect(): _*), df.schema)
        } finally savedBhj match {
          case Some(v) => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      },
      Some("""
        WITH f AS (SELECT CASE WHEN o_orderkey % 10 < 9 THEN 'HOT'
                               ELSE concat('c', CAST(o_custkey % 50
                                 AS VARCHAR)) END AS k,
                          o_orderkey AS v
                   FROM orders),
        dm AS (SELECT DISTINCT k, concat('d_', k) AS d FROM f)
        SELECT dm.d, COUNT(*) AS n, CAST(SUM(f.v) AS BIGINT) AS sum_v
        FROM f JOIN dm ON f.k = dm.k
        GROUP BY dm.d ORDER BY dm.d""")),

    // -------------------------------------------------------------- q278:
    // CoW DML CHANGE FEED (VERDICT r15 item 6) — `$changes` is now
    // total across ALL THREE storage modes: a plain copy-on-write
    // table with a declared row id serves UPDATE/DELETE/append commits
    // as a per-commit file-diff changelog (removed files → op-2 rows,
    // added → op-0, Iceberg's changelog-scan shape; id-less CoW keeps
    // the loud refusal — CowChangeFeedSpec). The q268 consumer
    // discipline applies UNCHANGED: one bounded slice, collapse per
    // key by max __ver (insert wins within a version), MERGE into a
    // keyed mirror that recomputes its derived column per upsert. The
    // mirror census is the oracle. At 100 TB the feed costs O(rows of
    // the files the DML rewrote) — rows the CoW write already paid
    // for — and the polling consumer needs no checkpoint, only the
    // last version it applied.
    QueryDef(
      "q278_cow_dml_feed",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_cdf")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_cdf_mir")
        Tables(s, d, "orders").createOrReplaceTempView("q278_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_cdf
                 (o_orderkey BIGINT, o_totalprice DOUBLE, prio STRING)
                 TBLPROPERTIES ('graft.row_id'='o_orderkey')""")
        s.sql("""INSERT INTO graft_cat.default.orders_cdf
                 SELECT o_orderkey, o_totalprice, o_orderpriority
                 FROM q278_orders""")                       // version 0
        s.sql("""CREATE TABLE graft_cat.default.orders_cdf_mir
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='o_orderkey')
                 AS SELECT o_orderkey, o_totalprice, prio,
                           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS band
                 FROM graft_cat.default.orders_cdf VERSION AS OF 0""")
        s.sql("""UPDATE graft_cat.default.orders_cdf
                 SET o_totalprice = o_totalprice + 100.0
                 WHERE o_orderkey % 10 = 1""")              // v1: rewrite
        s.sql("""DELETE FROM graft_cat.default.orders_cdf
                 WHERE o_orderkey % 10 = 0""")              // v2: rewrite
        s.sql("""INSERT INTO graft_cat.default.orders_cdf
                 SELECT o_orderkey + 100000000, o_totalprice, 'X-NEW'
                 FROM q278_orders
                 WHERE o_orderkey % 10 = 2""")              // v3: append
        s.read.option("from_version", "0")
          .table("graft_cat.default.`orders_cdf$changes`")
          .createOrReplaceTempView("q278_slice")
        s.sql("""
          MERGE INTO graft_cat.default.orders_cdf_mir t
          USING (
            SELECT o_orderkey, o_totalprice, prio, `__op` FROM (
              SELECT *, row_number() OVER (PARTITION BY o_orderkey
                ORDER BY `__ver` DESC,
                         CASE WHEN `__op` = 0 THEN 0 ELSE 1 END) AS rn
              FROM q278_slice) WHERE rn = 1) c
          ON t.o_orderkey = c.o_orderkey
          WHEN MATCHED AND c.`__op` = 2 THEN DELETE
          WHEN MATCHED THEN UPDATE SET
            o_totalprice = c.o_totalprice, prio = c.prio,
            band = CAST(FLOOR(c.o_totalprice / 1000) AS BIGINT)
          WHEN NOT MATCHED AND c.`__op` = 0 THEN
            INSERT (o_orderkey, o_totalprice, prio, band)
            VALUES (c.o_orderkey, c.o_totalprice, c.prio,
                    CAST(FLOOR(c.o_totalprice / 1000) AS BIGINT))""")
        s.sql("""
          SELECT prio, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS DOUBLE) AS key_sum,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                   AS DOUBLE) AS price_sum,
                 CAST(SUM(band) AS BIGINT) AS band_sum
          FROM graft_cat.default.orders_cdf_mir
          GROUP BY prio ORDER BY prio""")
      },
      Some("""
        WITH cur AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 10 = 1
                      THEN o_totalprice + 100.0
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderpriority AS prio
          FROM orders WHERE o_orderkey % 10 <> 0
          UNION ALL
          SELECT o_orderkey + 100000000, o_totalprice, 'X-NEW'
          FROM orders WHERE o_orderkey % 10 = 2)
        SELECT prio, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS DOUBLE) AS key_sum,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                 AS DOUBLE) AS price_sum,
               CAST(SUM(CAST(FLOOR(o_totalprice / 1000) AS BIGINT))
                 AS BIGINT) AS band_sum
        FROM cur GROUP BY prio ORDER BY prio""")),

    // -------------------------------------------------------------- q279:
    // MULTI-TABLE ATOMIC PUBLISH (VERDICT r15 item 7) — the fact+dim
    // consistent cut: both tables are staged on branches (a synthetic
    // segment lands in the dim, fact rows referencing it land in the
    // fact), then `CALL system.publish_tables` lands BOTH as one
    // transaction whose visibility flips at a single atomic marker —
    // a reader never sees fact rows whose dim key is missing.
    // Phases: the pre-publish join census, the post-publish census
    // (the synthetic segment present with exactly its fact mass), and
    // an all-or-nothing probe — a second transaction against a
    // deliberately diverged dim aborts whole, leaving the census
    // byte-identical. AtomicPublishSpec pins the no-torn-read reader
    // protocol and the crash matrix; the oracle recomputes each phase
    // from raw data. At 100 TB the publish is O(files) metadata: the
    // staged content hard-links in, and the cross-table instant is
    // one file create.
    QueryDef(
      "q279_atomic_publish",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("fact_ap", "dim_ap", "fact_ap_branch_pub",
          "dim_ap_branch_pub", "fact_ap_branch_pub2",
          "dim_ap_branch_pub2").foreach(t =>
          s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "orders").createOrReplaceTempView("q279_orders")
        Tables(s, d, "customer").createOrReplaceTempView("q279_customer")
        s.sql("""CREATE TABLE graft_cat.default.fact_ap
                 (o_orderkey BIGINT, o_custkey BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.fact_ap
                 SELECT o_orderkey, o_custkey FROM q279_orders""")
        s.sql("""CREATE TABLE graft_cat.default.dim_ap
                 (c_custkey BIGINT, c_mktsegment STRING)""")
        s.sql("""INSERT INTO graft_cat.default.dim_ap
                 SELECT c_custkey, c_mktsegment FROM q279_customer""")
        def census(name: String) = s.sql(
          s"""SELECT '$name' AS phase, x.c_mktsegment,
                     COUNT(*) AS n_orders,
                     CAST(SUM(t.o_orderkey) AS DOUBLE) AS key_sum
              FROM graft_cat.default.fact_ap t
              JOIN graft_cat.default.dim_ap x
                ON t.o_custkey = x.c_custkey
              GROUP BY x.c_mktsegment""")
        val shape = census("a_pre")
        val p1 = shape.collect()
        // stage the transaction on branches: a brand-new segment and
        // the fact rows that reference it
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.fact_ap', 'pub')")
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.dim_ap', 'pub')")
        s.sql("""INSERT INTO graft_cat.default.fact_ap_branch_pub
                 SELECT o_orderkey + 100000000, -7 FROM q279_orders
                 WHERE o_orderkey % 5 = 2""")
        s.sql("""INSERT INTO graft_cat.default.dim_ap_branch_pub
                 VALUES (-7, 'SYNTHETIC')""")
        s.sql("""CALL graft_cat.system.publish_tables(
                   tables => 'default.fact_ap,default.dim_ap',
                   branch => 'pub')""").collect()
        val p2 = census("b_post").collect()
        // all-or-nothing probe: stage a second transaction, then
        // diverge the dim's MAIN so the publish must abort whole —
        // the census stays byte-identical to b_post
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.fact_ap', 'pub2')")
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.dim_ap', 'pub2')")
        s.sql("""INSERT INTO graft_cat.default.fact_ap_branch_pub2
                 VALUES (999999999, -8)""")
        s.sql("""INSERT INTO graft_cat.default.dim_ap_branch_pub2
                 VALUES (-8, 'NEVER')""")
        s.sql("""INSERT INTO graft_cat.default.dim_ap
                 VALUES (-99, 'FOREIGN')""")
        val aborted =
          try {
            s.sql("""CALL graft_cat.system.publish_tables(
                       tables => 'default.fact_ap,default.dim_ap',
                       branch => 'pub2')""").collect()
            false
          } catch { case _: Exception => true }
        require(aborted, "diverged publish must abort")
        val p3 = census("c_after_abort").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3).toSeq.asJava, shape.schema)
          .orderBy("phase", "c_mktsegment")
      },
      Some("""
        WITH pre AS (
          SELECT c.c_mktsegment, o.o_orderkey
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        synth AS (
          SELECT 'SYNTHETIC' AS c_mktsegment,
                 o_orderkey + 100000000 AS o_orderkey
          FROM orders WHERE o_orderkey % 5 = 2),
        post AS (SELECT * FROM pre UNION ALL SELECT * FROM synth)
        SELECT 'a_pre' AS phase, c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(o_orderkey) AS DOUBLE) AS key_sum
        FROM pre GROUP BY c_mktsegment
        UNION ALL
        SELECT 'b_post', c_mktsegment, COUNT(*),
               CAST(SUM(o_orderkey) AS DOUBLE)
        FROM post GROUP BY c_mktsegment
        UNION ALL
        SELECT 'c_after_abort', c_mktsegment, COUNT(*),
               CAST(SUM(o_orderkey) AS DOUBLE)
        FROM post GROUP BY c_mktsegment
        ORDER BY phase, c_mktsegment""")),

    // -------------------------------------------------------------- q280:
    // MV REWRITE: COUNT(DISTINCT group column) (VERDICT r15 item 8) —
    // the dashboard distinct-count ("how many active parities per
    // priority?") now serves from the MV: distinctness over a GROUP
    // column is exact from the MV's own group values, no matter how
    // many partial rows per group it holds. Phases: the grouped
    // distinct-count roll-up (MV-served — MvRewriteSpec pins the plan
    // swap and the value-column/FILTER refusal boundary), the global
    // roll-up to the empty group set, and a staleness probe (a base
    // commit kills the rewrite; the direct plan re-derives the same
    // truth the oracle computes). At 100 TB the distinct-count
    // dashboard reads |groups| MV rows instead of shuffling the corpus
    // into a distinct aggregation.
    QueryDef(
      "q280_mv_count_distinct",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_cd")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_cd_mv")
        Tables(s, d, "orders").createOrReplaceTempView("q280_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_cd
                 (prio STRING, parity BIGINT, o_orderkey BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.orders_cd
                 SELECT o_orderpriority, o_orderkey % 7, o_orderkey
                 FROM q280_orders""")
        s.sql("""CREATE TABLE graft_cat.default.orders_cd_mv
                 (prio STRING, parity BIGINT, n BIGINT, key_sum BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_cd',
                   'graft.mv.group' = 'prio,parity',
                   'graft.mv.agg' = 'count:*:n,sum:o_orderkey:key_sum')""")
        def refresh(): Unit = {
          s.sql("""INSERT OVERWRITE graft_cat.default.orders_cd_mv
                   SELECT prio, parity, COUNT(*), SUM(o_orderkey)
                   FROM graft_cat.default.orders_cd GROUP BY 1, 2""")
          val v = s.sql(
            "SHOW TBLPROPERTIES graft_cat.default.orders_cd").collect()
            .collectFirst {
              case r if r.getString(0) == "graft.current_version" =>
                r.getString(1)
            }.get
          s.sql(s"""ALTER TABLE graft_cat.default.orders_cd_mv
                    SET TBLPROPERTIES ('graft.mv.base_version' = '$v')""")
        }
        refresh()
        s.sql("""ALTER TABLE graft_cat.default.orders_cd
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_cd_mv')""")
        def grouped(name: String) = s.sql(
          s"""SELECT '$name' AS phase, prio,
                     COUNT(DISTINCT parity) AS nd,
                     COUNT(*) AS n
              FROM graft_cat.default.orders_cd GROUP BY prio""")
        val shape = grouped("a_served")
        val p1 = shape.collect()
        // global roll-up to the empty group set
        val p2 = s.sql("""SELECT 'b_global' AS phase, 'ALL' AS prio,
                                 COUNT(DISTINCT parity) AS nd,
                                 COUNT(*) AS n
                          FROM graft_cat.default.orders_cd""").collect()
        // staleness probe: a base commit kills the rewrite; the direct
        // plan derives the refreshed truth
        s.sql("""INSERT INTO graft_cat.default.orders_cd
                 VALUES ('9-SYNTH', 99, 999999999)""")
        val p3 = grouped("c_stale_direct").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3).toSeq.asJava, shape.schema)
          .orderBy("phase", "prio")
      },
      Some("""
        WITH t AS (SELECT o_orderpriority AS prio,
                          o_orderkey % 7 AS parity
                   FROM orders),
        t2 AS (SELECT * FROM t
               UNION ALL SELECT '9-SYNTH', 99)
        SELECT 'a_served' AS phase, prio,
               COUNT(DISTINCT parity) AS nd, COUNT(*) AS n
        FROM t GROUP BY prio
        UNION ALL
        SELECT 'b_global', 'ALL', COUNT(DISTINCT parity), COUNT(*)
        FROM t
        UNION ALL
        SELECT 'c_stale_direct', prio, COUNT(DISTINCT parity), COUNT(*)
        FROM t2 GROUP BY prio
        ORDER BY phase, prio""")),

    // -------------------------------------------------------------- q281:
    // PERSISTED IVF × INT8-SQ INDEX OFF THE CHANGE FEED — q275's
    // missing half (VERDICT r15 item 2 named "centroids/assignments
    // AND SQ/PQ codes"): the quantized codes are a managed table too.
    // `sq_idx` carries (vec_id, cell_id, amax, int8 codes) — q240's
    // per-row symmetric-max quantizer, so a changed vector's code
    // recomputes from JUST that row — and the same bounded-feed MERGE
    // that re-assigns cells re-quantizes codes for exactly the changed
    // vectors after an UPDATE/DELETE/INSERT curation wave. Search is
    // the q247 composition served ENTIRELY from managed tables: probe
    // 2 cells, rank the probed pool on persisted codes × the
    // full-precision query (asymmetric SQ, reading 1/4 the bytes),
    // exact top-10 rerank from the corpus. Output = per-cell census
    // of (population, code mass) — hash-checking the persisted codes
    // table-wide against the oracle's from-scratch requantization —
    // plus the search. At 100 TB: no session ever rebuilds centroids,
    // assignments, OR codes; refresh cost is O(changed rows); the
    // approx scan reads codes only for the probed cells.
    QueryDef(
      "q281_ann_index_sq",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("emb_sq", "sq_cells", "sq_idx")
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "embeddings").createOrReplaceTempView("q281_src")
        s.sql("""CREATE TABLE graft_cat.default.emb_sq
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT vec_id, embedding FROM q281_src""") // v0
        s.sql("""CREATE TABLE graft_cat.default.sq_cells
                 AS SELECT vec_id AS cell_id, embedding AS cb_emb
                 FROM graft_cat.default.emb_sq VERSION AS OF 0
                 WHERE vec_id < 16""")
        // PARTITIONED BY (cell_id), like q275's ann_idx (r16 item 3):
        // the probe's literal cell list prunes code reads to the probed
        // cells' files — the approx ADC pass touches nprobe/ncells of
        // the quantized index, never the whole code table
        s.sql("""CREATE TABLE graft_cat.default.sq_idx
                 PARTITIONED BY (cell_id)
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='vec_id')
                 AS SELECT vec_id, cell_id, amax,
                           transform(embedding, x ->
                             CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax
                               + 0.5d) AS INT)) AS codes
                 FROM (
                   SELECT v.vec_id, v.embedding,
                          aggregate(v.embedding, CAST(0.0 AS DOUBLE),
                            (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))
                            AS amax,
                          max_by(c.cell_id, named_struct(
                            'cd', cosine_sim(v.embedding, c.cb_emb),
                            'nc', -c.cell_id)) AS cell_id
                   FROM graft_cat.default.emb_sq VERSION AS OF 0 v
                   CROSS JOIN graft_cat.default.sq_cells c
                   GROUP BY v.vec_id, v.embedding)""")
        s.sql("""UPDATE graft_cat.default.emb_sq
                 SET embedding = transform(embedding, x -> -x)
                 WHERE vec_id % 11 = 5""")
        s.sql("""DELETE FROM graft_cat.default.emb_sq
                 WHERE vec_id % 7 = 3""")
        s.sql("""INSERT INTO graft_cat.default.emb_sq
                 SELECT vec_id + 100000, transform(embedding, x -> -x)
                 FROM q281_src WHERE vec_id % 9 = 4""")
        s.read.option("from_version", "0")
          .table("graft_cat.default.`emb_sq$changes`")
          .createOrReplaceTempView("q281_slice")
        // one MERGE maintains assignment AND codes for exactly the
        // changed vectors
        s.sql("""
          MERGE INTO graft_cat.default.sq_idx t
          USING (
            SELECT vec_id, `__op`, cell_id, amax,
                   transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax
                       + 0.5d) AS INT)) AS codes
            FROM (
              SELECT f.vec_id, f.`__op`, f.embedding, f.amax,
                     max_by(c.cell_id, named_struct(
                       'cd', cosine_sim(f.embedding, c.cb_emb),
                       'nc', -c.cell_id)) AS cell_id
              FROM (
                SELECT vec_id, embedding, `__op`,
                       aggregate(embedding, CAST(0.0 AS DOUBLE),
                         (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))
                         AS amax
                FROM (
                  SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY `__ver` DESC,
                               CASE WHEN `__op` = 0 THEN 0 ELSE 1 END)
                      AS rn
                    FROM q281_slice) WHERE rn = 1)) f
              CROSS JOIN graft_cat.default.sq_cells c
              GROUP BY f.vec_id, f.`__op`, f.embedding, f.amax)) c
          ON t.vec_id = c.vec_id
          WHEN MATCHED AND c.`__op` = 2 THEN DELETE
          WHEN MATCHED THEN UPDATE SET
            cell_id = c.cell_id, amax = c.amax, codes = c.codes
          WHEN NOT MATCHED AND c.`__op` = 0 THEN
            INSERT (vec_id, cell_id, amax, codes)
            VALUES (c.vec_id, c.cell_id, c.amax, c.codes)""")
        // two-phase probe (r16 item 3), same as q275: collect the
        // bounded probed-cell list, inline as a literal so the
        // partitioned code table prunes statically
        val probedSq = s.sql("""
          SELECT DISTINCT cell_id FROM (
            SELECT c.cell_id,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY cosine_sim(q.embedding, c.cb_emb) DESC,
                              c.cell_id) AS rn
            FROM (SELECT vec_id, embedding
                  FROM graft_cat.default.emb_sq WHERE vec_id < 5) q
            CROSS JOIN graft_cat.default.sq_cells c) WHERE rn <= 2""")
          .collect().map(_.getLong(0)).sorted
        s.sql(s"""
          WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                     FROM graft_cat.default.emb_sq WHERE vec_id < 5),
          qc AS (SELECT query_id, q_emb, cell_id FROM (
                   SELECT query_id, q_emb, c.cell_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim(q_emb, c.cb_emb) DESC,
                                     c.cell_id) AS rn
                   FROM q CROSS JOIN graft_cat.default.sq_cells c)
                 WHERE rn <= 2),
          approx AS (
            SELECT qc.query_id, qc.q_emb, i.vec_id AS cand_id,
                   aggregate(zip_with(i.codes, qc.q_emb,
                     (cd, qd) -> CAST(cd AS DOUBLE) * CAST(qd AS DOUBLE)),
                     CAST(0.0 AS DOUBLE), (a, x) -> a + x)
                     * i.amax / 127.0 AS sq_dot
            FROM qc JOIN graft_cat.default.sq_idx i
                   ON qc.cell_id = i.cell_id
            WHERE i.vec_id <> qc.query_id
              AND i.cell_id IN (${probedSq.mkString(", ")})),
          ar AS (SELECT query_id, q_emb, cand_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY sq_dot DESC, cand_id) AS arank
                 FROM approx),
          ex AS (SELECT ar.query_id, ar.cand_id,
                        cosine_sim(ar.q_emb, v.embedding) AS cos
                 FROM ar JOIN graft_cat.default.emb_sq v
                   ON ar.cand_id = v.vec_id
                 WHERE ar.arank <= 25),
          r AS (SELECT query_id, cand_id, cos,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, cand_id) AS rank
                FROM ex)
          SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
                 SUM(CAST(element_at(codes, 1) AS BIGINT)) AS k3,
                 CAST(0.0 AS DOUBLE) AS score
          FROM graft_cat.default.sq_idx GROUP BY cell_id
          UNION ALL
          SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
                 round(cos, 6)
          FROM r WHERE rank <= 10
          ORDER BY phase, k1, k2""")
      },
      Some("""
        WITH raw AS (SELECT vec_id, embedding FROM embeddings),
        cur AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 11 = 5
                      THEN list_transform(embedding, x -> -x)
                      ELSE embedding END AS embedding
          FROM raw WHERE vec_id % 7 <> 3
          UNION ALL
          SELECT vec_id + 100000, list_transform(embedding, x -> -x)
          FROM raw WHERE vec_id % 9 = 4),
        vn AS (SELECT vec_id, embedding,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) norm,
                 list_reduce(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))),
                   (a2, b2) -> greatest(a2, b2)) amax
               FROM cur),
        cb AS (SELECT vec_id AS cell_id, embedding AS cb_emb,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) cb_norm
               FROM raw WHERE vec_id < 16),
        ass AS (SELECT vn.vec_id, vn.embedding, vn.norm, vn.amax,
                 cb.cell_id,
                 list_reduce(list_transform(
                   generate_series(1, len(vn.embedding)),
                   i -> CAST(vn.embedding[i] AS DOUBLE)
                        * CAST(cb.cb_emb[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (vn.norm * cb.cb_norm) AS cd
                FROM vn CROSS JOIN cb),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cd DESC, cell_id) AS arn FROM ass),
        idx AS (SELECT vec_id, embedding, norm, amax, cell_id,
                       list_transform(embedding, x ->
                         CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax
                           + 0.5) AS INTEGER)) AS codes
                FROM rk WHERE arn = 1),
        qc AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      norm AS q_norm, cell_id
               FROM rk WHERE vec_id < 5 AND arn <= 2),
        approx AS (SELECT q.query_id, q.q_emb, q.q_norm,
                 i.vec_id AS cand_id,
                 list_reduce(list_transform(
                   generate_series(1, len(i.codes)),
                   j -> CAST(i.codes[j] AS DOUBLE)
                        * CAST(q.q_emb[j] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) * i.amax / 127.0 AS sq_dot
                 FROM qc q JOIN idx i USING (cell_id)
                 WHERE i.vec_id <> q.query_id),
        ar AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sq_dot DESC, cand_id) AS arank
               FROM approx),
        ex AS (SELECT ar.query_id, ar.cand_id,
                 list_reduce(list_transform(
                   generate_series(1, len(ar.q_emb)),
                   i -> CAST(ar.q_emb[i] AS DOUBLE)
                        * CAST(v.embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (ar.q_norm * v.norm) AS cos
               FROM ar JOIN vn v ON ar.cand_id = v.vec_id
               WHERE ar.arank <= 25),
        r AS (SELECT query_id, cand_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, cand_id) AS rank
              FROM ex)
        SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
               CAST(SUM(codes[1]) AS BIGINT) AS k3,
               CAST(0.0 AS DOUBLE) AS score
        FROM idx GROUP BY cell_id
        UNION ALL
        SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
               round(cos, 6)
        FROM r WHERE rank <= 10
        ORDER BY phase, k1, k2""")),

    // -------------------------------------------------------------- q282:
    // INCREMENTAL MV MAINTENANCE OFF THE CoW DML FEED — q273's cycle
    // on COPY-ON-WRITE storage, closing "incremental MV refresh across
    // all three storage modes": the corpus is a plain CoW table with a
    // declared row id, so its `$changes` serves DML as the raw
    // file-diff changelog (q278). The q273 partial-delta MERGE applies
    // VERBATIM: untouched rows a rewrite copied arrive as canceling
    // same-version delete+insert pairs whose group deltas net to ZERO
    // — the raw changelog is exactly as sound a partial-maintenance
    // input as the DV feed, just proportionally larger (O(rewritten
    // files' rows), which is what the CoW write itself already cost).
    // Same four phases as q273: MV-served, stale-direct after a
    // curation DELETE, re-served after the feed-applied refresh,
    // re-served after a lang re-tag UPDATE that moves mass between
    // groups, including into a brand-new group. Oracle recomputes each
    // phase from the raw corpus.
    QueryDef(
      "q282_cow_feed_mv",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_cfm")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_cfm_mv")
        Tables(s, d, "documents").createOrReplaceTempView("q282_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_cfm
                 (doc_id BIGINT, lang STRING, n_chars BIGINT)
                 TBLPROPERTIES ('graft.row_id'='doc_id')""")
        s.sql("""INSERT INTO graft_cat.default.corpus_cfm
                 SELECT doc_id, lang, n_chars FROM q282_docs""")
        s.sql("""CREATE TABLE graft_cat.default.corpus_cfm_mv
                 (lang STRING, n_docs BIGINT, sum_chars BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/corpus_cfm',
                   'graft.mv.group' = 'lang',
                   'graft.mv.agg' = 'count:*:n_docs,sum:n_chars:sum_chars')""")
        def ver(): Int = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.corpus_cfm").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.current_version" =>
              r.getString(1).toInt
          }.get
        def stamp(): Unit = s.sql(
          s"""ALTER TABLE graft_cat.default.corpus_cfm_mv
              SET TBLPROPERTIES ('graft.mv.base_version' = '${ver()}')""")
        s.sql("""INSERT OVERWRITE graft_cat.default.corpus_cfm_mv
                 SELECT lang, COUNT(*), SUM(n_chars)
                 FROM graft_cat.default.corpus_cfm GROUP BY lang""")
        stamp()
        s.sql("""ALTER TABLE graft_cat.default.corpus_cfm
                 SET TBLPROPERTIES ('graft.mv.tables' = 'corpus_cfm_mv')""")
        var appliedVer = ver()
        def refreshIncremental(): Unit = {
          val cur = ver()
          s.read.option("from_version", appliedVer.toString)
            .option("to_version", cur.toString)
            .table("graft_cat.default.`corpus_cfm$changes`")
            .createOrReplaceTempView("q282_slice")
          s.sql("""
            MERGE INTO graft_cat.default.corpus_cfm_mv t
            USING (
              SELECT lang,
                     SUM(CASE WHEN `__op` = 0 THEN 1 ELSE -1 END) AS dn,
                     SUM(CASE WHEN `__op` = 0 THEN n_chars
                              ELSE -n_chars END) AS dc
              FROM q282_slice GROUP BY lang) c
            ON t.lang = c.lang
            WHEN MATCHED AND t.n_docs + c.dn = 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET
              n_docs = t.n_docs + c.dn,
              sum_chars = t.sum_chars + c.dc
            WHEN NOT MATCHED AND c.dn > 0 THEN
              INSERT (lang, n_docs, sum_chars) VALUES (c.lang, c.dn, c.dc)""")
          appliedVer = cur
          stamp()
        }
        def phase(name: String) = s.sql(
          s"""SELECT '$name' AS phase, lang, COUNT(*) AS n_docs,
                     SUM(n_chars) AS sum_chars
              FROM graft_cat.default.corpus_cfm
              GROUP BY lang""")
        val shape = phase("a_served")
        val p1 = shape.collect()
        s.sql("""DELETE FROM graft_cat.default.corpus_cfm
                 WHERE n_chars % 7 = 3""")           // curation
        val p2 = phase("b_stale_direct").collect()
        refreshIncremental()
        val p3 = phase("c_reserved").collect()
        s.sql("""UPDATE graft_cat.default.corpus_cfm
                 SET lang = 'und' WHERE n_chars % 11 = 5""") // re-tag
        refreshIncremental()
        val p4 = phase("d_reserved2").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3 ++ p4).toSeq.asJava,
          shape.schema).orderBy("phase", "lang")
      },
      Some("""
        WITH cur AS (SELECT lang, n_chars FROM documents
                     WHERE n_chars % 7 <> 3),
        tagged AS (
          SELECT CASE WHEN n_chars % 11 = 5 THEN 'und' ELSE lang END
                   AS lang, n_chars
          FROM cur)
        SELECT 'a_served' AS phase, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
        UNION ALL
        SELECT 'b_stale_direct', lang, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT)
        FROM cur GROUP BY lang
        UNION ALL
        SELECT 'c_reserved', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        FROM cur GROUP BY lang
        UNION ALL
        SELECT 'd_reserved2', lang, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT)
        FROM tagged GROUP BY lang
        ORDER BY phase, lang""")),

    // -------------------------------------------------------------- q283:
    // STATISTICS THAT SURVIVE COMMITS (VERDICT r16 item 4) — `CALL
    // system.refresh_stats` maintains the persisted column statistics
    // off the change feed: the append wave's slice updates each listed
    // MCV count EXACTLY (+op0/-op2 net per value), the not-null total
    // likewise, NDVs move to their sound upper bound, and freshness is
    // re-stamped — so the q277 salted-join shape survives the commit
    // without a corpus re-scan (AnalyzeSpec pins the plan; the
    // unlisted-overtake and negative-count refusals too). The query
    // builds an 80/10/fragmented key, analyzes top-2, appends a wave of
    // listed-value rows, refreshes, and emits the PERSISTED artifact
    // parsed back from the table property — the oracle recomputes the
    // base top-2 plus the wave's exact contributions from raw data, so
    // the refreshed stored counts are hash-checked end to end. At
    // 100 TB: stats maintenance costs O(changed rows), not O(corpus).
    QueryDef(
      "q283_refresh_stats",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.ord_rstats")
        Tables(s, d, "orders").createOrReplaceTempView("q283_orders")
        s.sql("""CREATE TABLE graft_cat.default.ord_rstats
                 (k STRING, o_orderkey BIGINT)
                 TBLPROPERTIES ('graft.row_id'='o_orderkey')""")
        s.sql("""INSERT INTO graft_cat.default.ord_rstats
                 SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'HOT'
                             WHEN o_orderkey % 10 = 8 THEN 'WARM'
                             ELSE concat('c', o_custkey % 40) END,
                        o_orderkey
                 FROM q283_orders""")
        s.sql("""CALL graft_cat.system.analyze(
                   table => 'default.ord_rstats', columns => 'k',
                   mcv => 2)""").collect()
        // the commit that would have killed the stats: an append wave
        // touching only LISTED values (the sound case — the overtake
        // guard proves no unlisted value could have entered the top-K)
        s.sql("""INSERT INTO graft_cat.default.ord_rstats
                 SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'HOT'
                             ELSE 'WARM' END,
                        o_orderkey + 10000000
                 FROM q283_orders WHERE o_orderkey % 3 = 0""")
        s.sql("""CALL graft_cat.system.refresh_stats(
                   table => 'default.ord_rstats')""").collect()
        // read back the refreshed PERSISTED artifact: `total|v:c;v:c`
        val enc = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.ord_rstats").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.stats.mcv.k" =>
              r.getString(1)
          }.getOrElse(throw new IllegalStateException(
            "refresh_stats did not keep graft.stats.mcv.k"))
        val Array(tot, list) = enc.split('|')
        val rows = ("__total", tot.toLong) +: list.split(';').toSeq.map {
          e =>
            val i = e.lastIndexOf(':')
            (java.net.URLDecoder.decode(e.take(i), "UTF-8"),
              e.drop(i + 1).toLong)
        }
        import s.implicits._
        rows.toDF("value", "cnt").orderBy(col("cnt").desc, col("value"))
      },
      Some("""
        WITH base AS (SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'HOT'
                                  WHEN o_orderkey % 10 = 8 THEN 'WARM'
                                  ELSE concat('c', CAST(o_custkey % 40
                                    AS VARCHAR)) END AS k
                      FROM orders),
        wave AS (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'HOT'
                             ELSE 'WARM' END AS k
                 FROM orders WHERE o_orderkey % 3 = 0),
        top2 AS (SELECT k AS value, COUNT(*) AS cnt FROM base
                 GROUP BY k ORDER BY cnt DESC, k LIMIT 2),
        wcnt AS (SELECT k, COUNT(*) AS cnt FROM wave GROUP BY k)
        SELECT value, cnt FROM (
          SELECT '__total' AS value,
                 CAST((SELECT COUNT(*) FROM base)
                      + (SELECT COUNT(*) FROM wave) AS BIGINT) AS cnt
          UNION ALL
          SELECT t.value,
                 CAST(t.cnt + coalesce(w.cnt, 0) AS BIGINT)
          FROM top2 t LEFT JOIN wcnt w ON t.value = w.k)
        ORDER BY cnt DESC, value""")),

    // -------------------------------------------------------------- q284:
    // STREAMING CoW CHANGE FEED (VERDICT r16 item 5) — `$changes` on a
    // keyed copy-on-write table gains the checkpointed streaming
    // variant the DV feed has had since q268: offsets ARE commit
    // versions, each micro-batch plans its (start, end] range through
    // the same file-diff walk as the batch read, so streamed slices
    // carry identical op-2/op-0 rows (removed files as keyed deletes,
    // added files as inserts, carried rows as canceling same-version
    // pairs). The pipeline: CoW corpus CTAS (v0) -> mirror seeds from
    // v0 -> curation DELETE + re-tag UPDATE + append INSERT ->
    // AvailableNow stream MERGE-applies the slice per micro-batch with
    // the standard collapse (per key, max __ver, insert wins within a
    // version). The mirror census is the oracle. CowChangeFeedSpec
    // pins stream ≡ batch row equality, checkpoint-resume exactly-once
    // delivery, and the trimmed-resume loud failure. At 100 TB a
    // downstream mirror follows a CoW table at O(rows the DML rewrote)
    // per trigger, checkpoint-resumable, with no bespoke version
    // bookkeeping.
    QueryDef(
      "q284_cow_stream_apply",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_cowf")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.corpus_cowtok")
        Tables(s, d, "documents").createOrReplaceTempView("q284_docs")
        s.sql("""CREATE TABLE graft_cat.default.corpus_cowf
                 TBLPROPERTIES ('graft.row_id'='doc_id')
                 AS SELECT doc_id, lang, n_chars
                 FROM q284_docs""")                        // version 0
        s.sql("""CREATE TABLE graft_cat.default.corpus_cowtok
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='doc_id')
                 AS SELECT doc_id, lang, n_chars,
                           CAST(n_chars DIV 4 AS BIGINT) AS tok
                 FROM graft_cat.default.corpus_cowf VERSION AS OF 0""")
        // CoW DML: whole-file rewrites — the feed streams the diff
        s.sql("""DELETE FROM graft_cat.default.corpus_cowf
                 WHERE n_chars % 7 = 3""")
        s.sql("""UPDATE graft_cat.default.corpus_cowf
                 SET lang = 'und' WHERE n_chars % 11 = 5""")
        s.sql("""INSERT INTO graft_cat.default.corpus_cowf
                 SELECT doc_id + 1000000, lang, n_chars + 1
                 FROM q284_docs WHERE n_chars % 13 = 6""")
        val ckpt = java.nio.file.Files
          .createTempDirectory("q284-ckpt-").toString
        val q = s.readStream
          .table("graft_cat.default.`corpus_cowf$changes`")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.createOrReplaceTempView("q284_batch")
              batch.sparkSession.sql("""
                MERGE INTO graft_cat.default.corpus_cowtok t
                USING (
                  SELECT doc_id, lang, n_chars, `__op` FROM (
                    SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY `__ver` DESC,
                               CASE WHEN `__op` = 0 THEN 0 ELSE 1 END)
                      AS rn
                    FROM q284_batch) WHERE rn = 1) c
                ON t.doc_id = c.doc_id
                WHEN MATCHED AND c.`__op` = 2 THEN DELETE
                WHEN MATCHED THEN UPDATE SET
                  lang = c.lang, n_chars = c.n_chars,
                  tok = CAST(c.n_chars DIV 4 AS BIGINT)
                WHEN NOT MATCHED AND c.`__op` = 0 THEN
                  INSERT (doc_id, lang, n_chars, tok)
                  VALUES (c.doc_id, c.lang, c.n_chars,
                          CAST(c.n_chars DIV 4 AS BIGINT))"""): Unit
          }
          .start()
        q.awaitTermination()
        s.sql("""SELECT lang, COUNT(*) AS n_docs,
                        SUM(n_chars) AS sum_chars, SUM(tok) AS sum_tok
                 FROM graft_cat.default.corpus_cowtok
                 GROUP BY lang ORDER BY lang""")
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 CASE WHEN n_chars % 11 = 5 THEN 'und' ELSE lang END
                   AS lang,
                 n_chars
          FROM documents WHERE n_chars % 7 <> 3
          UNION ALL
          SELECT doc_id + 1000000, lang, n_chars + 1
          FROM documents WHERE n_chars % 13 = 6)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_chars // 4) AS BIGINT) AS sum_tok
        FROM m GROUP BY lang ORDER BY lang""")),

    // -------------------------------------------------------------- q285:
    // ANN RE-TRAIN THROUGH THE ATOMIC SWAP (VERDICT r16 item 6) — the
    // model-v2 drift story end to end: an IVF index is built against
    // the v1 corpus (frozen codebook, the q275 contract), then EVERY
    // vector is re-encoded into a new embedding space (a deterministic
    // md5-seeded 20-cluster mixture, so DuckDB replays it bit-exactly),
    // after which the frozen centroids describe nothing. `CALL
    // system.reindex_ann` re-seeds the codebook from the CURRENT
    // corpus, re-assigns every vector in one scan, and lands
    // cells+assignments as ONE q279 multi-table publish — a searcher
    // never sees new assignments against old centroids. Output =
    // post-swap index census + the 2-cell probed top-10 search (the
    // partitioned-index literal-probe shape of q275); the oracle
    // recomputes the re-encoded corpus, the re-seeded codebook, and
    // the assignment from scratch, so the whole rebuild is
    // hash-checked through the swap. AnnRecallCurveSpec pins the
    // recall story (drift degrades, reindex restores). At 100 TB:
    // feed waves stay O(changed rows); this is the one-corpus-scan
    // scheduled re-train that keeps them meaningful.
    QueryDef(
      "q285_ann_reindex",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("emb_rx", "cells_rx", "idx_rx",
            "cells_rx_branch_reindex", "idx_rx_branch_reindex")
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "embeddings").createOrReplaceTempView("q285_src")
        s.sql("""CREATE TABLE graft_cat.default.emb_rx
                 TBLPROPERTIES ('graft.mode'='dv')
                 AS SELECT vec_id, embedding FROM q285_src""") // v0
        s.sql("""CREATE TABLE graft_cat.default.cells_rx
                 AS SELECT vec_id AS cell_id, embedding AS cb_emb
                 FROM graft_cat.default.emb_rx VERSION AS OF 0
                 WHERE vec_id < 16""")
        s.sql("""CREATE TABLE graft_cat.default.idx_rx
                 PARTITIONED BY (cell_id)
                 TBLPROPERTIES ('graft.mode'='mor',
                                'graft.row_id'='vec_id')
                 AS SELECT v.vec_id,
                           max_by(c.cell_id, named_struct(
                             'cd', cosine_sim(v.embedding, c.cb_emb),
                             'nc', -c.cell_id)) AS cell_id
                 FROM graft_cat.default.emb_rx VERSION AS OF 0 v
                 CROSS JOIN graft_cat.default.cells_rx c
                 GROUP BY v.vec_id""")
        // THE DRIFT WAVE: model-v2 re-encode of the ENTIRE corpus into
        // a new 16-dim space (20 md5-seeded cluster centers as plan
        // literals + linear-arithmetic jitter — both replayable in
        // DuckDB; floats rounded identically by the shared CAST)
        val dims = 16
        val kC = 20
        val centers = (0 until kC).map(c => (0 until dims).map(dd =>
          ((graft.util.Hashing.md5Long(s"rx:$c:$dd") % 2001) - 1000)
            / 1000.0))
        val ctrsSpark = centers
          .map(r => r.mkString("array(", ", ", ")"))
          .mkString("array(", ", ", ")")
        s.sql(s"""
          UPDATE graft_cat.default.emb_rx SET embedding =
            transform(sequence(0, ${dims - 1}), dd -> CAST(
              element_at(element_at($ctrsSpark,
                CAST(vec_id % $kC AS INT) + 1), dd + 1)
              + 0.15 * ((pmod(vec_id * (1000003 + dd * 7919)
                  + dd * 54321, 2001) - 1000) / 1000.0) AS FLOAT))""")
        // the corrective: re-seed + re-assign + atomic swap
        s.sql("""CALL graft_cat.system.reindex_ann(
                   table => 'default.emb_rx',
                   cells => 'default.cells_rx',
                   index => 'default.idx_rx',
                   ncells => 16)""").collect()
        // post-swap probe (the q275 literal-probe shape on the
        // partitioned index)
        val probed = s.sql("""
          SELECT DISTINCT cell_id FROM (
            SELECT c.cell_id,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY cosine_sim(q.embedding, c.cb_emb) DESC,
                              c.cell_id) AS rn
            FROM (SELECT vec_id, embedding
                  FROM graft_cat.default.emb_rx WHERE vec_id < 5) q
            CROSS JOIN graft_cat.default.cells_rx c) WHERE rn <= 2""")
          .collect().map(_.getLong(0)).sorted
        s.sql(s"""
          WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                     FROM graft_cat.default.emb_rx WHERE vec_id < 5),
          qc AS (SELECT query_id, q_emb, cell_id FROM (
                   SELECT query_id, q_emb, c.cell_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim(q_emb, c.cb_emb) DESC,
                                     c.cell_id) AS rn
                   FROM q CROSS JOIN graft_cat.default.cells_rx c)
                 WHERE rn <= 2),
          scored AS (
            SELECT qc.query_id, i.vec_id AS cand_id,
                   cosine_sim(qc.q_emb, v.embedding) AS cos
            FROM qc JOIN graft_cat.default.idx_rx i
                   ON qc.cell_id = i.cell_id
                 JOIN graft_cat.default.emb_rx v
                   ON i.vec_id = v.vec_id
            WHERE i.vec_id <> qc.query_id
              AND i.cell_id IN (${probed.mkString(", ")})),
          r AS (SELECT query_id, cand_id, cos,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, cand_id) AS rank
                FROM scored)
          SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
                 CAST(-1 AS BIGINT) AS k3, CAST(0.0 AS DOUBLE) AS score
          FROM graft_cat.default.idx_rx GROUP BY cell_id
          UNION ALL
          SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
                 round(cos, 6)
          FROM r WHERE rank <= 10
          ORDER BY phase, k1, k2""")
      },
      {
        val dims = 16
        val kC = 20
        val centers = (0 until kC).map(c => (0 until dims).map(dd =>
          ((graft.util.Hashing.md5Long(s"rx:$c:$dd") % 2001) - 1000)
            / 1000.0))
        val ctrsDuck = centers
          .map(r => r.mkString("[", ", ", "]"))
          .mkString("[", ", ", "]")
        Some(s"""
        WITH ctrs AS (SELECT $ctrsDuck AS m),
        cur AS (
          SELECT vec_id,
                 list_transform(generate_series(0, ${dims - 1}), dd ->
                   CAST(ctrs.m[CAST(vec_id % $kC AS INT) + 1][dd + 1]
                     + 0.15 * (((vec_id * (1000003 + dd * 7919)
                         + dd * 54321) % 2001) - 1000) / 1000.0
                     AS REAL)) AS embedding
          FROM embeddings, ctrs),
        vn AS (SELECT vec_id, embedding,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) norm
               FROM cur),
        cb AS (SELECT vec_id AS cell_id, embedding AS cb_emb,
                 sqrt(list_reduce(list_transform(
                   generate_series(1, len(embedding)),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2)) cb_norm
               FROM cur WHERE vec_id < 16),
        ass AS (SELECT vn.vec_id, vn.embedding, vn.norm, cb.cell_id,
                 list_reduce(list_transform(
                   generate_series(1, len(vn.embedding)),
                   i -> CAST(vn.embedding[i] AS DOUBLE)
                        * CAST(cb.cb_emb[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (vn.norm * cb.cb_norm) AS cd
                FROM vn CROSS JOIN cb),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cd DESC, cell_id) AS arn FROM ass),
        assigned AS (SELECT vec_id, embedding, norm, cell_id
                     FROM rk WHERE arn = 1),
        qc AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      norm AS q_norm, cell_id
               FROM rk WHERE vec_id < 5 AND arn <= 2),
        scored AS (SELECT q.query_id, a.vec_id AS cand_id, q.cell_id,
                 list_reduce(list_transform(
                   generate_series(1, len(q.q_emb)),
                   i -> CAST(q.q_emb[i] AS DOUBLE)
                        * CAST(a.embedding[i] AS DOUBLE)),
                   (a2, b2) -> a2 + b2) / (q.q_norm * a.norm) AS cos
                 FROM qc q JOIN assigned a USING (cell_id)
                 WHERE a.vec_id <> q.query_id),
        r AS (SELECT query_id, cand_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, cand_id) AS rank
              FROM scored)
        SELECT 'cell' AS phase, cell_id AS k1, COUNT(*) AS k2,
               CAST(-1 AS BIGINT) AS k3, CAST(0.0 AS DOUBLE) AS score
        FROM assigned GROUP BY cell_id
        UNION ALL
        SELECT 'knn', query_id, CAST(rank AS BIGINT), cand_id,
               round(cos, 6)
        FROM r WHERE rank <= 10
        ORDER BY phase, k1, k2""")
      }),

    // -------------------------------------------------------------- q286:
    // CONSISTENT-CUT PUBLISH FOR BASE + MV + STATISTICS (VERDICT r16
    // item 7) — q279's multi-table publish composed into the refresh
    // cycle: the base's wave, the MV's recomputation, AND the base's
    // statistics land as ONE visibility flip. The branch pair takes the
    // wave (base append + MV INSERT OVERWRITE + analyze on the base
    // branch); publish_tables stamps the MV's freshness PENDING (it
    // resolves at exactly the marker instant — MvRewrite.freshStamp)
    // and transfers the branch-computed MCV stamped with the base's
    // pending version (the existing version gate makes that flip
    // atomic for free). Before the flip readers serve the OLD MV
    // against the OLD base; after it, the NEW against the NEW — no
    // refusal window, no torn freshness (AtomicPublishSpec pins the
    // never-torn invariant under a racing reader and the immediate
    // post-publish MV serve). Output: the MV-eligible aggregate (which
    // serves from the published MV), the MV's direct content, and the
    // TRANSFERRED stats artifact parsed off the main table — the
    // oracle recomputes all three from the final truth, so the whole
    // cut is hash-checked. At 100 TB this is how a nightly build
    // publishes a fact table, its dashboard MVs, and its optimizer
    // statistics without a second of stale-or-refusing reads.
    QueryDef(
      "q286_consistent_cut_publish",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        Seq("orders_ccb_branch_cut", "orders_ccv_branch_cut",
            "orders_ccb", "orders_ccv")
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$t"))
        Tables(s, d, "orders").createOrReplaceTempView("q286_orders")
        s.sql("""CREATE TABLE graft_cat.default.orders_ccb
                 (o_orderpriority STRING, o_orderkey BIGINT)""")
        s.sql("""INSERT INTO graft_cat.default.orders_ccb
                 SELECT o_orderpriority, o_orderkey FROM q286_orders
                 WHERE o_orderkey % 3 != 0""")
        s.sql("""CREATE TABLE graft_cat.default.orders_ccv
                 (o_orderpriority STRING, key_sum BIGINT, n BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_ccb',
                   'graft.mv.group' = 'o_orderpriority',
                   'graft.mv.agg' =
                     'sum:o_orderkey:key_sum,count:*:n')""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_ccv
                 SELECT o_orderpriority, SUM(o_orderkey), COUNT(*)
                 FROM graft_cat.default.orders_ccb GROUP BY 1""")
        def ver(t: String): String = s.sql(
          s"SHOW TBLPROPERTIES graft_cat.default.$t").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.current_version" =>
              r.getString(1)
          }.get
        s.sql(s"""ALTER TABLE graft_cat.default.orders_ccv
                  SET TBLPROPERTIES
                  ('graft.mv.base_version' = '${ver("orders_ccb")}')""")
        s.sql("""ALTER TABLE graft_cat.default.orders_ccb
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_ccv')""")
        // THE CUT: wave + MV recompute + stats, all on branches...
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.orders_ccb', 'cut')")
        s.sql("CALL graft_cat.system.create_branch(" +
          "'default.orders_ccv', 'cut')")
        s.sql("""INSERT INTO graft_cat.default.orders_ccb_branch_cut
                 SELECT o_orderpriority, o_orderkey FROM q286_orders
                 WHERE o_orderkey % 3 = 0""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_ccv_branch_cut
                 SELECT o_orderpriority, SUM(o_orderkey), COUNT(*)
                 FROM graft_cat.default.orders_ccb_branch_cut
                 GROUP BY 1""")
        s.sql("""CALL graft_cat.system.analyze(
                   table => 'default.orders_ccb_branch_cut',
                   columns => 'o_orderpriority', mcv => 2)""").collect()
        // ...and ONE flip
        s.sql("""CALL graft_cat.system.publish_tables(
                   'default.orders_ccb,default.orders_ccv',
                   'cut')""").collect()
        Seq("orders_ccb_branch_cut", "orders_ccv_branch_cut")
          .foreach(t => s.sql(s"DROP TABLE graft_cat.default.$t"))
        // the transferred stats artifact, parsed off the MAIN table
        val enc = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.orders_ccb").collect()
          .collectFirst {
            case r if r.getString(0) ==
              "graft.stats.mcv.o_orderpriority" => r.getString(1)
          }.getOrElse(throw new IllegalStateException(
            "publish did not transfer graft.stats.mcv.o_orderpriority"))
        val Array(tot, list) = enc.split('|')
        val statRows = ("__total", tot.toLong) +:
          list.split(';').toSeq.map { e =>
            val i = e.lastIndexOf(':')
            (java.net.URLDecoder.decode(e.take(i), "UTF-8"),
              e.drop(i + 1).toLong)
          }
        import s.implicits._
        statRows.toDF("k", "v1")
          .selectExpr("'c_stats' AS phase", "k", "v1",
            "CAST(-1 AS BIGINT) AS v2")
          .createOrReplaceTempView("q286_stats")
        s.sql("""
          SELECT phase, k, v1, v2 FROM (
            SELECT 'a_mv_served' AS phase, o_orderpriority AS k,
                   SUM(o_orderkey) AS v1, COUNT(*) AS v2
            FROM graft_cat.default.orders_ccb GROUP BY 2
            UNION ALL
            SELECT 'b_mv_direct', o_orderpriority, key_sum, n
            FROM graft_cat.default.orders_ccv
            UNION ALL
            SELECT phase, k, v1, v2 FROM q286_stats)
          ORDER BY phase, k, v1""")
      },
      Some("""
        WITH truth AS (SELECT o_orderpriority AS k,
                              CAST(SUM(o_orderkey) AS BIGINT) AS v1,
                              COUNT(*) AS v2
                       FROM orders GROUP BY 1),
        top2 AS (SELECT k, v2 AS cnt FROM truth
                 ORDER BY cnt DESC, k LIMIT 2)
        SELECT phase, k, v1, v2 FROM (
          SELECT 'a_mv_served' AS phase, k, v1, v2 FROM truth
          UNION ALL
          SELECT 'b_mv_direct', k, v1, v2 FROM truth
          UNION ALL
          SELECT 'c_stats', k, cnt,
                 CAST(-1 AS BIGINT) FROM top2
          UNION ALL
          SELECT 'c_stats', '__total',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
                 CAST(-1 AS BIGINT))
        ORDER BY phase, k, v1"""))
  )

  // ---------------------------------------------------------------- q258:
  // MV ROLL-UP REWRITE (VERDICT r13 item 1) — the standard dashboard
  // case q251's exact-group gate refused: the MV is grouped by
  // (o_orderpriority, o_orderstatus); the query groups by a SUBSET of
  // that. Every rewritten aggregate is a RE-AGGREGATION over the MV's
  // partials (SUM of sums, SUM of count partials, MIN of mins, MAX of
  // maxes), so collapsing several MV rows per output group is the same
  // arithmetic — MvRewriteSpec pins the plan swap and the refusals
  // (superset grouping, type drift, DISTINCT). Three phases, all
  // MV-served at different roll-up depths: by-priority (strict subset),
  // by-priority over a WHERE on the OTHER MV group column (filter
  // commutes through the partials), and the GLOBAL aggregate (empty
  // subset). At 100 TB one (priority × status)-grained MV answers the
  // whole dashboard family corpus-scan-free.
  private lazy val q258Defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q258_mv_rollup",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_rub")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_ruv")
        s.sql("""CREATE TABLE graft_cat.default.orders_rub
                 (o_orderpriority STRING, o_orderstatus STRING,
                  o_orderkey BIGINT, o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q258_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_rub
                 SELECT o_orderpriority, o_orderstatus, o_orderkey,
                        o_totalprice FROM q258_orders""")
        s.sql("""CREATE TABLE graft_cat.default.orders_ruv
                 (o_orderpriority STRING, o_orderstatus STRING,
                  key_sum BIGINT, n BIGINT, min_price DOUBLE,
                  max_price DOUBLE)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_rub',
                   'graft.mv.group' = 'o_orderpriority,o_orderstatus',
                   'graft.mv.agg' = 'sum:o_orderkey:key_sum,count:*:n,min:o_totalprice:min_price,max:o_totalprice:max_price')""")
        s.sql("""INSERT OVERWRITE graft_cat.default.orders_ruv
                 SELECT o_orderpriority, o_orderstatus, SUM(o_orderkey),
                        COUNT(*), MIN(o_totalprice), MAX(o_totalprice)
                 FROM graft_cat.default.orders_rub GROUP BY 1, 2""")
        val v = s.sql(
          "SHOW TBLPROPERTIES graft_cat.default.orders_rub").collect()
          .collectFirst {
            case r if r.getString(0) == "graft.current_version" =>
              r.getString(1)
          }.get
        s.sql(s"""ALTER TABLE graft_cat.default.orders_ruv
                  SET TBLPROPERTIES ('graft.mv.base_version' = '$v')""")
        s.sql("""ALTER TABLE graft_cat.default.orders_rub
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_ruv')""")
        val p1 = s.sql(
          """SELECT 'by_priority' AS phase, o_orderpriority AS g,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n,
                    MIN(o_totalprice) AS min_price,
                    MAX(o_totalprice) AS max_price
             FROM graft_cat.default.orders_rub GROUP BY 2""")
        val p2 = s.sql(
          """SELECT 'by_priority_open' AS phase, o_orderpriority AS g,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n,
                    MIN(o_totalprice) AS min_price,
                    MAX(o_totalprice) AS max_price
             FROM graft_cat.default.orders_rub
             WHERE o_orderstatus = 'O' GROUP BY 2""")
        val p3 = s.sql(
          """SELECT 'global' AS phase, 'ALL' AS g,
                    SUM(o_orderkey) AS key_sum, COUNT(*) AS n,
                    MIN(o_totalprice) AS min_price,
                    MAX(o_totalprice) AS max_price
             FROM graft_cat.default.orders_rub""")
        p1.unionAll(p2).unionAll(p3).orderBy("phase", "g")
      },
      Some("""
        SELECT 'by_priority' AS phase, o_orderpriority AS g,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum, COUNT(*) AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'by_priority_open', o_orderpriority,
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*),
               MIN(o_totalprice), MAX(o_totalprice)
        FROM orders WHERE o_orderstatus = 'O' GROUP BY 2
        UNION ALL
        SELECT 'global', 'ALL',
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*),
               MIN(o_totalprice), MAX(o_totalprice)
        FROM orders
        ORDER BY phase, g""")),

    // ------------------------------------------------------------ q259:
    // ROW-LEVEL DML ON A HIDDEN-PARTITIONED TABLE (VERDICT r13 item 2)
    // — the production cycle a days(ts) table meets on day one:
    // ingest → MERGE repair (delete bad rows, correct others, backfill
    // new ones, including rows landing in BRAND-NEW day partitions) →
    // day-aligned DELETE, which is METADATA-ONLY (the day's file drops
    // from the manifest, nothing is rewritten — TransformPartitionSpec
    // pins the file-granular scope of every step: untouched days stay
    // byte-identical, rewritten files stay day-keyed). At 100 TB a
    // repair MERGE touches only the damaged days' files and a
    // retention DELETE of an old day is one commit, zero I/O.
    QueryDef(
      "q259_transform_dml",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.events_td")
        s.sql("""CREATE TABLE graft_cat.default.events_td
                 (event_id BIGINT, ts TIMESTAMP, value DOUBLE)
                 PARTITIONED BY (days(ts))""")
        Tables(s, d, "events").createOrReplaceTempView("q259_events")
        s.sql("""INSERT INTO graft_cat.default.events_td
                 SELECT event_id, ts, value FROM q259_events""")
        // repair changeset: drop %10=0, correct %10=1, backfill copies
        // of %10=2 shifted 30 days out (new day partitions)
        s.sql("""
          SELECT event_id AS k, 'D' AS op, ts, value FROM q259_events
          WHERE event_id % 10 = 0
          UNION ALL
          SELECT event_id, 'U', ts, value FROM q259_events
          WHERE event_id % 10 = 1
          UNION ALL
          SELECT event_id + 10000000, 'I', timestampadd(DAY, 30, ts),
                 value FROM q259_events WHERE event_id % 10 = 2
          """).createOrReplaceTempView("q259_changes")
        s.sql("""MERGE INTO graft_cat.default.events_td t
                 USING q259_changes c ON t.event_id = c.k
                 WHEN MATCHED AND c.op = 'D' THEN DELETE
                 WHEN MATCHED AND c.op = 'U' THEN
                   UPDATE SET value = t.value + 1000.0
                 WHEN NOT MATCHED THEN
                   INSERT (event_id, ts, value) VALUES (c.k, c.ts, c.value)""")
        // day-aligned retention DELETE: metadata-only file drop
        s.sql("""DELETE FROM graft_cat.default.events_td
                 WHERE ts >= TIMESTAMP'2024-01-20 00:00:00'
                   AND ts < TIMESTAMP'2024-01-21 00:00:00'""")
        s.sql("""
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS value_sum,
                 CAST(SUM(event_id) AS BIGINT) AS key_sum
          FROM graft_cat.default.events_td
          GROUP BY 1 ORDER BY day""")
      },
      Some("""
        WITH repaired AS (
          SELECT event_id,
                 ts,
                 CASE WHEN event_id % 10 = 1 THEN value + 1000.0
                      ELSE value END AS value
          FROM events WHERE event_id % 10 != 0
          UNION ALL
          SELECT event_id + 10000000, ts + INTERVAL 30 DAY, value
          FROM events WHERE event_id % 10 = 2)
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS value_sum,
               CAST(SUM(event_id) AS BIGINT) AS key_sum
        FROM repaired
        WHERE NOT (ts >= TIMESTAMP'2024-01-20 00:00:00'
               AND ts < TIMESTAMP'2024-01-21 00:00:00')
        GROUP BY 1 ORDER BY day""")),

    // ------------------------------------------------------------ q260:
    // STAR-SCHEMA MV (VERDICT r13 item 3) — the MV's definition is a
    // dim⨝fact aggregate (customer ⨝ orders grouped by market
    // segment); [[graft.plans.MvRewrite]]'s join arm redirects the
    // MATCHING join-aggregate to the tiny MV when BOTH constituents
    // are at their recorded commit versions, and a commit on EITHER
    // side staleness-kills it (MvRewriteSpec pins the plan swap, the
    // either-side staleness, the join-key/join-type refusals, and the
    // IsNotNull-constraint dropping). Three phases of the same user
    // query: served (fresh), direct (stale after a fact append),
    // re-served — the oracle recomputes each phase's truth from the
    // raw join. At 100 TB the dashboard's dim⨝fact rollup reads
    // |segments| pre-joined rows instead of re-joining the corpus.
    QueryDef(
      "q260_mv_join",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_jf")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.cust_jd")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_jmv")
        s.sql("""CREATE TABLE graft_cat.default.orders_jf
                 (o_custkey BIGINT, o_orderkey BIGINT)""")
        s.sql("""CREATE TABLE graft_cat.default.cust_jd
                 (c_custkey BIGINT, c_mktsegment STRING)""")
        Tables(s, d, "orders").createOrReplaceTempView("q260_orders")
        Tables(s, d, "customer").createOrReplaceTempView("q260_customer")
        s.sql("""INSERT INTO graft_cat.default.orders_jf
                 SELECT o_custkey, o_orderkey FROM q260_orders
                 WHERE o_orderkey % 2 = 0""")
        s.sql("""INSERT INTO graft_cat.default.cust_jd
                 SELECT c_custkey, c_mktsegment FROM q260_customer""")
        s.sql("""CREATE TABLE graft_cat.default.orders_jmv
                 (c_mktsegment STRING, key_sum BIGINT, n BIGINT)
                 TBLPROPERTIES (
                   'graft.mv.of' = 'default/orders_jf',
                   'graft.mv.join_dim' = 'default/cust_jd',
                   'graft.mv.join_on' = 'o_custkey=c_custkey',
                   'graft.mv.group' = 'c_mktsegment',
                   'graft.mv.agg' = 'sum:o_orderkey:key_sum,count:*:n')""")
        def refresh(): Unit = {
          s.sql("""INSERT OVERWRITE graft_cat.default.orders_jmv
                   SELECT c.c_mktsegment, SUM(f.o_orderkey), COUNT(*)
                   FROM graft_cat.default.orders_jf f
                   JOIN graft_cat.default.cust_jd c
                     ON f.o_custkey = c.c_custkey
                   GROUP BY 1""")
          def ver(t: String): String = s.sql(
            s"SHOW TBLPROPERTIES graft_cat.default.$t").collect()
            .collectFirst {
              case r if r.getString(0) == "graft.current_version" =>
                r.getString(1)
            }.get
          s.sql(s"""ALTER TABLE graft_cat.default.orders_jmv
                    SET TBLPROPERTIES (
                      'graft.mv.base_version' = '${ver("orders_jf")}',
                      'graft.mv.dim_version' = '${ver("cust_jd")}')""")
        }
        refresh()
        s.sql("""ALTER TABLE graft_cat.default.orders_jf
                 SET TBLPROPERTIES ('graft.mv.tables' = 'orders_jmv')""")
        def phase(name: String) = s.sql(
          s"""SELECT '$name' AS phase, c.c_mktsegment,
                     SUM(f.o_orderkey) AS key_sum, COUNT(*) AS n
              FROM graft_cat.default.orders_jf f
              JOIN graft_cat.default.cust_jd c
                ON f.o_custkey = c.c_custkey
              GROUP BY 2""")
        val shape = phase("served")
        val p1 = shape.collect()
        s.sql("""INSERT INTO graft_cat.default.orders_jf
                 SELECT o_custkey, o_orderkey FROM q260_orders
                 WHERE o_orderkey % 2 = 1""")
        val p2 = phase("stale_direct").collect()
        refresh()
        val p3 = phase("reserved").collect()
        import scala.jdk.CollectionConverters._
        s.createDataFrame((p1 ++ p2 ++ p3).toSeq.asJava, shape.schema)
          .orderBy("phase", "c_mktsegment")
      },
      Some("""
        SELECT 'served' AS phase, c_mktsegment,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey % 2 = 0 GROUP BY 2
        UNION ALL
        SELECT 'stale_direct', c_mktsegment,
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*)
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 2
        UNION ALL
        SELECT 'reserved', c_mktsegment,
               CAST(SUM(o_orderkey) AS BIGINT), COUNT(*)
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 2
        ORDER BY phase, c_mktsegment""")),

    // ------------------------------------------------------------ q261:
    // BRANCH LIFECYCLE COMPLETION (VERDICT r13 item 5) — q252 proved
    // fork→repair→publish; this adds the RETIREMENT verbs:
    // `system.drop_branch` drops a published/fresh branch, REFUSES a
    // branch holding unpublished content (that's what fast_forward is
    // for — silent drops would discard audited work) unless forced,
    // and a force-drop of a junk branch provably leaves main
    // byte-untouched (BranchSpec additionally pins that main's
    // expire_snapshots can never GC bytes a live branch references —
    // hard links are independent directory entries). Phases: backfill
    // published + branch dropped; junk branch force-dropped with main
    // intact; `$refs` census confirming zero branches remain.
    QueryDef(
      "q261_branch_lifecycle",
      (s, d) => {
        s.conf.set("spark.sql.catalog.graft_cat",
          classOf[GraftCatalog].getName)
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_bl_branch_fill")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_bl_branch_junk")
        s.sql("DROP TABLE IF EXISTS graft_cat.default.orders_bl")
        s.sql("""CREATE TABLE graft_cat.default.orders_bl
                 (o_orderkey BIGINT, o_totalprice DOUBLE)""")
        Tables(s, d, "orders").createOrReplaceTempView("q261_orders")
        s.sql("""INSERT INTO graft_cat.default.orders_bl
                 SELECT o_orderkey, o_totalprice FROM q261_orders
                 WHERE o_orderkey % 5 != 4""")
        // backfill the missing rows on a branch, publish, retire it
        s.sql("CALL graft_cat.system.create_branch('default.orders_bl', 'fill')")
        s.sql("""INSERT INTO graft_cat.default.orders_bl_branch_fill
                 SELECT o_orderkey, o_totalprice FROM q261_orders
                 WHERE o_orderkey % 5 = 4""")
        s.sql("CALL graft_cat.system.fast_forward('default.orders_bl', 'fill')")
        s.sql("CALL graft_cat.system.drop_branch('default.orders_bl', 'fill')")
        val p1 = s.sql(
          """SELECT 'published' AS phase, COUNT(*) AS n,
                    SUM(o_orderkey) AS key_sum
             FROM graft_cat.default.orders_bl""")
        // a junk branch force-drops without touching main
        s.sql("CALL graft_cat.system.create_branch('default.orders_bl', 'junk')")
        s.sql("DELETE FROM graft_cat.default.orders_bl_branch_junk " +
          "WHERE o_orderkey % 2 = 0")
        s.sql("CALL graft_cat.system.drop_branch('default.orders_bl', " +
          "'junk', 'true')")
        val p2 = s.sql(
          """SELECT 'post_force_drop' AS phase, COUNT(*) AS n,
                    SUM(o_orderkey) AS key_sum
             FROM graft_cat.default.orders_bl""")
        val p3 = s.sql(
          """SELECT 'branches_left' AS phase, COUNT(*) AS n,
                    CAST(0 AS BIGINT) AS key_sum
             FROM graft_cat.default.`orders_bl$refs`
             WHERE kind = 'branch'""")
        p1.unionAll(p2).unionAll(p3).orderBy("phase")
      },
      Some("""
        SELECT 'published' AS phase, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
        UNION ALL
        SELECT 'post_force_drop', COUNT(*),
               CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'branches_left', 0, 0
        ORDER BY phase"""))
  )

  /** Drop + CTAS-seed a merge-on-read table from `orders` (no merge —
    * q195/q196 apply their own single-statement DML on top). */
  private def seedMorPlain(s: org.apache.spark.sql.SparkSession,
      d: String, table: String, prefix: String): Unit = {
    s.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
    s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$table")
    Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(s"${prefix}_seed")
    s.sql(s"""CREATE TABLE graft_cat.default.$table
              TBLPROPERTIES ('graft.mode'='mor',
                             'graft.row_id'='o_orderkey')
              AS SELECT * FROM ${prefix}_seed""")
  }

  /** Any graft_cat default-namespace table handle, by name. */
  private[graft] def catalogTable(
      s: org.apache.spark.sql.SparkSession, name: String): GraftTable =
    s.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), name))
      .asInstanceOf[GraftTable]

  /** The q186/q187 MOR table handle, post-setup. */
  private[graft] def morTable(
      s: org.apache.spark.sql.SparkSession): GraftDeltaTable =
    s.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "orders_mor"))
      .asInstanceOf[GraftDeltaTable]

  /** Shared setup: drop, CTAS-seed (commit -> version 0), and MERGE the
    * deterministic changeset (commit -> version 1). ONE body for the
    * copy-on-write (q182/q184) and merge-on-read (q186/q187) tables —
    * the two variants are asserted to share an oracle, so they must
    * share the statement text; only the table name and TBLPROPERTIES
    * differ. Re-runs rebuild from scratch, so the commit history is
    * always exactly [seed, merged] no matter how often queries ran. */
  private def seedAndMergeInto(s: org.apache.spark.sql.SparkSession,
      d: String, table: String, tblProps: String, prefix: String): Unit = {
    s.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
    s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$table")
    Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("action", lit("kept"))
      .createOrReplaceTempView(s"${prefix}_snap")
    graft.relational.Temporal.cdcChangeset(s, d)
      .createOrReplaceTempView(s"${prefix}_changes")
    s.sql(s"""CREATE TABLE graft_cat.default.$table $tblProps
              AS SELECT * FROM ${prefix}_snap""")
    s.sql(s"""
      MERGE INTO graft_cat.default.$table t
      USING ${prefix}_changes c
      ON t.o_orderkey = c.k
      WHEN MATCHED AND c.op = 'D' THEN DELETE
      WHEN MATCHED AND c.op = 'U' THEN
        UPDATE SET o_totalprice = c.new_price, action = 'updated'
      WHEN NOT MATCHED THEN
        INSERT (o_orderkey, o_custkey, o_totalprice, o_orderdate, action)
        VALUES (c.k, CAST(NULL AS BIGINT), c.new_price,
                CAST(NULL AS TIMESTAMP), 'inserted')""")
  }

  private def seedAndMerge(s: org.apache.spark.sql.SparkSession,
      d: String): Unit =
    seedAndMergeInto(s, d, "orders_state", "", "q182")

  private[graft] def seedAndMergeMor(s: org.apache.spark.sql.SparkSession,
      d: String): Unit =
    seedAndMergeInto(s, d, "orders_mor",
      "TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='o_orderkey')",
      "q186")
}
