package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** DSv2 managed-table catalog: DDL + the full row-level DML surface.
  * q182 drives MERGE through the declared-query gate; this spec covers
  * the rest of the seam — UPDATE, DELETE, INSERT, truncate-overwrite,
  * rename, multi-partition writes — and the snapshot-isolation contract.
  */
class GraftCatalogSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gtest.default.t")
  }

  test("CREATE TABLE + INSERT + SELECT roundtrip, multi-partition write") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    // 8-partition source: writers commit per partition, commit() folds
    // the messages — the distributed-write path, not a coalesce(1)
    spark.range(100).repartition(8)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"),
        (col("id") * 1.5).as("x"))
      .createOrReplaceTempView("src100")
    sql("INSERT INTO gtest.default.t SELECT * FROM src100")
    assert(sql("SELECT count(*) FROM gtest.default.t").head().getLong(0) == 100)
    assert(sql("SELECT v FROM gtest.default.t WHERE k = 42").head()
      .getString(0) == "v42")
    // append accumulates; INSERT OVERWRITE truncates first
    sql("INSERT INTO gtest.default.t VALUES (1000, 'extra', 0.0)")
    assert(sql("SELECT count(*) FROM gtest.default.t").head().getLong(0) == 101)
    sql("INSERT OVERWRITE gtest.default.t VALUES (1, 'only', 2.0)")
    assert(sql("SELECT k, v FROM gtest.default.t").collect().map(_.toString)
      .toSeq == Seq("[1,only]"))
  }

  test("SQL UPDATE and DELETE rewrite through the row-level operation") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    spark.range(10).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v"), col("id").cast("double").as("x"))
      .createOrReplaceTempView("src10")
    sql("INSERT INTO gtest.default.t SELECT * FROM src10")
    sql("UPDATE gtest.default.t SET v = 'updated', x = x * 10 WHERE k % 2 = 0")
    sql("DELETE FROM gtest.default.t WHERE k >= 8")
    val got = sql("SELECT k, v, x FROM gtest.default.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val exp = (0L until 8L).map(k =>
      if (k % 2 == 0) (k, "updated", k * 10.0) else (k, s"v$k", k.toDouble))
    assert(got == exp)
  }

  test("MERGE INTO end state equals the DataFrame cdcMerge (q182 ≡ q131)") {
    val a = SparkEntry.queries("q182_merge_into_sql")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q131_cdc_apply")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(a == b, s"MERGE SQL end state diverges: ${a.size} vs ${b.size} rows")
  }

  test("row-level rewrite plan shape: leading __row_operation marker " +
      "(the layout GraftWriterFactory strips by offset)") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    sql("INSERT INTO gtest.default.t VALUES (1, 'a', 1.0)")
    val plan = sql(
      "EXPLAIN EXTENDED UPDATE gtest.default.t SET v = 'u' WHERE k = 1")
      .head().getString(0)
    val optimized = plan.split("== Optimized Logical Plan ==")(1)
      .split("== Physical")(0)
    // the contract the writer's offset-strip relies on: ReplaceData's
    // query projects the marker FIRST, then the data columns in table
    // order. A Spark upgrade changing this must fail here, not corrupt.
    assert(optimized.contains("ReplaceData"),
      s"UPDATE no longer plans ReplaceData:\n$optimized")
    val projLine = optimized.linesIterator
      .find(_.contains("__row_operation")).getOrElse(
        fail(s"no __row_operation marker in:\n$optimized"))
    assert(projLine.matches(""".*Project \[\d+ AS __row_operation#\d+, k#.*"""),
      s"marker no longer leads the data columns: $projLine")
  }

  test("scans are snapshot-isolated from later commits") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    sql("INSERT INTO gtest.default.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    // plan (and capture the snapshot) BEFORE the delete commits
    val before = sql("SELECT k FROM gtest.default.t ORDER BY k")
    val planned = before.collect() // force with snapshot 1
    sql("DELETE FROM gtest.default.t WHERE k = 1")
    assert(planned.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(sql("SELECT k FROM gtest.default.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("merge-on-read: same MERGE, delta-sized writes, base untouched") {
    // run the MOR merge, then pin the trade's observable: the base
    // still holds every seeded row, the delta log holds exactly the
    // |changeset| entries, and the read-back equals the one-shot MERGE
    graft.catalog.CatalogQueries.seedAndMergeMor(spark, sfDir)
    val got = spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, action
         FROM graft_cat.default.orders_mor ORDER BY o_orderkey""")
      .collect().map(_.toString).toSeq
    val oneShot = SparkEntry.queries("q131_cdc_apply")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == oneShot, "MOR merge end state != one-shot MERGE")
    val nOrders = Tables(spark, sfDir, "orders").count()
    val nChanges = graft.relational.Temporal.cdcChangeset(spark, sfDir).count()
    val t = graft.catalog.CatalogQueries.morTable(spark)
    assert(t.baseRowCount == nOrders,
      s"MOR base was rewritten: ${t.baseRowCount} != $nOrders")
    assert(t.deltaLogSize == nChanges,
      s"MOR log ${t.deltaLogSize} != changeset size $nChanges")
  }

  test("merge-on-read: UPDATE and DELETE also plan as delta writes") {
    setup()
    sql("DROP TABLE IF EXISTS gtest.default.mor")
    sql("""CREATE TABLE gtest.default.mor (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gtest.default.mor VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("UPDATE gtest.default.mor SET v = 'B' WHERE k = 2")
    sql("DELETE FROM gtest.default.mor WHERE k = 3")
    assert(sql("SELECT k, v FROM gtest.default.mor ORDER BY k").collect()
      .map(_.toString).toSeq == Seq("[1,a]", "[2,B]"))
    // delta path: 2 log entries, base still 3 rows
    val t = spark.sessionState.catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "mor"))
      .asInstanceOf[graft.catalog.GraftDeltaTable]
    assert(t.baseRowCount == 3 && t.deltaLogSize == 2,
      s"expected base=3/log=2, got base=${t.baseRowCount}/log=${t.deltaLogSize}")
    // INSERT OVERWRITE replaces the base AND clears the log — a stale
    // logged delete (k=3) must not replay over the fresh data
    sql("INSERT OVERWRITE gtest.default.mor VALUES (2, 'fresh2'), (3, 'fresh3')")
    assert(sql("SELECT k, v FROM gtest.default.mor ORDER BY k").collect()
      .map(_.toString).toSeq == Seq("[2,fresh2]", "[3,fresh3]"),
      "stale delta entries replayed over the overwritten base")
    assert(t.deltaLogSize == 0, "overwrite left delta entries behind")
    // rename moves the SAME table instance: the un-compacted log and the
    // merge-on-read kind both survive
    sql("UPDATE gtest.default.mor SET v = 'F3' WHERE k = 3")
    assert(t.deltaLogSize == 1)
    sql("DROP TABLE IF EXISTS gtest.default.mor2")
    sql("ALTER TABLE gtest.default.mor RENAME TO default.mor2")
    assert(sql("SELECT v FROM gtest.default.mor2 WHERE k = 3").head()
      .getString(0) == "F3", "rename dropped the delta log")
    sql("UPDATE gtest.default.mor2 SET v = 'f3b' WHERE k = 3")
    assert(t.deltaLogSize == 2, "renamed table no longer plans delta writes")
    sql("DROP TABLE gtest.default.mor2")
  }

  test("MOR compaction folds the log into the base; content unchanged, " +
      "second compaction is a no-op") {
    graft.catalog.CatalogQueries.seedAndMergeMor(spark, sfDir)
    def content() = spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, action
         FROM graft_cat.default.orders_mor ORDER BY o_orderkey""")
      .collect().map(_.toString).toSeq
    val before = content()
    val t = graft.catalog.CatalogQueries.morTable(spark)
    assert(t.deltaLogSize > 0, "setup produced an empty delta log")
    t.compact(spark, "graft_cat.default.orders_mor")
    assert(content() == before, "compaction changed table content")
    assert(t.deltaLogSize == 0, "compaction left log entries behind")
    assert(t.baseRowCount == before.size.toLong,
      s"compacted base ${t.baseRowCount} != content ${before.size}")
    t.compact(spark, "graft_cat.default.orders_mor") // idempotent
    assert(content() == before && t.deltaLogSize == 0)
  }

  test("column pruning reaches the catalog scan (ReadSchema narrows)") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    sql("INSERT INTO gtest.default.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    val narrow = sql("SELECT v FROM gtest.default.t")
    val scanDesc = narrow.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema: struct<v:string>"),
      s"projection did not prune the scan:\n$scanDesc")
    assert(narrow.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // full-width read still intact
    assert(sql("SELECT k, v, x FROM gtest.default.t ORDER BY k")
      .collect().map(_.toString).toSeq == Seq("[1,a,1.0]", "[2,b,2.0]"))
  }

  test("streaming toTable: restart over the same checkpoint appends " +
      "nothing (epoch-id dedup)") {
    def content() = spark.sql(
      """SELECT user_id, event_type, value
         FROM graft_cat.default.events_live
         ORDER BY user_id, event_type, value""")
      .collect().map(_.toString).toSeq
    graft.streaming.Windows.streamToTable(spark, sfDir, fresh = true)
    val first = content()
    assert(first.nonEmpty, "stream landed no rows")
    // restart: same checkpoint, existing table — AvailableNow sees no
    // new files; any epoch Spark still re-runs must dedup by epoch id
    graft.streaming.Windows.streamToTable(spark, sfDir, fresh = false)
    assert(content() == first,
      "restart over the same checkpoint changed table content")
  }

  test("filter pushdown reaches the catalog scan; null semantics exact") {
    // accepted filters are TRUSTED (Spark drops the post-scan residual
    // for them), so the reader's evaluation must match SQL exactly —
    // especially comparisons over NULL cells, which must not satisfy
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    sql("""INSERT INTO gtest.default.t VALUES
           (1, 'a', 1.0), (2, NULL, 2.0), (3, 'c', NULL), (4, 'd', 4.0)""")
    val q = sql(
      "SELECT k FROM gtest.default.t WHERE x > 1.5 AND v IS NOT NULL")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L),
      "pushed filters evaluated differently than SQL")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThan(x,1.5)"),
      s"filters not pushed to the catalog scan:\n$plan")
    // unsupported shapes stay as post-scan residuals (and still work)
    assert(sql(
        "SELECT k FROM gtest.default.t WHERE v LIKE '%a%' OR x IS NULL")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // -0.0 under Spark's double ordering: equal to 0.0 — a trusted
    // pushed filter must agree (Double.compare alone would drop the row)
    sql("INSERT INTO gtest.default.t VALUES (5, 'z', CAST('-0.0' AS DOUBLE))")
    assert(sql("SELECT k FROM gtest.default.t WHERE x = 0.0").collect()
      .map(_.getLong(0)).toSeq == Seq(5L), "-0.0 = 0.0 violated by pushdown")
    assert(sql("SELECT k FROM gtest.default.t WHERE x < 0.0").collect()
      .isEmpty, "-0.0 < 0.0 wrongly satisfied by pushdown")
  }

  test("rename preserves content; drop removes it") {
    setup()
    sql("DROP TABLE IF EXISTS gtest.default.t2")
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    sql("INSERT INTO gtest.default.t VALUES (7, 'seven', 7.0)")
    // rename target is resolved in the SOURCE table's catalog — spell it
    // catalog-relative (a catalog-qualified target keeps the qualifier in
    // the Identifier namespace and would address a different table)
    sql("ALTER TABLE gtest.default.t RENAME TO default.t2")
    assert(sql("SELECT v FROM gtest.default.t2").head().getString(0) == "seven")
    intercept[Exception] { sql("SELECT * FROM gtest.default.t").collect() }
    sql("DROP TABLE gtest.default.t2")
    intercept[Exception] { sql("SELECT * FROM gtest.default.t2").collect() }
  }

  // ---- TopN / LIMIT file narrowing (q227) --------------------------------

  private def graftScanOf(df: org.apache.spark.sql.DataFrame)
      : graft.catalog.GraftScan =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.catalog.GraftScan] =>
        b.scan.asInstanceOf[graft.catalog.GraftScan]
    }.getOrElse(fail("no GraftScan in plan"))

  test("TopN/limit pushdown narrows a sorted table's scan to the " +
      "contributing span; nulls and filters refuse") {
    setup()
    // AQE would coalesce the range-distributed write into one file;
    // pin it off so the sorted insert lands one file per sort span
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
    sql("""CREATE TABLE gtest.default.t (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.sort_by'='k')""")
    spark.range(4000)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("topn_src")
    sql("INSERT INTO gtest.default.t SELECT * FROM topn_src")
    val total = graftScanOf(sql("SELECT * FROM gtest.default.t"))
      .plannedFileCount
    assert(total >= 4, s"sorted insert made only $total files")

    // ASC: the k smallest live in the first sorted span — one file read
    val asc = sql(
      "SELECT k, v FROM gtest.default.t ORDER BY k LIMIT 3")
    assert(graftScanOf(asc).plannedFileCount == 1,
      "ASC top-3 must read exactly the first span")
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))

    // DESC + secondary key: bound on the LEADING key only, still exact
    val desc = sql(
      "SELECT k, v FROM gtest.default.t ORDER BY k DESC, v LIMIT 2")
    assert(graftScanOf(desc).plannedFileCount == 1)
    assert(desc.collect().map(_.getLong(0)).toSeq == Seq(3999L, 3998L))

    // bare LIMIT: any rows do — cumulative row cover, not the whole table
    val lim = sql("SELECT k FROM gtest.default.t LIMIT 5")
    assert(graftScanOf(lim).plannedFileCount == 1)
    assert(lim.collect().length == 5)

    // a WHERE clause keeps the full filtered scan (rows per file are no
    // longer exact contributions) — Spark doesn't push, we double-guard
    val filt = sql(
      "SELECT k FROM gtest.default.t WHERE v LIKE 'v1%' ORDER BY k LIMIT 3")
    assert(filt.collect().map(_.getLong(0)).toSeq == Seq(1L, 10L, 11L))

    // nulls in the sort key refuse narrowing (null ordering is invisible
    // to min/max stats) but the answer stays Spark's: NULLS FIRST
    sql("DROP TABLE IF EXISTS gtest.default.tn")
    sql("CREATE TABLE gtest.default.tn (k BIGINT, v STRING)")
    sql("INSERT INTO gtest.default.tn VALUES (5,'a'), (NULL,'n'), (1,'b')")
    val wn = sql("SELECT v FROM gtest.default.tn ORDER BY k LIMIT 1")
    assert(wn.head().getString(0) == "n", "NULLS FIRST must survive")
    sql("DROP TABLE gtest.default.tn")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  // ---- MERGE WITH SCHEMA EVOLUTION (q232) --------------------------------

  test("MERGE WITH SCHEMA EVOLUTION auto-adds source columns on CoW " +
      "and MOR; plain MERGE still rejects unknown columns") {
    setup()
    sql("""CREATE TABLE gtest.default.t (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gtest.default.t VALUES (1,'a'), (2,'b')")
    sql("""CREATE OR REPLACE TEMP VIEW mse_src AS
           SELECT * FROM VALUES
             (CAST(2 AS BIGINT), 'B', 'upd'),
             (CAST(3 AS BIGINT), 'c', 'new') AS s(k, v, note)""")
    // without the clause, star-expansion silently IGNORES the extra
    // source column — the schema must not move
    sql("""MERGE INTO gtest.default.t t USING mse_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    assert(!sql("SELECT * FROM gtest.default.t").schema.fieldNames
      .contains("note"), "plain MERGE must not evolve the schema")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gtest.default.t t
           USING mse_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    val rows = sql(
      "SELECT k, v, note FROM gtest.default.t ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) "∅" else r.getString(2))).toSeq ==
      Seq((1L, "a", "∅"), (2L, "B", "upd"), (3L, "c", "new")),
      "pre-evolution rows must read NULL for the added column")
    // the evolution is a real schema commit: time travel predates it
    assert(!sql("SELECT * FROM gtest.default.t VERSION AS OF 0")
      .schema.fieldNames.contains("note"))
    sql("DROP TABLE gtest.default.t")
  }

  // ---- streaming admission control (q239) ----------------------------------

  test("maxFilesPerTrigger bounds catalog-stream micro-batches; " +
      "AvailableNow pins the end; change feed honors the same limit") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT)")
    (0 until 6).foreach(i => sql(s"INSERT INTO gtest.default.t VALUES ($i)"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("ac-ckpt-").toString
    spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("gtest.default.t")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.count(): Unit
      }
      .start().awaitTermination()
    assert(batches.toSeq == Seq(2L, 2L, 2L),
      s"expected 3 bounded batches of 2 files, got $batches")

    // the change feed honors the same option (1 delta file per batch)
    sql("DROP TABLE IF EXISTS gtest.default.tm")
    sql("""CREATE TABLE gtest.default.tm (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gtest.default.tm VALUES (1,'a'), (2,'b')")
    (0 until 3).foreach(i =>
      sql(s"UPDATE gtest.default.tm SET v = 'u$i' WHERE k = 1"))
    val cdc = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt2 = java.nio.file.Files.createTempDirectory("ac2-ckpt-").toString
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .table("gtest.default.`tm$changes`")
      .writeStream
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        cdc += b.count(): Unit
      }
      .start().awaitTermination()
    assert(cdc.toSeq == Seq(1L, 1L, 1L),
      s"expected 3 single-delta CDC batches, got $cdc")
    sql("DROP TABLE gtest.default.tm")
  }

  // ---- write-side target file size (q236) ----------------------------------

  test("graft.target_file_bytes: a 32-way small write coalesces to one " +
      "file via the advisory rebalance; unset tables keep task-per-file") {
    setup()
    sql("DROP TABLE IF EXISTS gtest.default.tt")
    def nFiles(n: String): Int = spark.sessionState.catalogManager
      .catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), n))
      .asInstanceOf[graft.catalog.GraftTable].currentFilePaths.size
    spark.range(2000).repartition(32)
      .selectExpr("id AS k", "concat('v', id) AS v")
      .createOrReplaceTempView("tfb_src")

    // without the property: one file per write task (the pileup shape)
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING)")
    sql("INSERT INTO gtest.default.t SELECT * FROM tfb_src")
    assert(nFiles("t") == 32, s"expected 32 task files, got ${nFiles("t")}")

    // with it: AQE rebalances the write toward ~64 MB partitions — the
    // whole 2000-row input coalesces into ONE file
    sql("""CREATE TABLE gtest.default.tt (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.target_file_bytes'='67108864')""")
    sql("INSERT INTO gtest.default.tt SELECT * FROM tfb_src")
    assert(nFiles("tt") == 1,
      s"advisory rebalance must coalesce to 1 file, got ${nFiles("tt")}")
    assert(sql("SELECT count(*) FROM gtest.default.tt").head()
      .getLong(0) == 2000)
    // property survives cold reload (it lives in the name index)
    graft.catalog.GraftCatalog.dropHandlesForTest()
    sql("INSERT INTO gtest.default.tt SELECT * FROM tfb_src")
    assert(nFiles("tt") == 2,
      "reloaded table must keep coalescing writes")
    sql("DROP TABLE gtest.default.tt")
  }

  // ---- small-file bin packing + _file pruning (q235) ----------------------

  test("rewrite_small_files packs only sub-threshold files in one " +
      "atomic commit; _file predicates prune the scan to named files") {
    setup()
    val savedAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING)")
    // one BIG file (stays), then a pileup of small appends (packed)
    spark.range(20000).repartition(1)
      .select(col("id").as("k"), concat(lit("big"), col("id")).as("v"))
      .createOrReplaceTempView("rsf_big")
    sql("INSERT INTO gtest.default.t SELECT * FROM rsf_big")
    (0 until 4).foreach { i =>
      sql(s"INSERT INTO gtest.default.t VALUES (${100000 + i}, 'small$i')")
    }
    def refs() = spark.sessionState.catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "t"))
      .asInstanceOf[graft.catalog.GraftTable].stateNow.current.get.files
    val before = refs()
    assert(before.size == 5)
    val bigPath = before.maxBy(_.bytes).path

    // _file equality prunes the scan to exactly one file
    val q1 = sql(s"SELECT count(k) AS n FROM gtest.default.t " +
      s"WHERE _file = '$bigPath'")
    assert(q1.head().getLong(0) == 20000)
    val qf = sql(s"SELECT k FROM gtest.default.t WHERE _file = '$bigPath'")
    assert(graftScanOf(qf).plannedFileCount == 1,
      "_file equality must open exactly the named file")

    // pack: threshold sits between the small files and the big one
    val r = sql("CALL gtest.system.rewrite_small_files('default.t', " +
      s"min_bytes => ${before.maxBy(_.bytes).bytes})").head()
    assert(r.getLong(0) == 4 && r.getLong(1) >= 1 && r.getLong(2) == 4,
      s"expected 4 packed/4 rows moved, got $r")
    val after = refs()
    assert(after.exists(_.path == bigPath),
      "the big file must survive byte-identical (same path)")
    assert(after.size < before.size)
    assert(sql("SELECT count(*) FROM gtest.default.t").head().getLong(0)
      == 20004)
    assert(sql("SELECT v FROM gtest.default.t WHERE k = 100002").head()
      .getString(0) == "small2")
    // idempotent: a second run finds nothing to pack
    val r2 = sql("CALL gtest.system.rewrite_small_files('default.t', " +
      s"min_bytes => ${before.maxBy(_.bytes).bytes})").head()
    assert(r2.getLong(1) == 0, "second pack must be a no-op")

    // clustered tables route to compact instead — loud reject
    sql("DROP TABLE IF EXISTS gtest.default.ts")
    sql("""CREATE TABLE gtest.default.ts (k BIGINT)
           TBLPROPERTIES ('graft.sort_by'='k')""")
    intercept[Exception] {
      sql("CALL gtest.system.rewrite_small_files('default.ts')")
    }
    sql("DROP TABLE gtest.default.ts")
    } finally savedAqe.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  // ---- atomic CTAS / RTAS via StagingTableCatalog (q234) ------------------

  test("CREATE OR REPLACE TABLE is atomic: a failed replacement write " +
      "leaves the previous table intact; staged storage is cleaned") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING)")
    sql("INSERT INTO gtest.default.t VALUES (1,'keep'), (2,'keep')")
    def warehouseDirs(): Set[String] = {
      val wh = java.nio.file.Paths.get(spark.sessionState.catalogManager
        .catalog("gtest").asInstanceOf[graft.catalog.GraftCatalog]
        .warehousePath)
      val s = java.nio.file.Files.list(wh)
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val before = warehouseDirs()

    // a replacement whose WRITE fails must abort to the previous table
    intercept[Exception] {
      sql("""CREATE OR REPLACE TABLE gtest.default.t AS
             SELECT raise_error('mid-write failure') AS v""")
    }
    assert(sql("SELECT count(*) FROM gtest.default.t").head().getLong(0)
      == 2, "failed RTAS must leave the previous table intact")
    assert(sql("SELECT v FROM gtest.default.t WHERE k = 1").head()
      .getString(0) == "keep")
    assert(warehouseDirs() == before,
      "aborted staging must remove its directory")

    // a successful replacement swaps content AND storage atomically
    sql("""CREATE OR REPLACE TABLE gtest.default.t AS
           SELECT CAST(9 AS BIGINT) AS k, 'new' AS v""")
    assert(sql("SELECT k, v FROM gtest.default.t").collect()
      .map(_.toString).toSeq == Seq("[9,new]"))
    // the replaced table's old storage is gone (no orphaned dirs)
    assert(warehouseDirs().size == before.size,
      "the replaced table's old directory must be dropped at swap")

    // REPLACE TABLE on a missing name rejects; OR REPLACE creates
    sql("DROP TABLE gtest.default.t")
    intercept[Exception] {
      sql("REPLACE TABLE gtest.default.t AS SELECT 1 AS x")
    }
    sql("CREATE OR REPLACE TABLE gtest.default.t AS SELECT 1 AS x")
    assert(sql("SELECT x FROM gtest.default.t").head().getInt(0) == 1)
    sql("DROP TABLE gtest.default.t")
  }

  // ---- partition-scoped compaction (q233) --------------------------------

  test("compact WHERE rewrites only the matching partitions; others " +
      "stay byte-identical; undecidable predicates reject") {
    setup()
    sql("""CREATE TABLE gtest.default.t (k BIGINT, p STRING)
           PARTITIONED BY (p)""")
    // three inserts -> three small files per partition value
    (1 to 3).foreach { i =>
      sql(s"INSERT INTO gtest.default.t VALUES ($i, 'a'), (${i + 10}, 'b')")
    }
    def filesOf(part: String): Vector[String] = spark.sessionState
      .catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "t"))
      .asInstanceOf[graft.catalog.GraftTable].stateNow.current.get.files
      .filter(_.stats("p").min.contains(part)).map(_.path)
    val aBefore = filesOf("a")
    val bBefore = filesOf("b")
    assert(aBefore.size == 3 && bBefore.size == 3)

    val r = sql(
      "CALL gtest.system.compact('default.t', where => \"p = 'a'\")").head()
    assert(r.getLong(0) == 6 && r.getLong(2) == 4,
      s"expected 6 -> 4 files, got ${r.getLong(0)} -> ${r.getLong(2)}")
    assert(filesOf("a").size == 1, "partition a must compact to one file")
    assert(filesOf("b") == bBefore,
      "partition b's files must survive BYTE-IDENTICAL (same paths)")
    assert(sql("SELECT k FROM gtest.default.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 11L, 12L, 13L))

    // a value predicate the partition layout can't decide rejects loudly
    intercept[Exception] {
      sql("CALL gtest.system.compact('default.t', where => 'k < 2')")
    }
  }

  // ---- zero-copy clone (q230) --------------------------------------------

  test("system.clone: hard-linked content, independent lifecycles, " +
      "MOR gate, cold reload") {
    setup()
    sql("DROP TABLE IF EXISTS gtest.default.cl")
    sql("DROP TABLE IF EXISTS gtest.default.cl2")
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING)")
    spark.range(500).repartition(4)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("clone_src")
    sql("INSERT INTO gtest.default.t SELECT * FROM clone_src")

    val r = sql("CALL gtest.system.clone('default.t', 'default.cl')").head()
    assert(r.getLong(1) == 500, "clone must report the linked row count")
    assert(sql("SELECT count(*) FROM gtest.default.cl").head().getLong(0)
      == 500)
    // zero-copy: the clone's files are HARD LINKS of the source's
    def tblFiles(n: String): Vector[String] = spark.sessionState
      .catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), n))
      .asInstanceOf[graft.catalog.GraftTable].currentFilePaths
    val srcFiles = tblFiles("t").sorted
    val clFiles = tblFiles("cl").sorted
    assert(clFiles.size == srcFiles.size && clFiles != srcFiles)
    assert(srcFiles.zip(clFiles).forall { case (a, b) =>
      java.nio.file.Files.isSameFile(java.nio.file.Paths.get(a),
        java.nio.file.Paths.get(b)) }, "clone files must share inodes")

    // independence: DML on the clone never touches the source...
    sql("DELETE FROM gtest.default.cl WHERE k < 100")
    assert(sql("SELECT count(*) FROM gtest.default.cl").head().getLong(0)
      == 400)
    assert(sql("SELECT count(*) FROM gtest.default.t").head().getLong(0)
      == 500)
    // ...and DROPPING the source leaves the clone fully readable
    sql("DROP TABLE gtest.default.t")
    assert(sql("SELECT count(*) FROM gtest.default.cl").head().getLong(0)
      == 400)
    assert(sql("SELECT v FROM gtest.default.cl WHERE k = 250").head()
      .getString(0) == "v250")

    // a cold reload serves the clone from its persisted log + index
    graft.catalog.GraftCatalog.dropHandlesForTest()
    assert(sql("SELECT count(*) FROM gtest.default.cl").head().getLong(0)
      == 400)

    // versioned clone: fork a RETAINED snapshot or tag, not the head —
    // the fork reads the content (and SCHEMA) as of that version
    sql("DROP TABLE IF EXISTS gtest.default.tv")
    sql("DROP TABLE IF EXISTS gtest.default.tv0")
    sql("DROP TABLE IF EXISTS gtest.default.tvt")
    sql("CREATE TABLE gtest.default.tv (k BIGINT)")
    sql("INSERT INTO gtest.default.tv VALUES (1), (2)") // v0
    sql("CALL gtest.system.tag('default.tv', 'golden')") // v1 (tag pin)
    sql("DELETE FROM gtest.default.tv WHERE k = 1") // v2
    sql("""CALL gtest.system.clone('default.tv', 'default.tv0',
           version => '0')""")
    assert(sql("SELECT k FROM gtest.default.tv0 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "version-0 clone must read the pre-DELETE content")
    sql("""CALL gtest.system.clone('default.tv', 'default.tvt',
           version => 'golden')""")
    assert(sql("SELECT count(*) FROM gtest.default.tvt").head()
      .getLong(0) == 2, "tag clone must fork the pinned snapshot")
    assert(sql("SELECT count(*) FROM gtest.default.tv").head()
      .getLong(0) == 1, "the source head is unaffected")
    intercept[Exception] {
      sql("""CALL gtest.system.clone('default.tv', 'default.tvx',
             version => 'nope')""")
    }
    Seq("tv", "tv0", "tvt").foreach(t =>
      sql(s"DROP TABLE gtest.default.$t"))

    // MOR with a LIVE delta log clones verbatim — including the
    // fence-sensitive delete-then-re-add shape: the tombstone for the
    // ORIGINAL k=1 must keep fencing only the pre-delete base files in
    // the clone, so the re-added k=1 survives the fold on both sides
    sql("DROP TABLE IF EXISTS gtest.default.tm")
    sql("""CREATE TABLE gtest.default.tm (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gtest.default.tm VALUES (1,'a'), (2,'b')")
    sql("DELETE FROM gtest.default.tm WHERE k = 1") // delta tombstone
    sql("INSERT INTO gtest.default.tm VALUES (1,'reborn')") // post-fence
    sql("UPDATE gtest.default.tm SET v = 'z' WHERE k = 2") // live delta
    sql("CALL gtest.system.clone('default.tm', 'default.cl2')")
    assert(sql("SELECT v FROM gtest.default.cl2 ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("reborn", "z"),
      "live-delta clone must fold identically (fences preserved)")
    // the clone is itself a MOR table: DML and compaction independent
    sql("UPDATE gtest.default.cl2 SET v = 'q' WHERE k = 2")
    sql("CALL gtest.system.compact('default.cl2')")
    assert(sql("SELECT v FROM gtest.default.cl2 ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("reborn", "q"))
    assert(sql("SELECT v FROM gtest.default.tm ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("reborn", "z"),
      "clone-side DML/compaction must never touch the source")
    sql("DROP TABLE gtest.default.tm")
    sql("DROP TABLE gtest.default.cl")
    sql("DROP TABLE gtest.default.cl2")
  }

  // ---- per-file bloom filters (q228) -------------------------------------

  test("bloom file skipping: point lookups and IN-lists prune files " +
      "whose bloom proves absence; survives cold reload; rename rejected") {
    setup()
    // AQE wraps the plan in an adaptive leaf — pin it off so the
    // GraftScan probe can see the BatchScan
    val savedAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    sql("""CREATE TABLE gtest.default.t (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.bloom_by'='v')""")
    // two files with FULLY OVERLAPPING k and v ranges: min/max stats
    // can never tell them apart — only the bloom can
    spark.range(0, 2000, 2).repartition(1)
      .select(col("id").as("k"), format_string("s%04d", col("id")).as("v"))
      .createOrReplaceTempView("bloom_even")
    spark.range(1, 2000, 2).repartition(1)
      .select(col("id").as("k"), format_string("s%04d", col("id")).as("v"))
      .createOrReplaceTempView("bloom_odd")
    sql("INSERT INTO gtest.default.t SELECT * FROM bloom_even")
    sql("INSERT INTO gtest.default.t SELECT * FROM bloom_odd")
    val total = graftScanOf(sql("SELECT * FROM gtest.default.t"))
      .plannedFileCount
    assert(total == 2, s"expected 2 data files, got $total")

    // value only in the even file: the odd file's bloom excludes it
    val q1 = sql("SELECT k FROM gtest.default.t WHERE v = 's0042'")
    assert(graftScanOf(q1).plannedFileCount == 1,
      "bloom must prune the file provably not containing the value")
    assert(q1.head().getLong(0) == 42)
    // absent everywhere: zero files open
    val q0 = sql("SELECT k FROM gtest.default.t WHERE v = 'zzzz'")
    assert(graftScanOf(q0).plannedFileCount == 0)
    assert(q0.collect().isEmpty)
    // IN-list spanning both parities keeps both; all-even list keeps one
    val qi = sql(
      "SELECT k FROM gtest.default.t WHERE v IN ('s0042', 's0100') ORDER BY k")
    assert(graftScanOf(qi).plannedFileCount == 1)
    assert(qi.collect().map(_.getLong(0)).toSeq == Seq(42L, 100L))

    // blooms live in the commit log: a cold reload still prunes
    graft.catalog.GraftCatalog.dropHandlesForTest()
    val qc = sql("SELECT k FROM gtest.default.t WHERE v = 's0041'")
    assert(graftScanOf(qc).plannedFileCount == 1)
    assert(qc.head().getLong(0) == 41)

    // the writer binds bloom columns by name: renaming one would
    // silently stop blooming new files — loud reject like other layout
    // columns
    intercept[Exception] {
      sql("ALTER TABLE gtest.default.t RENAME COLUMN v TO w")
    }
    // non-bloom-able type at CREATE rejects loudly
    sql("DROP TABLE IF EXISTS gtest.default.tb")
    intercept[Exception] {
      sql("""CREATE TABLE gtest.default.tb (k BIGINT, x DOUBLE)
             TBLPROPERTIES ('graft.bloom_by'='x')""")
    }
    } finally savedAqe.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
      spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  // ---- manifest-served aggregate pushdown (q226) -------------------------

  private def plansLocal(q: String): Boolean = {
    val p = sql(q).queryExecution.executedPlan.toString
    p.contains("LocalTableScan") && !p.contains("BatchScan")
  }

  test("agg pushdown: COUNT/MIN/MAX served from the manifest, " +
      "zero data files opened") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, v STRING, x DOUBLE)")
    spark.range(1000).repartition(6)
      .select(col("id").as("k"),
        when(col("id") % 5 === 0, lit(null: String))
          .otherwise(concat(lit("v"), col("id"))).as("v"),
        (col("id") * 1.5 - 300.0).as("x"))
      .createOrReplaceTempView("agg_src")
    sql("INSERT INTO gtest.default.t SELECT * FROM agg_src")

    val q = """SELECT COUNT(*) AS n, COUNT(v) AS nv, MIN(x) AS mnx,
                      MAX(x) AS mxx, MIN(v) AS mnv, MAX(k) AS mxk
               FROM gtest.default.t"""
    assert(plansLocal(q), "unfiltered agg must plan as a LocalTableScan")
    val before = graft.catalog.GraftStorage.fileOpens.get()
    val r = sql(q).head()
    assert(graft.catalog.GraftStorage.fileOpens.get() == before,
      "manifest-served aggregate must open zero data files")
    assert(r.getLong(0) == 1000 && r.getLong(1) == 800)
    assert(r.getDouble(2) == -300.0 && r.getDouble(3) == 999 * 1.5 - 300.0)
    assert(r.getString(4) == "v1" && r.getLong(5) == 999)

    // a WHERE clause leaves a residual filter: no agg pushdown, rows read
    val qf = "SELECT COUNT(*) AS n FROM gtest.default.t WHERE k < 10"
    assert(!plansLocal(qf))
    assert(sql(qf).head().getLong(0) == 10)
    // GROUP BY refuses too
    assert(!plansLocal(
      "SELECT v, COUNT(*) FROM gtest.default.t GROUP BY v"))
    // SUM is not provable from min/max stats: whole aggregation falls back
    val qs = "SELECT SUM(k) AS s, COUNT(*) AS n FROM gtest.default.t"
    assert(!plansLocal(qs))
    assert(sql(qs).head().getLong(0) == 999L * 1000 / 2)
  }

  test("agg pushdown: GROUP BY partition-pinned columns served from " +
      "the manifest; unpinned groups refuse") {
    setup()
    sql("""CREATE TABLE gtest.default.t (k BIGINT, p STRING, x DOUBLE)
           PARTITIONED BY (p)""")
    spark.range(300).repartition(4)
      .select(col("id").as("k"),
        concat(lit("p"), col("id") % 3).as("p"),
        (col("id") * 2.0).as("x"))
      .createOrReplaceTempView("gagg_src")
    sql("INSERT INTO gtest.default.t SELECT k, p, x FROM gagg_src")

    val q = """SELECT p, COUNT(*) AS n, MIN(x) AS mn, MAX(k) AS mk
               FROM gtest.default.t GROUP BY p ORDER BY p"""
    assert(plansLocal(q), "partition-grouped agg must serve from refs")
    val before = graft.catalog.GraftStorage.fileOpens.get()
    val rows = sql(q).collect()
    assert(graft.catalog.GraftStorage.fileOpens.get() == before)
    assert(rows.map(_.getString(0)).toSeq == Seq("p0", "p1", "p2"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(100L, 100L, 100L))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.0, 2.0, 4.0))
    assert(rows.map(_.getLong(3)).toSeq == Seq(297L, 298L, 299L))

    // grouping by a NON-pinned column refuses (files span many k)
    val qk = "SELECT k % 2, COUNT(*) FROM gtest.default.t GROUP BY k % 2"
    assert(!plansLocal(qk))
    // a NULL partition value unpins its file: whole pushdown refuses,
    // Spark's null group still computes exactly
    sql("INSERT INTO gtest.default.t VALUES (1000, NULL, 1.5)")
    assert(!plansLocal(q))
    val withNull = sql(
      """SELECT p, COUNT(*) AS n FROM gtest.default.t
         GROUP BY p ORDER BY p NULLS FIRST""").collect()
    assert(withNull.head.isNullAt(0) && withNull.head.getLong(1) == 1)
  }

  test("agg pushdown: NaN-poisoned stats refuse MIN/MAX (Spark's " +
      "NaN-is-largest preserved); COUNT alone still serves") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT, x DOUBLE)")
    sql("INSERT INTO gtest.default.t VALUES " +
      "(1, 1.0), (2, cast('NaN' as double)), (3, 5.0)")
    // MIN/MAX over the poisoned column must fall back to a real scan...
    val q = "SELECT MAX(x) AS m FROM gtest.default.t"
    assert(!plansLocal(q))
    assert(sql(q).head().getDouble(0).isNaN,
      "Spark's MAX treats NaN as largest; pushdown must not lose it")
    // ...but the null count stays exact: COUNT(x) serves from metadata
    val qc = "SELECT COUNT(x) AS n, COUNT(*) AS a FROM gtest.default.t"
    assert(plansLocal(qc))
    assert(sql(qc).head().getLong(0) == 3)
  }

  test("agg pushdown: ADD COLUMN DEFAULT backfill, all-null files, " +
      "empty tables, MOR delta state") {
    setup()
    sql("CREATE TABLE gtest.default.t (k BIGINT)")
    // empty table: MIN is SQL NULL, COUNT 0 — still metadata-served
    val r0 = sql("SELECT MIN(k) AS m, COUNT(*) AS n FROM gtest.default.t")
    assert(plansLocal("SELECT MIN(k) AS m, COUNT(*) AS n FROM gtest.default.t"))
    assert(r0.head().isNullAt(0) && r0.head().getLong(1) == 0)

    sql("INSERT INTO gtest.default.t VALUES (1), (2)")
    sql("ALTER TABLE gtest.default.t ADD COLUMN tag STRING DEFAULT 'legacy'")
    sql("INSERT INTO gtest.default.t VALUES (3, 'fresh'), (4, NULL)")
    val q = """SELECT COUNT(tag) AS n, MIN(tag) AS mn, MAX(tag) AS mx
               FROM gtest.default.t"""
    assert(plansLocal(q), "default-backfilled files must stay servable")
    val r = sql(q).head()
    // pre-ALTER rows read the frozen default => 2 + 1 non-null
    assert(r.getLong(0) == 3 && r.getString(1) == "fresh" &&
      r.getString(2) == "legacy")

    // a live MOR delta log plans through the fold — never served
    sql("DROP TABLE IF EXISTS gtest.default.tm")
    sql("""CREATE TABLE gtest.default.tm (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gtest.default.tm VALUES (1, 'a'), (2, 'b')")
    // UPDATE always lands a delta entry (a DELETE on a value-aligned
    // file can legitimately resolve as a metadata delete and keep the
    // log empty — in which case serving from refs WOULD be sound)
    sql("UPDATE gtest.default.tm SET v = 'z' WHERE k = 1")
    val qm = "SELECT COUNT(*) AS n FROM gtest.default.tm"
    assert(!plansLocal(qm), "live-delta MOR must fold, not serve refs")
    assert(sql(qm).head().getLong(0) == 2)
    // compacted, the refs are exact again: served
    sql("CALL gtest.system.compact('default.tm')")
    assert(plansLocal(qm))
    assert(sql(qm).head().getLong(0) == 2)
    sql("DROP TABLE gtest.default.tm")
  }
}
