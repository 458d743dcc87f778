package graft

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
}
