package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.catalog.Identifier

/** Persistent SQL views: the DSv2 ViewCatalog implementation on
  * [[graft.catalog.GraftCatalog]] (create/replace/alter/drop/rename/
  * list, persisted in the warehouse's `_views.json`), the
  * `system.create_view / drop_view / show_views` CALL surface, and the
  * injected read-side resolution ([[graft.plans.ResolveGraftViews]] —
  * Spark 4.1 doesn't route view SQL to DSv2 catalogs, so `SELECT FROM
  * cat.ns.view` resolves through the extension rule). */
class ViewCatalogSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def gcat: graft.catalog.GraftCatalog = {
    spark.conf.set("spark.sql.catalog.gv",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.sessionState.catalogManager.catalog("gv")
      .asInstanceOf[graft.catalog.GraftCatalog]
  }

  private def setup(): Unit = {
    gcat
    sql("CALL gv.system.drop_view('default.top_orders')")
    sql("DROP TABLE IF EXISTS gv.default.v_orders")
    sql("CREATE TABLE gv.default.v_orders (k BIGINT, pri STRING, " +
      "price DOUBLE)")
    sql("""INSERT INTO gv.default.v_orders VALUES
      (1, 'HIGH', 10.0), (2, 'LOW', 5.0), (3, 'HIGH', 30.0)""")
  }

  test("create_view persists; SELECT resolves through the catalog; " +
      "later base DML is visible (live definition, not a snapshot)") {
    setup()
    sql("""CALL gv.system.create_view('default.top_orders',
      'SELECT pri, COUNT(*) AS n, SUM(price) AS total
       FROM gv.default.v_orders GROUP BY pri')""")
    assert(sql("SELECT * FROM gv.default.top_orders ORDER BY pri")
      .collect().toSeq == Seq(Row("HIGH", 2L, 40.0), Row("LOW", 1L, 5.0)))
    sql("INSERT INTO gv.default.v_orders VALUES (4, 'LOW', 7.0)")
    assert(sql("SELECT n FROM gv.default.top_orders WHERE pri = 'LOW'")
      .head().getLong(0) == 2L)
    // show_views is the SHOW CREATE VIEW equivalent: one row per view
    // with columns, captured context, and the full definition text
    val shown = sql("CALL gv.system.show_views('default')")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3)))
      .find(_._1 == "top_orders")
      .getOrElse(fail("top_orders missing from show_views"))
    assert(shown._2 == "pri,n,total", s"got $shown")
    assert(shown._4.contains("GROUP BY pri"), s"got $shown")
    sql("CALL gv.system.drop_view('default.top_orders')")
    intercept[Exception] {
      sql("SELECT * FROM gv.default.top_orders").collect()
    }
  }

  test("views survive a cold catalog reload (persisted in the " +
      "warehouse, not the session)") {
    setup()
    sql("""CALL gv.system.create_view('default.top_orders',
      'SELECT COUNT(*) AS n FROM gv.default.v_orders')""")
    // a SECOND catalog instance over the same warehouse must see it
    spark.conf.set("spark.sql.catalog.gv2",
      classOf[graft.catalog.GraftCatalog].getName)
    val gv2 = spark.sessionState.catalogManager.catalog("gv2")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ident = Identifier.of(Array("default"), "top_orders")
    assert(gv2.viewExists(ident))
    assert(gv2.loadView(ident).query().contains("COUNT(*)"))
    sql("CALL gv.system.drop_view('default.top_orders')")
  }

  test("replace swaps the definition; create-time analysis is " +
      "enforced; alter/rename via the ViewCatalog API persist") {
    setup()
    sql("""CALL gv.system.create_view('default.top_orders',
      'SELECT COUNT(*) AS n FROM gv.default.v_orders')""")
    sql("""CALL gv.system.create_view('default.top_orders',
      'SELECT MAX(price) AS n FROM gv.default.v_orders', 'true')""")
    assert(sql("SELECT n FROM gv.default.top_orders")
      .head().getDouble(0) == 30.0)
    // a definition that doesn't analyze is rejected at create time
    intercept[Exception] {
      sql("""CALL gv.system.create_view('default.broken',
        'SELECT no_such_col FROM gv.default.v_orders')""")
    }
    // ViewCatalog API: alter properties, rename, list
    val cat = gcat
    val ident = Identifier.of(Array("default"), "top_orders")
    cat.alterView(ident,
      org.apache.spark.sql.connector.catalog.ViewChange
        .setProperty("owner_team", "data-eng"))
    assert(cat.loadView(ident).properties().get("owner_team") == "data-eng")
    val to = Identifier.of(Array("default"), "top_orders_v2")
    cat.dropView(to)
    cat.renameView(ident, to)
    assert(cat.viewExists(to) && !cat.viewExists(ident))
    assert(sql("SELECT n FROM gv.default.top_orders_v2")
      .head().getDouble(0) == 30.0)
    assert(cat.listViews("default").map(_.name()).contains("top_orders_v2"))
    cat.dropView(to)
  }

  test("a view over a hidden-partitioned table keeps file pruning: " +
      "the substituted plan pushes the ts predicate to the scan") {
    gcat
    sql("CALL gv.system.drop_view('default.v_days')")
    sql("DROP TABLE IF EXISTS gv.default.v_hp")
    sql("CREATE TABLE gv.default.v_hp (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    sql("""INSERT INTO gv.default.v_hp SELECT id,
      timestamp'2024-03-15 00:00:00' +
        make_interval(0,0,0,0,0,0, id * 617 % 259200)
      FROM range(0, 300, 1, 1)""") // 3 days -> 3 files
    sql("""CALL gv.system.create_view('default.v_days',
      'SELECT CAST(ts AS DATE) AS day, id FROM gv.default.v_hp')""")
    val q = sql("""SELECT count(*) FROM gv.default.v_days
                   WHERE day = DATE'2024-03-16'""")
    val plan = q.queryExecution.executedPlan.toString
    // the day predicate folds to a day-aligned ts range through the
    // cast, fully pushes (exact partition pushdown), and the COUNT is
    // then served from the MANIFEST — through the VIEW, the plan opens
    // ZERO data files (LocalTableScan of the metadata fold)
    assert(!plan.contains("BatchScan"),
      s"expected a manifest-served count through the view, plan:\n$plan")
    assert(q.head().getLong(0) == 140L)
    // a non-aggregate read through the view still prunes to 1 of 3
    val rows = sql("""SELECT id FROM gv.default.v_days
                      WHERE day = DATE'2024-03-16'""")
    val scan = rows.queryExecution.executedPlan.toString
    val m = "GraftScan\\((\\d+) rows, (\\d+) files \\((\\d+) skipped\\)".r
      .findFirstMatchIn(scan)
    assert(m.exists(g => g.group(2).toInt == 1 && g.group(3).toInt == 2),
      s"expected 1 of 3 files planned through the view, plan:\n$scan")
    assert(rows.count() == 140L)
    sql("CALL gv.system.drop_view('default.v_days')")
  }

  test("tables and views share one namespace: collisions refuse both " +
      "ways; views over views compose") {
    setup()
    val e1 = intercept[Exception] {
      sql("""CALL gv.system.create_view('default.v_orders',
        'SELECT 1 AS x')""")
    }
    assert(e1.getMessage.toLowerCase.contains("exists"),
      s"got ${e1.getMessage}")
    sql("""CALL gv.system.create_view('default.top_orders',
      'SELECT pri, SUM(price) AS total FROM gv.default.v_orders
       GROUP BY pri')""")
    val e2 = intercept[Exception] {
      sql("CREATE TABLE gv.default.top_orders (x BIGINT)")
    }
    assert(e2.getMessage.toLowerCase.contains("exists"),
      s"got ${e2.getMessage}")
    // a view over a view: resolved level by level in the fixed point
    sql("CALL gv.system.drop_view('default.top2')")
    sql("""CALL gv.system.create_view('default.top2',
      'SELECT MAX(total) AS m FROM gv.default.top_orders')""")
    assert(sql("SELECT m FROM gv.default.top2").head().getDouble(0) == 40.0)
    sql("CALL gv.system.drop_view('default.top2')")
    sql("CALL gv.system.drop_view('default.top_orders')")
  }

  test("create_view refuses a definition over a TEMP view (it would " +
      "validate in the creating session, then break — or bind to a " +
      "DIFFERENT session's temp view — at read time)") {
    setup()
    spark.range(3).toDF("x").createOrReplaceTempView("vc_tmp")
    val e = intercept[Exception] {
      sql("""CALL gv.system.create_view('default.over_tmp',
        'SELECT COUNT(*) AS n FROM vc_tmp')""")
    }
    assert(e.getMessage.contains("temp view"), s"got ${e.getMessage}")
    // CTE names inside the definition are NOT relations — still fine
    sql("CALL gv.system.drop_view('default.with_cte')")
    sql("""CALL gv.system.create_view('default.with_cte',
      'WITH c AS (SELECT price FROM gv.default.v_orders)
       SELECT SUM(price) AS s FROM c')""")
    assert(sql("SELECT s FROM gv.default.with_cte").head().getDouble(0)
      == 45.0)
    sql("CALL gv.system.drop_view('default.with_cte')")
  }

  test("unqualified names in a definition pin to the CAPTURED " +
      "creation context — a reader's like-named temp view never " +
      "shadows them") {
    setup()
    sql("CALL gv.system.drop_view('default.ctx_view')")
    // create under currentCatalog=gv, currentNamespace=default so the
    // unqualified `v_orders` is legal and captured
    sql("USE gv.default")
    try {
      sql("""CALL gv.system.create_view('default.ctx_view',
        'SELECT COUNT(*) AS n FROM v_orders')""")
    } finally sql("USE spark_catalog.default")
    // the reader now has a TEMP view named v_orders with other data —
    // Spark's view semantics: the stored context wins, not the reader's
    spark.range(1000).toDF("k").createOrReplaceTempView("v_orders")
    try {
      assert(sql("SELECT n FROM gv.default.ctx_view").head().getLong(0)
        == 3L, "view must read the captured gv.default.v_orders, " +
          "not the reader's temp view")
    } finally spark.catalog.dropTempView("v_orders")
    sql("CALL gv.system.drop_view('default.ctx_view')")
  }

  test("a view-over-view CYCLE introduced by replace fails LOUDLY at " +
      "read (analyzer fixed-point cap), never silently wrong") {
    setup()
    sql("CALL gv.system.drop_view('default.cyc_b')")
    sql("CALL gv.system.drop_view('default.cyc_a')")
    sql("""CALL gv.system.create_view('default.cyc_a',
      'SELECT k FROM gv.default.v_orders')""")
    sql("""CALL gv.system.create_view('default.cyc_b',
      'SELECT k FROM gv.default.cyc_a')""")
    assert(sql("SELECT count(*) FROM gv.default.cyc_b")
      .head().getLong(0) == 3L)
    // the replacement validates against the PRE-replace cyc_b (create-
    // time analysis can't see the future cycle) — the cycle exists
    // only once both definitions are live
    sql("""CALL gv.system.create_view('default.cyc_a',
      'SELECT k FROM gv.default.cyc_b', 'true')""")
    val e = intercept[Exception] {
      sql("SELECT * FROM gv.default.cyc_a").collect()
    }
    assert(e.getMessage != null, "cycle must fail loudly")
    intercept[Exception] {
      sql("SELECT * FROM gv.default.cyc_b").collect()
    }
    sql("CALL gv.system.drop_view('default.cyc_b')")
    sql("CALL gv.system.drop_view('default.cyc_a')")
  }

  test("renaming a table onto an existing view name refuses loudly " +
      "(the view would silently shadow the renamed table)") {
    setup()
    sql("""CALL gv.system.create_view('default.shadow_v',
      'SELECT 1 AS one')""")
    sql("DROP TABLE IF EXISTS gv.default.rn_src")
    sql("CREATE TABLE gv.default.rn_src (x BIGINT)")
    val e = intercept[Exception] {
      gcat.renameTable(
        Identifier.of(Array("default"), "rn_src"),
        Identifier.of(Array("default"), "shadow_v"))
    }
    assert(e.getMessage.toLowerCase.contains("exists"),
      s"got ${e.getMessage}")
    // the failed rename must not have destroyed the source binding
    assert(sql("SELECT COUNT(*) AS c FROM gv.default.rn_src")
      .head().getLong(0) == 0L)
    sql("DROP TABLE gv.default.rn_src")
    sql("CALL gv.system.drop_view('default.shadow_v')")
  }
}
