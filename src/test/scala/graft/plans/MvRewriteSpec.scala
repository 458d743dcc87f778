package graft.plans

import org.apache.spark.sql.Row

import graft.SparkSpec

/** MV auto-rewrite ([[MvRewrite]]): a registered, FRESH materialized
  * view transparently serves matching aggregates over its base table;
  * every soundness gate (staleness, shape mismatch, conf off, decimal
  * type drift) refuses and the original plan runs. */
class MvRewriteSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2Relation => r.table.name()
      case s: DataSourceV2ScanRelation => s.relation.table.name()
    }
  }

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mv_base")
    sql("DROP TABLE IF EXISTS gmv.default.mv_agg")
    sql("CREATE TABLE gmv.default.mv_base (k STRING, v BIGINT, w DOUBLE)")
    sql("""INSERT INTO gmv.default.mv_base VALUES
      ('a', 1, 1.5), ('a', 2, 2.5), ('b', 10, 0.25), ('c', 7, -1.0)""")
    sql("""CREATE TABLE gmv.default.mv_agg
           (k STRING, sum_v BIGINT, n BIGINT, min_w DOUBLE, max_w DOUBLE)
           TBLPROPERTIES (
             'graft.mv.of' = 'default/mv_base',
             'graft.mv.group' = 'k',
             'graft.mv.agg' =
               'sum:v:sum_v,count:*:n,min:w:min_w,max:w:max_w')""")
    refresh()
    sql("""ALTER TABLE gmv.default.mv_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mv_agg')""")
  }

  /** The refresh contract: recompute (here: full; q229 shows the
    * incremental variant) and stamp the base version served. */
  private def refresh(): Unit = {
    sql("""INSERT OVERWRITE gmv.default.mv_agg
           SELECT k, SUM(v), COUNT(*), MIN(w), MAX(w)
           FROM gmv.default.mv_base GROUP BY k""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mv_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mv_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
  }

  test("fresh MV serves the matching aggregate: plan scans the MV, " +
      "values are the base truth") {
    setup()
    val q = sql("""SELECT k, SUM(v) AS sum_v, COUNT(*) AS n,
                          MIN(w) AS min_w, MAX(w) AS max_w
                   FROM gmv.default.mv_base GROUP BY k ORDER BY k""")
    assert(scansOf(q).exists(_.contains("mv_agg")),
      s"expected the MV scan, got ${scansOf(q)}:\n" +
        q.queryExecution.executedPlan)
    assert(q.collect().toSeq == Seq(
      Row("a", 3L, 2L, 1.5, 2.5), Row("b", 10L, 1L, 0.25, 0.25),
      Row("c", 7L, 1L, -1.0, -1.0)))
  }

  test("a base commit staleness-kills the rewrite until re-refresh") {
    setup()
    sql("INSERT INTO gmv.default.mv_base VALUES ('a', 100, 9.0)")
    val q = sql("""SELECT k, SUM(v) AS sum_v FROM gmv.default.mv_base
                   GROUP BY k ORDER BY k""")
    assert(scansOf(q).forall(!_.contains("mv_agg")),
      "stale MV must NOT be scanned")
    assert(q.collect().toSeq == Seq(
      Row("a", 103L), Row("b", 10L), Row("c", 7L)))
    refresh()
    val q2 = sql("""SELECT k, SUM(v) AS sum_v FROM gmv.default.mv_base
                    GROUP BY k ORDER BY k""")
    assert(scansOf(q2).exists(_.contains("mv_agg")),
      "re-refreshed MV must serve again")
    assert(q2.collect().toSeq == Seq(
      Row("a", 103L), Row("b", 10L), Row("c", 7L)))
  }

  test("shape gates refuse: uncovered agg, extra grouping, filter, " +
      "distinct — all run on the base with right answers") {
    setup()
    // AVG is not in the MV's spec
    val avg = sql("SELECT k, AVG(w) AS a FROM gmv.default.mv_base GROUP BY k")
    assert(scansOf(avg).forall(!_.contains("mv_agg")))
    // grouping mismatch
    val g2 = sql("""SELECT k, v, SUM(v) AS s FROM gmv.default.mv_base
                    GROUP BY k, v""")
    assert(scansOf(g2).forall(!_.contains("mv_agg")))
    // a WHERE on a NON-group column refuses (not commutable)
    val fil = sql("""SELECT k, SUM(v) AS s FROM gmv.default.mv_base
                     WHERE v > 1 GROUP BY k""")
    assert(scansOf(fil).forall(!_.contains("mv_agg")))
    assert(fil.orderBy("k").collect().toSeq == Seq(
      Row("a", 2L), Row("b", 10L), Row("c", 7L)))
    // ...but a WHERE on the GROUP column commutes and rewrites
    val gfil = sql("""SELECT k, SUM(v) AS s FROM gmv.default.mv_base
                      WHERE k IN ('a', 'c') GROUP BY k ORDER BY k""")
    assert(scansOf(gfil).exists(_.contains("mv_agg")),
      s"group-col WHERE must rewrite, got ${scansOf(gfil)}")
    assert(gfil.collect().toSeq == Seq(Row("a", 3L), Row("c", 7L)))
    // DISTINCT over a VALUE column refuses (not reconstructible from
    // partials); the group-column variant is pinned separately below
    val dis = sql("""SELECT k, COUNT(DISTINCT v) AS s
                     FROM gmv.default.mv_base GROUP BY k""")
    assert(scansOf(dis).forall(!_.contains("mv_agg")))
  }

  test("COUNT(DISTINCT <group column>) serves from the MV; any other " +
      "DISTINCT keeps refusing (VERDICT r15 item 8 boundary)") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvd_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvd_agg")
    sql("CREATE TABLE gmv.default.mvd_base (g1 STRING, g2 BIGINT, v BIGINT)")
    sql("""INSERT INTO gmv.default.mvd_base VALUES
      ('a', 1, 10), ('a', 1, 11), ('a', 2, 12),
      ('b', 1, 13), ('b', 3, 14), ('b', 3, 15)""")
    sql("""CREATE TABLE gmv.default.mvd_agg
           (g1 STRING, g2 BIGINT, n BIGINT)
           TBLPROPERTIES (
             'graft.mv.of' = 'default/mvd_base',
             'graft.mv.group' = 'g1,g2',
             'graft.mv.agg' = 'count:*:n')""")
    sql("""INSERT OVERWRITE gmv.default.mvd_agg
           SELECT g1, g2, COUNT(*) FROM gmv.default.mvd_base
           GROUP BY g1, g2""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mvd_base").collect()
      .collectFirst {
        case r if r.getString(0) == "graft.current_version" =>
          r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mvd_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mvd_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvd_agg')""")
    // roll-up with COUNT(DISTINCT g2): exact from the MV's own group
    // values — the distinct set per g1 is identical over MV rows
    val q = sql("""SELECT g1, COUNT(DISTINCT g2) AS nd, COUNT(*) AS n
                   FROM gmv.default.mvd_base GROUP BY g1 ORDER BY g1""")
    assert(scansOf(q).exists(_.contains("mvd_agg")),
      s"COUNT(DISTINCT groupcol) must serve from the MV, got " +
        s"${scansOf(q)}:\n${q.queryExecution.executedPlan}")
    assert(q.collect().toSeq == Seq(Row("a", 2L, 3L), Row("b", 2L, 3L)))
    // global (ungrouped) variant is a roll-up to the empty group set
    val qg = sql("""SELECT COUNT(DISTINCT g2) AS nd
                    FROM gmv.default.mvd_base""")
    assert(scansOf(qg).exists(_.contains("mvd_agg")))
    assert(qg.head().getLong(0) == 3L)
    // the boundary: DISTINCT over a NON-group column still refuses…
    val bad = sql("""SELECT g1, COUNT(DISTINCT v) AS nd
                     FROM gmv.default.mvd_base GROUP BY g1""")
    assert(scansOf(bad).forall(!_.contains("mvd_agg")))
    // …and a filtered distinct refuses even on a group column
    val fil = sql("""SELECT g1, COUNT(DISTINCT g2)
                       FILTER (WHERE g2 > 1) AS nd
                     FROM gmv.default.mvd_base GROUP BY g1""")
    assert(scansOf(fil).forall(!_.contains("mvd_agg")))
  }

  test("AVG decomposes as SUM(sum)/SUM(count-of-col) when both are " +
      "materialized — null groups drop like Average's own buffer") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mva_base")
    sql("DROP TABLE IF EXISTS gmv.default.mva_agg")
    sql("CREATE TABLE gmv.default.mva_base (k STRING, w DOUBLE)")
    sql("""INSERT INTO gmv.default.mva_base VALUES
      ('a', 1.5), ('a', 2.5), ('b', CAST(NULL AS DOUBLE)), ('c', 4.0)""")
    sql("""CREATE TABLE gmv.default.mva_agg
           (k STRING, sum_w DOUBLE, nw BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mva_base',
                          'graft.mv.group' = 'k',
                          'graft.mv.agg' = 'sum:w:sum_w,count:w:nw')""")
    sql("""INSERT OVERWRITE gmv.default.mva_agg
           SELECT k, SUM(w), COUNT(w) FROM gmv.default.mva_base
           GROUP BY k""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mva_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mva_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mva_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mva_agg')""")
    val q = sql("""SELECT k, AVG(w) AS aw FROM gmv.default.mva_base
                   GROUP BY k ORDER BY k""")
    assert(scansOf(q).exists(_.contains("mva_agg")),
      s"got ${scansOf(q)}:\n${q.queryExecution.executedPlan}")
    assert(q.collect().toSeq == Seq(
      Row("a", 2.0), Row("b", null), Row("c", 4.0)))
  }

  test("conf kill-switch restores the base plan") {
    setup()
    spark.conf.set("spark.graft.mvRewrite", "false")
    try {
      val q = sql("""SELECT k, SUM(v) AS s FROM gmv.default.mv_base
                     GROUP BY k""")
      assert(scansOf(q).forall(!_.contains("mv_agg")))
    } finally spark.conf.unset("spark.graft.mvRewrite")
  }

  test("ROLL-UP: GROUP BY a subset of the MV's group columns " +
      "re-aggregates over the MV — SUM of sums, SUM of count " +
      "partials, MIN of mins, decomposed AVG") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvr_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvr_agg")
    sql("CREATE TABLE gmv.default.mvr_base (day STRING, k STRING, " +
      "v BIGINT, w DOUBLE)")
    sql("""INSERT INTO gmv.default.mvr_base VALUES
      ('d1', 'a', 1, 1.0), ('d1', 'a', 2, 3.0), ('d1', 'b', 10, 5.0),
      ('d2', 'a', 100, 2.0), ('d2', 'b', 20, CAST(NULL AS DOUBLE))""")
    sql("""CREATE TABLE gmv.default.mvr_agg
           (day STRING, k STRING, sum_v BIGINT, n BIGINT,
            min_w DOUBLE, sum_w DOUBLE, nw BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mvr_base',
             'graft.mv.group' = 'day,k',
             'graft.mv.agg' =
               'sum:v:sum_v,count:*:n,min:w:min_w,sum:w:sum_w,count:w:nw')""")
    sql("""INSERT OVERWRITE gmv.default.mvr_agg
           SELECT day, k, SUM(v), COUNT(*), MIN(w), SUM(w), COUNT(w)
           FROM gmv.default.mvr_base GROUP BY day, k""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mvr_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mvr_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mvr_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvr_agg')""")
    val rollup = """SELECT day, SUM(v) AS sv, COUNT(*) AS n,
                           MIN(w) AS mw, AVG(w) AS aw
                    FROM gmv.default.mvr_base GROUP BY day ORDER BY day"""
    val q = sql(rollup)
    assert(scansOf(q).exists(_.contains("mvr_agg")),
      s"roll-up must serve from the MV, got ${scansOf(q)}:\n" +
        q.queryExecution.executedPlan)
    // truth = the same query with the rewrite disabled (base scan)
    spark.conf.set("spark.graft.mvRewrite", "false")
    val truth = try sql(rollup).collect().toSeq
      finally spark.conf.unset("spark.graft.mvRewrite")
    assert(q.collect().toSeq == truth)
    // a WHERE on an MV group column NOT in the query's groups still
    // commutes (filter the MV partials, then roll up)
    val fil = sql("""SELECT day, SUM(v) AS sv FROM gmv.default.mvr_base
                     WHERE k = 'a' GROUP BY day ORDER BY day""")
    assert(scansOf(fil).exists(_.contains("mvr_agg")),
      s"got ${scansOf(fil)}")
    assert(fil.collect().toSeq == Seq(Row("d1", 3L), Row("d2", 100L)))
    // a grouping column OUTSIDE the MV's group set still refuses
    val sup = sql("""SELECT day, v, SUM(v) AS sv
                     FROM gmv.default.mvr_base GROUP BY day, v""")
    assert(scansOf(sup).forall(!_.contains("mvr_agg")))
  }

  test("roll-up × filter refusal matrix: predicates on retained and " +
      "rolled-away GROUP columns serve; anything touching a non-group " +
      "column (alone or mixed) or non-deterministic refuses") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvf_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvf_agg")
    sql("CREATE TABLE gmv.default.mvf_base (day STRING, k STRING, " +
      "v BIGINT)")
    sql("""INSERT INTO gmv.default.mvf_base VALUES
      ('d1', 'a', 1), ('d1', 'b', 2), ('d2', 'a', 4), ('d2', 'b', 8)""")
    sql("""CREATE TABLE gmv.default.mvf_agg
           (day STRING, k STRING, sum_v BIGINT, n BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mvf_base',
             'graft.mv.group' = 'day,k',
             'graft.mv.agg' = 'sum:v:sum_v,count:*:n')""")
    sql("""INSERT OVERWRITE gmv.default.mvf_agg
           SELECT day, k, SUM(v), COUNT(*)
           FROM gmv.default.mvf_base GROUP BY day, k""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mvf_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mvf_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mvf_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvf_agg')""")
    def served(where: String): Boolean = {
      val df = sql(s"""SELECT day, SUM(v) AS sv
                       FROM gmv.default.mvf_base $where
                       GROUP BY day""")
      scansOf(df).exists(_.contains("mvf_agg"))
    }
    def truthChecked(where: String): Unit = {
      val q = s"""SELECT day, SUM(v) AS sv FROM gmv.default.mvf_base
                  $where GROUP BY day ORDER BY day"""
      val got = sql(q).collect().toSeq
      spark.conf.set("spark.graft.mvRewrite", "false")
      val truth = try sql(q).collect().toSeq
        finally spark.conf.unset("spark.graft.mvRewrite")
      assert(got == truth, s"$where: $got vs $truth")
    }
    // SERVE: retained group column, rolled-away group column, both
    assert(served("WHERE day = 'd1'"), "retained group col must serve")
    assert(served("WHERE k = 'a'"), "rolled-away group col must serve")
    assert(served("WHERE day = 'd1' AND k = 'a'"),
      "conjunction over group cols must serve")
    Seq("WHERE day = 'd1'", "WHERE k = 'a'",
      "WHERE day = 'd1' AND k = 'a'").foreach(truthChecked)
    // REFUSE: the partials cannot express a non-group predicate —
    // SUM(v) WHERE v > 2 is not derivable from per-(day,k) sums
    assert(!served("WHERE v > 2"), "non-group predicate must refuse")
    assert(!served("WHERE k = 'a' AND v > 2"),
      "group × non-group conjunction must refuse")
    // (a tautology like rand() < 2.0 is constant-folded away before
    // the rule runs — that's sound; a REAL random filter must refuse)
    assert(!served("WHERE rand() < 0.5"),
      "non-deterministic predicate must refuse")
    truthChecked("WHERE v > 2")
    truthChecked("WHERE k = 'a' AND v > 2")
  }

  test("an MV over a DELETION-VECTOR base serves, dies on a " +
      "positional DELETE, and re-serves after a feed-applied " +
      "incremental refresh (q273's plan half)") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvdv_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvdv_agg")
    sql("""CREATE TABLE gmv.default.mvdv_base (k STRING, v BIGINT)
           TBLPROPERTIES ('graft.mode'='dv')""")
    sql("""INSERT INTO gmv.default.mvdv_base VALUES
      ('a', 1), ('a', 2), ('b', 10), ('b', 20), ('c', 5)""")
    sql("""CREATE TABLE gmv.default.mvdv_agg (k STRING, sum_v BIGINT,
           n BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mvdv_base',
             'graft.mv.group' = 'k',
             'graft.mv.agg' = 'sum:v:sum_v,count:*:n')""")
    def ver(): Int = sql("SHOW TBLPROPERTIES gmv.default.mvdv_base")
      .collect().collectFirst {
        case r if r.getString(0) == "graft.current_version" =>
          r.getString(1).toInt
      }.get
    def stamp(): Unit = sql(
      s"""ALTER TABLE gmv.default.mvdv_agg SET TBLPROPERTIES
          ('graft.mv.base_version' = '${ver()}')""")
    sql("""INSERT OVERWRITE gmv.default.mvdv_agg
           SELECT k, SUM(v), COUNT(*) FROM gmv.default.mvdv_base
           GROUP BY k""")
    stamp()
    sql("""ALTER TABLE gmv.default.mvdv_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvdv_agg')""")
    val agg = """SELECT k, SUM(v) AS sv, COUNT(*) AS n
                 FROM gmv.default.mvdv_base GROUP BY k ORDER BY k"""
    assert(scansOf(sql(agg)).exists(_.contains("mvdv_agg")),
      "fresh MV over a DV base must serve")
    val before = ver()
    sql("DELETE FROM gmv.default.mvdv_base WHERE v IN (2, 10)")
    assert(!scansOf(sql(agg)).exists(_.contains("mvdv_agg")),
      "a positional DELETE must staleness-kill the rewrite")
    // incremental refresh FROM THE FEED: delete-rows subtract
    spark.read.option("from_version", before.toString)
      .table("gmv.default.`mvdv_base$changes`")
      .createOrReplaceTempView("mvdv_slice")
    sql("""MERGE INTO gmv.default.mvdv_agg t
           USING (SELECT k,
                         SUM(CASE WHEN `__op` = 0 THEN 1 ELSE -1 END)
                           AS dn,
                         SUM(CASE WHEN `__op` = 0 THEN v ELSE -v END)
                           AS dv
                  FROM mvdv_slice GROUP BY k) c
           ON t.k = c.k
           WHEN MATCHED AND t.n + c.dn = 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET sum_v = t.sum_v + c.dv,
                                        n = t.n + c.dn
           WHEN NOT MATCHED AND c.dn > 0 THEN
             INSERT (k, sum_v, n) VALUES (c.k, c.dv, c.dn)""")
    stamp()
    val q = sql(agg)
    assert(scansOf(q).exists(_.contains("mvdv_agg")),
      "the feed-refreshed MV must serve again")
    assert(q.collect().toSeq ==
      Seq(Row("a", 1L, 1L), Row("b", 20L, 1L), Row("c", 5L, 1L)))
    // an EQUALITY-UPSERT wave maintains through the same slice: the
    // feed emits its superseded-row deletes plus the inserts, and the
    // identical MERGE arithmetic re-balances the groups
    val before2 = ver()
    spark.sql("SELECT * FROM VALUES ('b', 20L, 'x'), ('d', 7L, 'x') " +
      "AS u(k, v, tag)").drop("tag")
      .writeTo("gmv.default.mvdv_base")
      .option("graft.upsert_keys", "v").append()
    assert(!scansOf(sql(agg)).exists(_.contains("mvdv_agg")))
    spark.read.option("from_version", before2.toString)
      .table("gmv.default.`mvdv_base$changes`")
      .createOrReplaceTempView("mvdv_slice2")
    sql("""MERGE INTO gmv.default.mvdv_agg t
           USING (SELECT k,
                         SUM(CASE WHEN `__op` = 0 THEN 1 ELSE -1 END)
                           AS dn,
                         SUM(CASE WHEN `__op` = 0 THEN v ELSE -v END)
                           AS dv
                  FROM mvdv_slice2 GROUP BY k) c
           ON t.k = c.k
           WHEN MATCHED AND t.n + c.dn = 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET sum_v = t.sum_v + c.dv,
                                        n = t.n + c.dn
           WHEN NOT MATCHED AND c.dn > 0 THEN
             INSERT (k, sum_v, n) VALUES (c.k, c.dv, c.dn)""")
    stamp()
    val q2 = sql(agg)
    assert(scansOf(q2).exists(_.contains("mvdv_agg")),
      "the upsert-refreshed MV must serve")
    // key v=20 was upserted in place ('b' keeps one row), v=7 is new
    // under 'd'; 'c' still holds its v=5 row
    assert(q2.collect().toSeq ==
      Seq(Row("a", 1L, 1L), Row("b", 20L, 1L), Row("c", 5L, 1L),
        Row("d", 7L, 1L)))
  }

  test("group-column TYPE drift between base and MV refuses the " +
      "rewrite (free-form graft.mv.* metadata must never install a " +
      "wrong-typed alias)") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvt_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvt_agg")
    sql("CREATE TABLE gmv.default.mvt_base (k STRING, v BIGINT)")
    sql("INSERT INTO gmv.default.mvt_base VALUES ('1', 5), ('2', 7)")
    // MV declares group column k as INT — name matches, type drifted
    sql("""CREATE TABLE gmv.default.mvt_agg (k INT, sum_v BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mvt_base',
                          'graft.mv.group' = 'k',
                          'graft.mv.agg' = 'sum:v:sum_v')""")
    sql("""INSERT OVERWRITE gmv.default.mvt_agg
           SELECT CAST(k AS INT), SUM(v) FROM gmv.default.mvt_base
           GROUP BY k""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mvt_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mvt_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mvt_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvt_agg')""")
    val q = sql("""SELECT k, SUM(v) AS s FROM gmv.default.mvt_base
                   GROUP BY k ORDER BY k""")
    assert(scansOf(q).forall(!_.contains("mvt_agg")),
      s"type-drifted MV must refuse, got ${scansOf(q)}")
    assert(q.collect().toSeq == Seq(Row("1", 5L), Row("2", 7L)))
    // same for a WHERE remap onto the drifted column
    val f = sql("""SELECT k, SUM(v) AS s FROM gmv.default.mvt_base
                   WHERE k = '1' GROUP BY k""")
    assert(scansOf(f).forall(!_.contains("mvt_agg")))
    assert(f.collect().toSeq == Seq(Row("1", 5L)))
  }

  test("freshnessTtlMs amortizes the on-disk check: no log listing " +
      "inside the TTL, the check re-runs after it, and SAME-process " +
      "staleness still kills the rewrite instantly") {
    setup()
    def serve(): Boolean = scansOf(sql(
      """SELECT k, SUM(v) AS s FROM gmv.default.mv_base GROUP BY k"""))
      .exists(_.contains("mv_agg"))
    spark.conf.set("spark.graft.mvRewrite.freshnessTtlMs", "60000")
    try {
      assert(serve())
      val after1 = MvRewrite.freshnessDiskChecks.get()
      assert(serve()); assert(serve())
      assert(MvRewrite.freshnessDiskChecks.get() == after1,
        "within the TTL no further on-disk freshness check may run")
      // a same-process commit mutates the shared handle — the rewrite
      // must die instantly even though the TTL suppresses disk reads
      sql("INSERT INTO gmv.default.mv_base VALUES ('z', 1, 1.0)")
      assert(!serve(), "stale MV served under TTL — wrong")
    } finally spark.conf.unset("spark.graft.mvRewrite.freshnessTtlMs")
    // TTL off (default): every pass checks the disk again
    val before = MvRewrite.freshnessDiskChecks.get()
    serve(); serve()
    assert(MvRewrite.freshnessDiskChecks.get() > before)
  }

  /** Star-schema (join) MV fixture: fact sales ⨝ dim regions. */
  private def setupJoin(): Unit = {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.sales_f")
    sql("DROP TABLE IF EXISTS gmv.default.regions_d")
    sql("DROP TABLE IF EXISTS gmv.default.sales_mv")
    sql("CREATE TABLE gmv.default.sales_f (region_id BIGINT, " +
      "amount BIGINT, qty BIGINT)")
    sql("""INSERT INTO gmv.default.sales_f VALUES
      (1, 10, 1), (1, 20, 2), (2, 5, 1), (3, 7, 4), (1, 100, 1)""")
    sql("CREATE TABLE gmv.default.regions_d (region_id BIGINT, " +
      "rname STRING)")
    sql("""INSERT INTO gmv.default.regions_d VALUES
      (1, 'east'), (2, 'west'), (3, 'east')""")
    sql("""CREATE TABLE gmv.default.sales_mv
           (rname STRING, sum_a BIGINT, n BIGINT)
           TBLPROPERTIES (
             'graft.mv.of' = 'default/sales_f',
             'graft.mv.join_dim' = 'default/regions_d',
             'graft.mv.join_on' = 'region_id=region_id',
             'graft.mv.group' = 'rname',
             'graft.mv.agg' = 'sum:amount:sum_a,count:*:n')""")
    refreshJoin()
    sql("""ALTER TABLE gmv.default.sales_f
           SET TBLPROPERTIES ('graft.mv.tables' = 'sales_mv')""")
  }

  private def refreshJoin(): Unit = {
    sql("""INSERT OVERWRITE gmv.default.sales_mv
           SELECT r.rname, SUM(f.amount), COUNT(*)
           FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
             ON f.region_id = r.region_id
           GROUP BY r.rname""")
    def ver(t: String): String =
      sql(s"SHOW TBLPROPERTIES gmv.default.$t").collect()
        .collectFirst {
          case r if r.getString(0) == "graft.current_version" =>
            r.getString(1)
        }.get
    sql(s"""ALTER TABLE gmv.default.sales_mv SET TBLPROPERTIES (
            'graft.mv.base_version' = '${ver("sales_f")}',
            'graft.mv.dim_version' = '${ver("regions_d")}')""")
  }

  private val joinAgg =
    """SELECT r.rname, SUM(f.amount) AS sum_a, COUNT(*) AS n
       FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
         ON f.region_id = r.region_id
       GROUP BY r.rname ORDER BY r.rname"""

  test("star-schema MV: a fresh dim⨝fact aggregate serves from the " +
      "MV; values are the join truth") {
    setupJoin()
    val q = sql(joinAgg)
    assert(scansOf(q).exists(_.contains("sales_mv")),
      s"expected the MV scan, got ${scansOf(q)}:\n" +
        q.queryExecution.executedPlan)
    spark.conf.set("spark.graft.mvRewrite", "false")
    val truth = try sql(joinAgg).collect().toSeq
      finally spark.conf.unset("spark.graft.mvRewrite")
    assert(q.collect().toSeq == truth)
    assert(truth == Seq(Row("east", 137L, 4L), Row("west", 5L, 1L)))
  }

  test("star-schema MV: a WHERE on the dim's group column commutes " +
      "and re-applies on the MV; ungrouped roll-up over the join " +
      "serves too") {
    setupJoin()
    val fil = sql(
      """SELECT r.rname, COUNT(*) AS n
         FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
           ON f.region_id = r.region_id
         WHERE r.rname = 'east' GROUP BY r.rname""")
    assert(scansOf(fil).exists(_.contains("sales_mv")),
      s"got ${scansOf(fil)}:\n${fil.queryExecution.optimizedPlan}")
    assert(fil.collect().toSeq == Seq(Row("east", 4L)))
    val global = sql(
      """SELECT SUM(f.amount) AS s, COUNT(*) AS n
         FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
           ON f.region_id = r.region_id""")
    assert(scansOf(global).exists(_.contains("sales_mv")),
      s"got ${scansOf(global)}")
    assert(global.collect().toSeq == Seq(Row(142L, 5L)))
  }

  test("star-schema MV: a commit on EITHER constituent staleness-" +
      "kills the rewrite until re-refresh") {
    setupJoin()
    sql("INSERT INTO gmv.default.regions_d VALUES (4, 'north')")
    val q1 = sql(joinAgg)
    assert(scansOf(q1).forall(!_.contains("sales_mv")),
      "dim commit must kill the rewrite")
    assert(q1.collect().toSeq ==
      Seq(Row("east", 137L, 4L), Row("west", 5L, 1L)))
    refreshJoin()
    assert(scansOf(sql(joinAgg)).exists(_.contains("sales_mv")))
    sql("INSERT INTO gmv.default.sales_f VALUES (4, 1000, 1)")
    val q2 = sql(joinAgg)
    assert(scansOf(q2).forall(!_.contains("sales_mv")),
      "fact commit must kill the rewrite")
    assert(q2.collect().toSeq == Seq(Row("east", 137L, 4L),
      Row("north", 1000L, 1L), Row("west", 5L, 1L)))
  }

  test("star-schema MV refusals: wrong join key, non-inner join, " +
      "filter on a non-group fact column — all run the real join") {
    setupJoin()
    // join on a DIFFERENT key pair than recorded
    val wrongKey = sql(
      """SELECT r.rname, COUNT(*) AS n
         FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
           ON f.amount = r.region_id GROUP BY r.rname""")
    assert(scansOf(wrongKey).forall(!_.contains("sales_mv")))
    // LEFT join keeps null-extended rows the MV never saw
    val left = sql(
      """SELECT r.rname, COUNT(*) AS n
         FROM gmv.default.sales_f f LEFT JOIN gmv.default.regions_d r
           ON f.region_id = r.region_id GROUP BY r.rname""")
    assert(scansOf(left).forall(!_.contains("sales_mv")))
    // WHERE on a fact measure column is not commutable
    val mfil = sql(
      """SELECT r.rname, COUNT(*) AS n
         FROM gmv.default.sales_f f JOIN gmv.default.regions_d r
           ON f.region_id = r.region_id
         WHERE f.amount > 8 GROUP BY r.rname ORDER BY r.rname""")
    assert(scansOf(mfil).forall(!_.contains("sales_mv")))
    assert(mfil.collect().toSeq ==
      Seq(Row("east", 3L)))
  }

  test("COUNT(col) and global (ungrouped) aggregates rewrite too") {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mvg_base")
    sql("DROP TABLE IF EXISTS gmv.default.mvg_agg")
    sql("CREATE TABLE gmv.default.mvg_base (k STRING, v BIGINT)")
    sql("""INSERT INTO gmv.default.mvg_base VALUES
      ('a', 1), ('a', NULL), ('b', 5)""")
    sql("""CREATE TABLE gmv.default.mvg_agg (nv BIGINT, n BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/mvg_base',
                          'graft.mv.group' = '',
                          'graft.mv.agg' = 'count:v:nv,count:*:n')""")
    sql("""INSERT OVERWRITE gmv.default.mvg_agg
           SELECT COUNT(v), COUNT(*) FROM gmv.default.mvg_base""")
    val vNow = sql("SHOW TBLPROPERTIES gmv.default.mvg_base").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1) }.get
    sql(s"""ALTER TABLE gmv.default.mvg_agg
            SET TBLPROPERTIES ('graft.mv.base_version' = '$vNow')""")
    sql("""ALTER TABLE gmv.default.mvg_base
           SET TBLPROPERTIES ('graft.mv.tables' = 'mvg_agg')""")
    val q = sql("""SELECT COUNT(v) AS nv, COUNT(*) AS n
                   FROM gmv.default.mvg_base""")
    assert(scansOf(q).exists(_.contains("mvg_agg")),
      s"got ${scansOf(q)}:\n${q.queryExecution.executedPlan}")
    assert(q.collect().toSeq == Seq(Row(2L, 3L)))
  }

  /** 2-dim star fixture with a COMPOUND key on dim 1 (VERDICT r14
    * item 2): fact ev_f ⨝ regions2_d ON (region_id, site) ⨝ prods_d
    * ON prod_id, MV grouped by (rname, pcat). */
  private def setupStar2(): Unit = {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.ev_f")
    sql("DROP TABLE IF EXISTS gmv.default.regions2_d")
    sql("DROP TABLE IF EXISTS gmv.default.prods_d")
    sql("DROP TABLE IF EXISTS gmv.default.ev_mv")
    sql("CREATE TABLE gmv.default.ev_f (region_id BIGINT, site STRING, " +
      "prod_id BIGINT, amount BIGINT)")
    sql("""INSERT INTO gmv.default.ev_f VALUES
      (1, 'a', 10, 100), (1, 'a', 11, 20), (1, 'b', 10, 3),
      (2, 'a', 11, 7), (2, 'a', 10, 50), (1, 'a', 10, 9)""")
    sql("CREATE TABLE gmv.default.regions2_d (region_id BIGINT, " +
      "site STRING, rname STRING)")
    sql("""INSERT INTO gmv.default.regions2_d VALUES
      (1, 'a', 'east'), (1, 'b', 'north'), (2, 'a', 'west')""")
    sql("CREATE TABLE gmv.default.prods_d (prod_id BIGINT, pcat STRING)")
    sql("""INSERT INTO gmv.default.prods_d VALUES
      (10, 'toys'), (11, 'tools')""")
    sql("""CREATE TABLE gmv.default.ev_mv
           (rname STRING, pcat STRING, sum_a BIGINT, n BIGINT)
           TBLPROPERTIES (
             'graft.mv.of' = 'default/ev_f',
             'graft.mv.join_dim' = 'default/regions2_d,default/prods_d',
             'graft.mv.join_on' =
               'region_id=region_id&site=site;prod_id=prod_id',
             'graft.mv.group' = 'rname,pcat',
             'graft.mv.agg' = 'sum:amount:sum_a,count:*:n')""")
    refreshStar2()
    sql("""ALTER TABLE gmv.default.ev_f
           SET TBLPROPERTIES ('graft.mv.tables' = 'ev_mv')""")
  }

  private def refreshStar2(): Unit = {
    sql("""INSERT OVERWRITE gmv.default.ev_mv
           SELECT r.rname, p.pcat, SUM(f.amount), COUNT(*)
           FROM gmv.default.ev_f f
           JOIN gmv.default.regions2_d r
             ON f.region_id = r.region_id AND f.site = r.site
           JOIN gmv.default.prods_d p ON f.prod_id = p.prod_id
           GROUP BY r.rname, p.pcat""")
    def ver(t: String): String =
      sql(s"SHOW TBLPROPERTIES gmv.default.$t").collect()
        .collectFirst {
          case r if r.getString(0) == "graft.current_version" =>
            r.getString(1)
        }.get
    sql(s"""ALTER TABLE gmv.default.ev_mv SET TBLPROPERTIES (
            'graft.mv.base_version' = '${ver("ev_f")}',
            'graft.mv.dim_version' =
              '${ver("regions2_d")},${ver("prods_d")}')""")
  }

  private val star2Agg =
    """SELECT r.rname, p.pcat, SUM(f.amount) AS sum_a, COUNT(*) AS n
       FROM gmv.default.ev_f f
       JOIN gmv.default.regions2_d r
         ON f.region_id = r.region_id AND f.site = r.site
       JOIN gmv.default.prods_d p ON f.prod_id = p.prod_id
       GROUP BY r.rname, p.pcat ORDER BY r.rname, p.pcat"""

  test("2-dim star MV with a compound key: the full join-agg serves " +
      "from the MV and a one-dim roll-up serves too") {
    setupStar2()
    val q = sql(star2Agg)
    assert(scansOf(q).exists(_.contains("ev_mv")),
      s"expected the MV scan, got ${scansOf(q)}:\n" +
        q.queryExecution.executedPlan)
    spark.conf.set("spark.graft.mvRewrite", "false")
    val truth = try sql(star2Agg).collect().toSeq
      finally spark.conf.unset("spark.graft.mvRewrite")
    assert(q.collect().toSeq == truth)
    // roll-up: GROUP BY a subset (pcat only) re-aggregates the MV's
    // (rname, pcat) partials — the snowflake-dashboard composition
    val ru = sql(
      """SELECT p.pcat, SUM(f.amount) AS sum_a, COUNT(*) AS n
         FROM gmv.default.ev_f f
         JOIN gmv.default.regions2_d r
           ON f.region_id = r.region_id AND f.site = r.site
         JOIN gmv.default.prods_d p ON f.prod_id = p.prod_id
         GROUP BY p.pcat ORDER BY p.pcat""")
    assert(scansOf(ru).exists(_.contains("ev_mv")),
      s"roll-up should serve from the MV, got ${scansOf(ru)}")
    assert(ru.collect().toSeq ==
      Seq(Row("tools", 27L, 2L), Row("toys", 162L, 4L)))
  }

  test("2-dim star MV: a commit on ANY constituent staleness-kills " +
      "the rewrite until re-refresh") {
    setupStar2()
    assert(scansOf(sql(star2Agg)).exists(_.contains("ev_mv")))
    // dim 2 commit
    sql("INSERT INTO gmv.default.prods_d VALUES (12, 'misc')")
    assert(!scansOf(sql(star2Agg)).exists(_.contains("ev_mv")),
      "prods_d commit must kill the rewrite")
    refreshStar2()
    assert(scansOf(sql(star2Agg)).exists(_.contains("ev_mv")))
    // dim 1 commit
    sql("INSERT INTO gmv.default.regions2_d VALUES (3, 'a', 'south')")
    assert(!scansOf(sql(star2Agg)).exists(_.contains("ev_mv")),
      "regions2_d commit must kill the rewrite")
    refreshStar2()
    assert(scansOf(sql(star2Agg)).exists(_.contains("ev_mv")))
    // fact commit
    sql("INSERT INTO gmv.default.ev_f VALUES (1, 'a', 10, 1)")
    assert(!scansOf(sql(star2Agg)).exists(_.contains("ev_mv")),
      "fact commit must kill the rewrite")
    refreshStar2()
    val q = sql(star2Agg)
    assert(scansOf(q).exists(_.contains("ev_mv")))
    spark.conf.set("spark.graft.mvRewrite", "false")
    val truth = try sql(star2Agg).collect().toSeq
      finally spark.conf.unset("spark.graft.mvRewrite")
    assert(q.collect().toSeq == truth)
  }

  test("compound-key boundary: joining on PART of the recorded key " +
      "refuses, an EXTRA conjunct refuses, the exact conjunction " +
      "serves") {
    setupStar2()
    // missing the site conjunct: a recorded pair stays unmatched
    val partial = sql(
      """SELECT r.rname, p.pcat, SUM(f.amount) AS sum_a
         FROM gmv.default.ev_f f
         JOIN gmv.default.regions2_d r ON f.region_id = r.region_id
         JOIN gmv.default.prods_d p ON f.prod_id = p.prod_id
         GROUP BY r.rname, p.pcat""")
    assert(!scansOf(partial).exists(_.contains("ev_mv")),
      "partial compound key must refuse the rewrite")
    // an extra equi-conjunct beyond the recorded pairs
    val extra = sql(
      """SELECT r.rname, p.pcat, SUM(f.amount) AS sum_a
         FROM gmv.default.ev_f f
         JOIN gmv.default.regions2_d r
           ON f.region_id = r.region_id AND f.site = r.site
              AND f.amount = r.region_id
         JOIN gmv.default.prods_d p ON f.prod_id = p.prod_id
         GROUP BY r.rname, p.pcat""")
    assert(!scansOf(extra).exists(_.contains("ev_mv")),
      "extra join conjunct must refuse the rewrite")
    // the exact recorded conjunction (other orientation) serves
    val exact = sql(
      """SELECT r.rname, p.pcat, SUM(f.amount) AS sum_a
         FROM gmv.default.prods_d p
         JOIN gmv.default.ev_f f ON p.prod_id = f.prod_id
         JOIN gmv.default.regions2_d r
           ON r.site = f.site AND r.region_id = f.region_id
         GROUP BY r.rname, p.pcat""")
    assert(scansOf(exact).exists(_.contains("ev_mv")),
      s"exact compound key must serve, got ${scansOf(exact)}:\n" +
        exact.queryExecution.executedPlan)
  }
}
