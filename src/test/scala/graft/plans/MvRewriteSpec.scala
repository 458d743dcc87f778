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
    // DISTINCT aggregation
    val dis = sql("""SELECT k, COUNT(DISTINCT v) AS s
                     FROM gmv.default.mv_base GROUP BY k""")
    assert(scansOf(dis).forall(!_.contains("mv_agg")))
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
}
