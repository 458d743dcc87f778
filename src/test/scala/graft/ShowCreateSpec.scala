package graft

/** `CALL system.show_create` — runnable DDL reconstruction. The pinned
  * contract is ROUND-TRIP: executing the emitted statement under a new
  * name yields a table with identical schema (incl. generated-column
  * definitions), partitioning, mode, and tunables. */
class ShowCreateSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  test("emitted DDL round-trips a hidden-partitioned, bloomed, " +
      "generated-column table") {
    spark.conf.set("spark.sql.catalog.gsc",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gsc.default.sc_src")
    sql("DROP TABLE IF EXISTS gsc.default.sc_copy")
    sql("""CREATE TABLE gsc.default.sc_src
           (id BIGINT, ts TIMESTAMP, price DOUBLE,
            cents BIGINT GENERATED ALWAYS AS
              (CAST(round(price * 100) AS BIGINT)))
           PARTITIONED BY (days(ts))
           TBLPROPERTIES ('graft.bloom_by'='id', 'graft.retain'='8')""")
    val ddl = sql("CALL gsc.system.show_create('default.sc_src')")
      .collect()(0).getString(1)
    assert(ddl.contains("GENERATED ALWAYS AS"), ddl)
    assert(ddl.contains("PARTITIONED BY (days(ts))"), ddl)
    assert(ddl.contains("'graft.bloom_by'='id'"), ddl)
    // round-trip: run it under a new name, compare definitions
    sql(ddl.replace("default.sc_src", "default.sc_copy"))
    def defn(n: String): (String, Map[String, String]) = {
      val t = spark.sessionState.catalogManager.catalog("gsc")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("default"), n))
      val props = sql(s"SHOW TBLPROPERTIES gsc.default.$n").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
        .filter { case (k, _) => k.startsWith("graft.") &&
          !k.startsWith("graft.current") && k != "graft.data_files" &&
          k != "graft.delta_files" }
      (t.schema().json, props)
    }
    val (s1, p1) = defn("sc_src")
    val (s2, p2) = defn("sc_copy")
    assert(s1 == s2, s"schema drift:\n$s1\n$s2")
    assert(p1 == p2, s"props drift:\n$p1\n$p2")
    // the copy actually COMPUTES the generated column
    sql("INSERT INTO gsc.default.sc_copy (id, ts, price) VALUES " +
      "(1, timestamp'2024-03-15 10:00:00', 2.5)")
    assert(sql("SELECT cents FROM gsc.default.sc_copy").head()
      .getLong(0) == 250L)
  }

  test("MOR tables round-trip their mode and row id") {
    spark.conf.set("spark.sql.catalog.gsc",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gsc.default.sc_mor")
    sql("DROP TABLE IF EXISTS gsc.default.sc_mor2")
    sql("""CREATE TABLE gsc.default.sc_mor (k BIGINT NOT NULL, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    val ddl = sql("CALL gsc.system.show_create('default.sc_mor')")
      .collect()(0).getString(1)
    assert(ddl.contains("'graft.mode'='mor'"), ddl)
    assert(ddl.contains("'graft.row_id'='k'"), ddl)
    sql(ddl.replace("default.sc_mor", "default.sc_mor2"))
    sql("INSERT INTO gsc.default.sc_mor2 VALUES (1, 'a')")
    sql("UPDATE gsc.default.sc_mor2 SET v = 'b' WHERE k = 1")
    assert(sql("SELECT v FROM gsc.default.sc_mor2").head()
      .getString(0) == "b")
  }
}
