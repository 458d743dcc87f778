package graft

/** Multi-namespace DDL (VERDICT r12 item 6): CREATE/DROP/ALTER
  * NAMESPACE persisted in the warehouse's `_namespaces.json` under the
  * same cross-process lock as the table index; two-level table idents;
  * cross-namespace RENAME as pure metadata. */
class MultiNamespaceSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gns",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP NAMESPACE IF EXISTS gns.nsa CASCADE")
    sql("DROP NAMESPACE IF EXISTS gns.nsb CASCADE")
  }

  test("namespace lifecycle: create, list, properties, alter, drop") {
    setup()
    sql("CREATE NAMESPACE gns.nsa WITH PROPERTIES ('team' = 'data-eng')")
    sql("CREATE NAMESPACE gns.nsb")
    val names = sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).toSet
    assert(names.contains("default") && names.contains("nsa") &&
      names.contains("nsb"), s"namespaces: $names")
    // properties round-trip + ALTER
    val props = sql("DESCRIBE NAMESPACE EXTENDED gns.nsa").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("Properties").exists(_.contains("team")),
      s"props: $props")
    sql("ALTER NAMESPACE gns.nsa SET PROPERTIES ('tier' = 'gold')")
    val props2 = sql("DESCRIBE NAMESPACE EXTENDED gns.nsa").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("Properties").exists(p =>
      p.contains("tier") && p.contains("team")), s"props2: $props2")
    // duplicate CREATE rejects; IF NOT EXISTS is quiet
    assert(intercept[Exception](sql("CREATE NAMESPACE gns.nsa")) != null)
    sql("CREATE NAMESPACE IF NOT EXISTS gns.nsa")
    assert(sql("SHOW NAMESPACES IN gns").count() >= 3)
    sql("DROP NAMESPACE gns.nsb")
    assert(!sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).contains("nsb"))
    sql("DROP NAMESPACE gns.nsa")
  }

  test("tables live in their namespace; cross-namespace rename is " +
      "metadata-only; DROP NAMESPACE guards content") {
    setup()
    sql("CREATE NAMESPACE gns.nsa")
    sql("CREATE NAMESPACE gns.nsb")
    sql("CREATE TABLE gns.nsa.t (k BIGINT, v STRING)")
    sql("INSERT INTO gns.nsa.t VALUES (1, 'a'), (2, 'b')")
    // same table NAME in another namespace is a different table
    sql("CREATE TABLE gns.nsb.t (k BIGINT, v STRING)")
    sql("INSERT INTO gns.nsb.t VALUES (9, 'z')")
    assert(sql("SELECT count(*) FROM gns.nsa.t").head().getLong(0) == 2)
    assert(sql("SELECT count(*) FROM gns.nsb.t").head().getLong(0) == 1)
    assert(sql("SHOW TABLES IN gns.nsa").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // cross-namespace rename: directory unchanged, content travels
    val dirBefore = tblDir("nsa", "t")
    sql("ALTER TABLE gns.nsa.t RENAME TO nsb.t2")
    assert(tblDir("nsb", "t2") == dirBefore,
      "cross-namespace rename must not move the table directory")
    assert(sql("SELECT count(*) FROM gns.nsb.t2").head().getLong(0) == 2)
    assert(intercept[Exception](
      sql("SELECT * FROM gns.nsa.t")) != null)
    // non-empty namespace refuses a bare DROP, cascade removes content
    assert(intercept[Exception](sql("DROP NAMESPACE gns.nsb")) != null)
    sql("DROP NAMESPACE gns.nsb CASCADE")
    assert(intercept[Exception](
      sql("SELECT * FROM gns.nsb.t2")) != null)
    sql("DROP NAMESPACE gns.nsa")
  }

  test("CREATE TABLE into an unregistered namespace fails loudly; " +
      "namespaces persist across a cold load") {
    setup()
    assert(intercept[Exception](
      sql("CREATE TABLE gns.nope.t (k BIGINT)")) != null)
    sql("CREATE NAMESPACE gns.nsa")
    sql("CREATE TABLE gns.nsa.t (k BIGINT)")
    sql("INSERT INTO gns.nsa.t VALUES (7)")
    // cold load: drop every cached handle — the warehouse files are
    // the only truth, as for a fresh JVM
    graft.catalog.GraftCatalog.dropHandlesForTest()
    assert(sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).contains("nsa"))
    assert(sql("SELECT k FROM gns.nsa.t").head().getLong(0) == 7)
    sql("DROP NAMESPACE gns.nsa CASCADE")
  }

  private def tblDir(ns: String, name: String): String =
    spark.sessionState.catalogManager.catalog("gns")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(ns), name))
      .asInstanceOf[graft.catalog.GraftTable].dir.toString
}
