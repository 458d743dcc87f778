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

/** `$partitions` metadata-table contracts (q245). */
class PartitionsTableSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  test("per-partition census: exact file/row/byte counts from refs; " +
      "null partitions census too; unpartitioned tables reject") {
    spark.conf.set("spark.sql.catalog.gpt",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gpt.default.pt")
    sql("""CREATE TABLE gpt.default.pt (k BIGINT, p STRING)
           PARTITIONED BY (p)""")
    // two single-task inserts -> 2 files per live partition value
    sql("INSERT INTO gpt.default.pt VALUES (1,'a'),(2,'a'),(3,'b')")
    sql("INSERT INTO gpt.default.pt VALUES (4,'a'),(5,'b')")
    val got = sql("""SELECT partition, n_files, n_rows
                     FROM gpt.default.`pt$partitions` ORDER BY partition""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("p=a", 2L, 3L), ("p=b", 2L, 2L)), s"census: $got")
    // bytes are the exact recorded file sizes
    val bytes = sql("SELECT sum(n_bytes) FROM gpt.default.`pt$partitions`")
      .head().getLong(0)
    val fileBytes = sql("SELECT sum(n_bytes) FROM gpt.default.`pt$files`")
      .head().getLong(0)
    assert(bytes == fileBytes && bytes > 0)
    // a null partition value still censuses (rendered, not dropped)
    sql("INSERT INTO gpt.default.pt VALUES (6, NULL)")
    val withNull = sql("""SELECT partition, n_rows
                          FROM gpt.default.`pt$partitions`
                          ORDER BY partition""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(withNull.contains(("p=null", 1L)), s"null census: $withNull")
    // unpartitioned table: loud reject
    sql("DROP TABLE IF EXISTS gpt.default.flat")
    sql("CREATE TABLE gpt.default.flat (k BIGINT)")
    assert(intercept[Exception](
      sql("SELECT * FROM gpt.default.`flat$partitions`").collect()) != null)
    // MOR with a live delta log: loud compact-first reject (delta rows
    // are not partition-attributable from metadata); after compaction
    // the census serves again
    sql("DROP TABLE IF EXISTS gpt.default.ptm")
    sql("""CREATE TABLE gpt.default.ptm (k BIGINT, p STRING)
           PARTITIONED BY (p)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gpt.default.ptm VALUES (1,'a'),(2,'b')")
    sql("UPDATE gpt.default.ptm SET p = 'a' WHERE k = 2")
    assert(intercept[Exception](
      sql("SELECT * FROM gpt.default.`ptm$partitions`").collect()) != null)
    sql("CALL gpt.system.compact('default.ptm')")
    val mor = sql("""SELECT partition, n_rows
                     FROM gpt.default.`ptm$partitions`
                     ORDER BY partition""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mor == Seq(("p=a", 2L)), s"post-compact census: $mor")
    sql("DROP TABLE gpt.default.pt")
    sql("DROP TABLE gpt.default.flat")
    sql("DROP TABLE gpt.default.ptm")
  }
}
