package graft

import org.apache.spark.sql.Row

/** Incremental append feed on plain copy-on-write tables
  * ([[graft.catalog.GraftCowChangeFeedTable]]): `<t>$changes` serves
  * the rows of the files ADDED in a (from, to] version (or timestamp)
  * range as `(__op = 0, __ver, <data>)` — Iceberg's incremental
  * append scan, computed from a retained-snapshot set diff.
  *
  * Pinned contracts: exact (a, b] slicing with per-commit __ver
  * attribution; timestamp bounds resolve through the same commit-time
  * axis; any file REMOVED inside the range refuses loudly (overwrite,
  * DML, compaction — an insert-only feed cannot represent deletions);
  * a file added-then-removed inside the range refuses; unbounded
  * reads need a complete retained history; non-retained endpoints
  * refuse. */
class CowChangeFeedSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String, props: String = ""): String = {
    spark.conf.set("spark.sql.catalog.gcow",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gcow.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    val tail = if (props.isEmpty) "" else s" TBLPROPERTIES ($props)"
    sql(s"CREATE TABLE $t (k BIGINT, v STRING)$tail")
    t
  }

  private def feed(t: String): String = {
    val i = t.lastIndexOf('.')
    s"${t.take(i)}.`${t.drop(i + 1)}$$changes`"
  }

  private def bounded(t: String, from: Option[Int], to: Option[Int]) = {
    var r = spark.read
    from.foreach(f => r = r.option("from_version", f.toString))
    to.foreach(x => r = r.option("to_version", x.toString))
    r.table(feed(t))
  }

  test("(a, b] slices the appended files exactly, attributed to their " +
      "commit versions; unbounded = the whole retained history") {
    val t = setup("cow_slice")
    sql(s"INSERT INTO $t VALUES (1, 'a')")            // v0
    sql(s"INSERT INTO $t VALUES (2, 'b'), (3, 'b')")  // v1
    sql(s"INSERT INTO $t VALUES (4, 'c')")            // v2
    assert(bounded(t, Some(0), Some(1)).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq ==
      Seq((0, 1, 2L), (0, 1, 3L)))
    assert(bounded(t, Some(1), None).collect().map(_.getLong(2)).toSeq ==
      Seq(4L))
    assert(bounded(t, None, None).count() == 4L)
    // empty range is empty, not an error
    assert(bounded(t, Some(2), Some(2)).count() == 0L)
    // timestamp spelling rides the same snapshot commit-time axis
    val tsMid = sql(s"SELECT 1").sparkSession
      .sessionState.catalogManager.catalog("gcow")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "cow_slice"))
      .asInstanceOf[graft.catalog.GraftTable]
      .stateNow.snapshots.find(_.version == 1).get.tsMillis
    assert(spark.read.option("from_timestamp", tsMid.toString)
      .table(feed(t)).collect().map(_.getLong(2)).toSeq == Seq(4L))
  }

  test("removals inside the range refuse loudly: overwrite, row-level " +
      "DML, and compaction are not representable; disjoint later " +
      "ranges still serve") {
    val t = setup("cow_removed")
    sql(s"INSERT INTO $t VALUES (1, 'a')")            // v0
    sql(s"INSERT INTO $t VALUES (2, 'b')")            // v1
    sql(s"UPDATE $t SET v = 'x' WHERE k = 1")         // v2: rewrites a file
    sql(s"INSERT INTO $t VALUES (3, 'c')")            // v3
    val e = intercept[Exception] {
      bounded(t, Some(0), Some(3)).collect()
    }
    assert(e.getMessage.contains("removed inside"), e.getMessage)
    // the post-rewrite range is append-only again
    assert(bounded(t, Some(2), Some(3)).collect().map(_.getLong(2))
      .toSeq == Seq(3L))
  }

  test("a file added AND removed inside the range refuses; endpoints " +
      "outside retention refuse; incomplete-history unbounded refuses") {
    val t = setup("cow_addrm")
    sql(s"INSERT INTO $t VALUES (1, 'a')")            // v0
    sql(s"INSERT INTO $t VALUES (2, 'b')")            // v1 (added...)
    sql(s"DELETE FROM $t WHERE k = 2")                // v2 (...removed)
    val e = intercept[Exception] {
      bounded(t, Some(0), Some(2)).collect()
    }
    assert(e.getMessage.contains("cannot") ||
      e.getMessage.contains("removed"), e.getMessage)
    // retention-trimmed endpoints
    val t2 = setup("cow_trim", "'graft.retain'='2'")
    sql(s"INSERT INTO $t2 VALUES (1, 'a')")           // v0 (trimmed)
    sql(s"INSERT INTO $t2 VALUES (2, 'b')")           // v1
    sql(s"INSERT INTO $t2 VALUES (3, 'c')")           // v2
    val e2 = intercept[Exception] {
      bounded(t2, Some(0), Some(2)).collect()
    }
    assert(e2.getMessage.contains("not a retained snapshot"),
      e2.getMessage)
    val e3 = intercept[Exception] { bounded(t2, None, None).collect() }
    assert(e3.getMessage.contains("COMPLETE retained history"),
      e3.getMessage)
    // the retained tail still serves
    assert(bounded(t2, Some(1), Some(2)).collect().map(_.getLong(2))
      .toSeq == Seq(3L))
  }

  test("a tag-induced GAP in the retained window refuses: an " +
      "added-then-removed file inside the gap must not vanish " +
      "silently") {
    val t = setup("cow_gap", "'graft.retain'='2'")
    sql(s"INSERT INTO $t VALUES (1, 'a')")            // v0
    // tagging commits a NEW pinned snapshot of the current content
    sql(s"CALL gcow.system.tag('default.cow_gap', 'seed')") // v1 (tagged)
    sql(s"INSERT INTO $t VALUES (2, 'b')")            // v2
    sql(s"INSERT INTO $t VALUES (3, 'c')")            // v3
    sql(s"INSERT INTO $t VALUES (4, 'd')")            // v4 (v2 trimmed)
    // window now holds v1 (tagged) + v3 + v4 — (1, 4] spans the gap
    val e = intercept[Exception] {
      bounded(t, Some(1), Some(4)).collect()
    }
    assert(e.getMessage.contains("retention-trimmed"), e.getMessage)
    // the contiguous retained tail still serves
    assert(bounded(t, Some(3), Some(4)).collect().map(_.getLong(2))
      .toSeq == Seq(4L))
  }

  test("a consumer reconstructs the table from a snapshot plus " +
      "bounded slices") {
    val t = setup("cow_mirror")
    sql(s"INSERT INTO $t SELECT id, 'w1' FROM range(0, 50)")   // v0
    sql(s"INSERT INTO $t SELECT id, 'w2' FROM range(50, 80)")  // v1
    sql(s"INSERT INTO $t SELECT id, 'w3' FROM range(80, 100)") // v2
    val mirror = sql(s"SELECT k, v FROM $t VERSION AS OF 0").collect()
      .toSeq ++
      bounded(t, Some(0), Some(2)).collect()
        .map(r => Row(r.getLong(2), r.getString(3))).toSeq
    val direct = sql(s"SELECT k, v FROM $t").collect().toSeq
    assert(mirror.toSet == direct.toSet && mirror.size == direct.size)
  }
}
