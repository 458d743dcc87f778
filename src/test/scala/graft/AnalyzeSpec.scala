package graft

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `CALL system.analyze` (q265): table-level column NDVs persisted as
  * version-stamped graft.stats.* properties and served to CBO through
  * the scan's column statistics.
  *
  * Pinned contracts: the analyzed number replaces the summed per-file
  * UPPER bound while fresh; ANY commit invalidates the stamp (fallback
  * to the bound — stale stats are never served as fresh); approx mode
  * lands within HLL++ error of exact; unknown columns reject; the
  * stats survive a cold reload of the handle. */
class AnalyzeSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.gan",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gan.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    // two files with OVERLAPPING key ranges: exact NDV = 15, summed
    // per-file bound = 20
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, 'a' " +
      "FROM range(0, 10)")
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, 'b' " +
      "FROM range(5, 15)")
    t
  }

  private def ndvServed(name: String, col: String): Long = {
    val t = spark.sessionState.catalogManager.catalog("gan")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), name))
      .asInstanceOf[graft.catalog.GraftTable]
    val scan = t.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[graft.catalog.GraftScan]
    val cs = scan.estimateStatistics().columnStats()
    val st = cs.get(
      org.apache.spark.sql.connector.expressions.Expressions.column(col))
    assert(st != null, s"no column stats for $col")
    st.distinctCount().orElse(-1L)
  }

  test("analyze replaces the summed upper bound with the exact NDV, " +
      "and a later commit invalidates it") {
    setup("an_basic")
    // pre-analyze: the summed bound double-counts the overlap
    assert(ndvServed("an_basic", "k") == 20L)
    val out = sql("CALL gan.system.analyze('default.an_basic', 'k,v')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set(("k", 15L, 1L), ("v", 2L, 1L)), out.toSeq)
    assert(ndvServed("an_basic", "k") == 15L, "analyzed NDV served")
    assert(ndvServed("an_basic", "v") == 2L)
    // any commit bumps the version -> analyzed stamp goes stale ->
    // fallback to the (recomputed) bound, loudly conservative
    sql("INSERT INTO gan.default.an_basic SELECT /*+ REPARTITION(1) */ " +
      "id, 'c' FROM range(100, 105)")
    assert(ndvServed("an_basic", "k") == 25L,
      "stale analyzed stats must NOT be served")
  }

  test("approx mode lands within HLL++ error of exact") {
    setup("an_approx")
    val out = sql("CALL gan.system.analyze('default.an_approx', 'k', " +
      "approx => true)").collect()
    val est = out(0).getLong(1)
    assert(math.abs(est - 15L) <= 3, s"approx NDV too far off: $est")
  }

  test("unknown analyze columns reject loudly") {
    setup("an_bad")
    val e = intercept[Exception] {
      sql("CALL gan.system.analyze('default.an_bad', 'nope')")
    }
    assert(e.getMessage.contains("not in"), e.getMessage)
  }

  test("analyzed stats survive a cold reload") {
    setup("an_cold")
    sql("CALL gan.system.analyze('default.an_cold', 'k')")
    graft.catalog.GraftCatalog.dropHandlesForTest()
    assert(ndvServed("an_cold", "k") == 15L,
      "analyzed stats must persist in the warehouse index")
    // and SHOW TBLPROPERTIES exposes the stamp
    val props = sql("SHOW TBLPROPERTIES gan.default.an_cold").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.stats.ndv.k") == "15")
    assert(props("graft.stats.version") == "1")
  }
}
