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

  test("equi-height histograms let CBO see skew: the same skewed-key " +
      "filter+join plans a broadcast under NDV-only stats and a " +
      "shuffle join once the histogram lands") {
    spark.conf.set("spark.sql.catalog.gan",
      classOf[graft.catalog.GraftCatalog].getName)
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "102400")
    try {
      sql("DROP TABLE IF EXISTS gan.default.an_skewf")
      sql("DROP TABLE IF EXISTS gan.default.an_skewd")
      sql("CREATE TABLE gan.default.an_skewf (k BIGINT, s BIGINT)")
      // s is 90%-hot on value 1; NDV(s) ≈ 5001, so uniform estimation
      // prices `s = 1` at ~11 rows — three orders of magnitude off
      sql("""INSERT INTO gan.default.an_skewf
             SELECT id, CASE WHEN id < 50000 THEN 1 ELSE id - 48999 END
             FROM range(0, 55000)""")
      sql("CREATE TABLE gan.default.an_skewd (k BIGINT, w BIGINT)")
      sql("""INSERT INTO gan.default.an_skewd
             SELECT id, id * 3 FROM range(0, 55000)""")
      val q =
        """SELECT f.k, d.w FROM gan.default.an_skewf f
           JOIN gan.default.an_skewd d ON f.k = d.k
           WHERE f.s = 1"""
      def joins(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString
      // NDV-only stats: the hot-key filter is underestimated and the
      // fact side broadcasts
      sql("CALL gan.system.analyze('default.an_skewf', 's')")
      val before = joins(sql(q))
      assert(before.contains("BroadcastHashJoin"),
        s"expected a (mis-estimated) broadcast under NDV-only stats:\n" +
          before)
      // histogram: 10 equi-height bins — 9 of them pin value 1, so
      // the estimate carries the true mass and the broadcast flips
      sql("CALL gan.system.analyze('default.an_skewf', 's', false, 10)")
      val after = joins(sql(q))
      assert(!after.contains("BroadcastHashJoin"),
        s"histogram must price the hot key at its true mass:\n$after")
      // correctness identical either way
      assert(sql(q).count() == 50000L)
      // served shape: 10 bins, degenerate hot bins hold one value
      val props = sql("SHOW TBLPROPERTIES gan.default.an_skewf")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val enc = props("graft.stats.hist.s")
      val bins = enc.split('|')(1).split(';')
      assert(bins.length == 10, enc)
      assert(bins.count(_.startsWith("1.0,1.0,")) >= 8,
        s"hot value must dominate the bins: $enc")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def handle(name: String): graft.catalog.GraftTable =
    spark.sessionState.catalogManager.catalog("gan")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), name))
      .asInstanceOf[graft.catalog.GraftTable]

  test("string MCVs: top-K persisted with counts, version-gated, " +
      "separator-proof round-trip") {
    spark.conf.set("spark.sql.catalog.gan",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "gan.default.an_mcv"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    sql(s"INSERT INTO $t SELECT id, CASE WHEN id % 10 < 9 THEN 'HOT' " +
      "ELSE concat('x', id) END FROM range(0, 100)")
    sql(s"CALL gan.system.analyze(table => 'default.an_mcv', " +
      "columns => 'v', mcv => 2)")
    val (total, vs) = handle("an_mcv").analyzedMcv("v")
    assert(total == 100L)
    assert(vs.size == 2)
    assert(vs.head == ("HOT", 90L))
    assert(vs(1)._2 == 1L)
    // a commit after the analysis stales the MCV (same provenance
    // gate as NDVs) — the salt rewrite must stop firing instantly
    sql(s"INSERT INTO $t VALUES (1000, 'HOT')")
    assert(handle("an_mcv").analyzedMcv.isEmpty)
    // values containing the encoding's own separators round-trip
    sql(s"DROP TABLE IF EXISTS gan.default.an_mcv2")
    sql("CREATE TABLE gan.default.an_mcv2 (v STRING)")
    sql("INSERT INTO gan.default.an_mcv2 VALUES " +
      "('a:b;c|d %25'), ('a:b;c|d %25'), ('plain')")
    sql("CALL gan.system.analyze(table => 'default.an_mcv2', " +
      "columns => 'v', mcv => 2)")
    val (_, vs2) = handle("an_mcv2").analyzedMcv("v")
    assert(vs2 == Vector("a:b;c|d %25" -> 2L, "plain" -> 1L))
  }

  test("refresh_stats keeps the salted shape across an append wave " +
      "without a corpus re-scan (VERDICT r16 item 4)") {
    spark.conf.set("spark.sql.catalog.gan",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("rf_f", "rf_d").foreach(t =>
        sql(s"DROP TABLE IF EXISTS gan.default.$t"))
      // the change feed needs row identity: a declared row id gives the
      // CoW table the q278 file-diff changelog refresh_stats reads
      sql("""CREATE TABLE gan.default.rf_f (k STRING, v BIGINT)
             TBLPROPERTIES ('graft.row_id'='v')""")
      // HOT 900, WARM 50, c1/c3 25 each — the K-th (WARM) is clearly
      // separated from the unlisted tail, so listed-only waves refresh
      sql("INSERT INTO gan.default.rf_f SELECT CASE WHEN id % 10 < 9 " +
        "THEN 'HOT' WHEN id < 500 THEN 'WARM' " +
        "ELSE concat('c', id % 4) END, id FROM range(0, 1000)")
      sql("CREATE TABLE gan.default.rf_d (k STRING, d STRING)")
      sql("INSERT INTO gan.default.rf_d SELECT DISTINCT k, " +
        "concat('d_', k) FROM gan.default.rf_f")
      sql("CALL gan.system.analyze(table => 'default.rf_f', " +
        "columns => 'k', mcv => 2)")
      val q = """SELECT dm.d, COUNT(*) AS n
                 FROM gan.default.rf_f f
                 JOIN gan.default.rf_d dm ON f.k = dm.k
                 GROUP BY dm.d ORDER BY dm.d"""
      def optimized = sql(q).queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_salt_s"),
        s"fresh hot MCV must salt:\n$optimized")
      // the commit that kills version-gated stats...
      sql("INSERT INTO gan.default.rf_f SELECT CASE WHEN id < 2500 " +
        "THEN 'HOT' ELSE 'WARM' END, id FROM range(2000, 2600)")
      assert(!optimized.contains("__graft_salt"),
        "stale MCV must stop salting")
      // ...and the O(changed rows) refresh that resurrects them
      val out = sql("CALL gan.system.refresh_stats(" +
        "table => 'default.rf_f')").collect().head
      assert(out.getLong(2) == 1L, s"expected 1 MCV refreshed: $out")
      assert(optimized.contains("__graft_salt_s"),
        s"refreshed MCV must salt again without re-analyze:\n$optimized")
      // the refreshed counts are EXACT, not estimates
      val (total, vs) = handle("rf_f").analyzedMcv("k")
      assert(total == 1600L, s"refreshed total $total")
      assert(vs == Vector("HOT" -> 1400L, "WARM" -> 150L),
        s"refreshed counts $vs")

      // deletes maintain too (net negative deltas), and the unlisted
      // bound persists across refreshes (a min-of-list bound would
      // spuriously refuse this kth-lowering wave)
      sql("DELETE FROM gan.default.rf_f WHERE v >= 2550")
      sql("CALL gan.system.refresh_stats(table => 'default.rf_f')")
      val (total2, vs2) = handle("rf_f").analyzedMcv("k")
      assert(total2 == 1550L &&
        vs2 == Vector("HOT" -> 1400L, "WARM" -> 100L),
        s"delete wave: $total2 $vs2")

      // SOUNDNESS refusal: a wave pumping an UNLISTED value enough to
      // threaten the top-K floor must refuse toward a full analyze
      sql("INSERT INTO gan.default.rf_f SELECT 'c0', id " +
        "FROM range(3000, 3400)")
      val e = intercept[Exception] {
        sql("CALL gan.system.refresh_stats(table => 'default.rf_f')")
          .collect()
      }
      assert(e.getMessage.contains("ambiguous") &&
        e.getMessage.contains("system.analyze"),
        s"overtake refusal must name the cure: ${e.getMessage}")
      Seq("rf_f", "rf_d").foreach(t => sql(s"DROP TABLE gan.default.$t"))
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("refresh_stats NDV upper bound and histogram-to-MCV conversion") {
    spark.conf.set("spark.sql.catalog.gan",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gan.default.rf_h")
    sql("""CREATE TABLE gan.default.rf_h (k BIGINT, v BIGINT)
           TBLPROPERTIES ('graft.row_id'='v')""")
    // 90% of rows carry k = 7 -> degenerate hot bins
    sql("INSERT INTO gan.default.rf_h SELECT CASE WHEN id % 10 < 9 " +
      "THEN 7 ELSE id % 5 END, id FROM range(0, 1000)")
    sql("CALL gan.system.analyze(table => 'default.rf_h', " +
      "columns => 'k', buckets => 10)")
    assert(handle("rf_h").analyzedHist.contains("k"))
    def ndvProp(): Long = sql("SHOW TBLPROPERTIES gan.default.rf_h")
      .collect().collectFirst {
        case r if r.getString(0) == "graft.stats.ndv.k" =>
          r.getString(1).toLong
      }.get
    val ndv0 = ndvProp()
    // append wave: 200 more hot rows + 3 NEW distinct values
    sql("INSERT INTO gan.default.rf_h SELECT CASE WHEN id % 10 < 5 " +
      "THEN 7 ELSE 100 + id % 3 END, id FROM range(5000, 5200)")
    sql("CALL gan.system.refresh_stats(table => 'default.rf_h')")
    val t = handle("rf_h")
    // the stale histogram is REMOVED, never served as fresh...
    assert(t.analyzedHist.isEmpty,
      "refresh must drop the unmaintainable histogram")
    // ...its skew signal survives as a derived, exactly-delta'd MCV:
    // the hot value's mass moved by exactly the wave's hot additions
    val (_, vs) = t.analyzedMcv("k")
    assert(vs.nonEmpty && vs.head._1.toDouble == 7.0,
      s"derived MCV must carry the hot value: $vs")
    // NDV re-stamps at the sound upper bound (old + distinct added)
    val ndv1 = ndvProp()
    assert(ndv1 >= ndv0 && ndv1 <= ndv0 + 4,
      s"NDV bound drifted: $ndv0 -> $ndv1")
    // SaltSkewJoin still prices the numeric hot key from the refreshed
    // artifact (hotShare prefers MCV over histograms)
    sql("DROP TABLE gan.default.rf_h")
  }
}
