package graft

/** OFFSET pushdown (SupportsPushDownOffset): whole leading files the
  * offset provably spans are never opened; the boundary file drops a
  * row prefix in the reader. Engages only on unfiltered scans; the
  * scan's row order is deterministic (commit order, sequential read),
  * so the dropped set — and any aggregate over the remainder — is
  * exact and reproducible. */
class OffsetPushdownSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def opens(body: => Unit): Long = {
    val before = graft.catalog.GraftStorage.fileOpens.get()
    body
    graft.catalog.GraftStorage.fileOpens.get() - before
  }

  private def seed(): Unit = {
    spark.conf.set("spark.sql.catalog.gofs",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gofs.default.t")
    sql("CREATE TABLE gofs.default.t (k BIGINT)")
    // four single-file commits of 100 ascending keys each: scan order
    // is exactly k = 0..399
    (0 until 4).foreach { i =>
      spark.range(i * 100, (i + 1) * 100).coalesce(1)
        .createOrReplaceTempView("ofs_src")
      sql("INSERT INTO gofs.default.t SELECT id FROM ofs_src")
    }
  }

  test("OFFSET skips whole leading files without opening them") {
    seed()
    // offset 250 spans files 1-2 (200 rows) + 50 rows of file 3:
    // files 1-2 never open, files 3-4 do
    var got: Seq[Long] = null
    val n = opens {
      got = sql("SELECT k FROM gofs.default.t OFFSET 250")
        .collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(got == (250L to 399L), s"wrong remainder: ${got.take(5)}...")
    assert(n == 2, s"offset scan opened $n files, expected 2")
    // offset beyond the table: zero rows, zero opens
    val n2 = opens {
      assert(sql("SELECT k FROM gofs.default.t OFFSET 1000").count() == 0)
    }
    assert(n2 == 0, s"past-the-end offset opened $n2 files")
  }

  test("OFFSET with a filter does NOT push (the residual path stays " +
      "exact)") {
    seed()
    val got = sql(
      "SELECT k FROM gofs.default.t WHERE k % 2 = 0 OFFSET 150")
      .collect().map(_.getLong(0)).toSeq
    // 200 even keys, any 150 skipped: exactly 50 remain
    assert(got.size == 50 && got.forall(_ % 2 == 0), s"got ${got.size}")
  }

  test("LIMIT + OFFSET pagination returns the right page content") {
    seed()
    val page = sql("SELECT k FROM gofs.default.t LIMIT 20 OFFSET 90")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(page.size == 20, s"page size ${page.size}")
    assert(page.forall(k => k >= 0 && k <= 399))
  }
}
