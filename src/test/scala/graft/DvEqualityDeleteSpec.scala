package graft

import org.apache.spark.sql.Row

/** Equality-delete upsert path on deletion-vector tables
  * ([[graft.catalog.GraftDvUpsertWriteBuilder]], VERDICT r14 item 7):
  * `option("graft.upsert_keys", ...)` on an append turns every written
  * row into key-delete-then-insert with NO position scan — Iceberg v2
  * equality-delete semantics, the streaming-CDC-upsert shape.
  *
  * Pinned contracts: the read-side fold (fenced key sets kill rows
  * only in pre-commit files; a batch never deletes its own inserts;
  * last epoch wins); base files stay byte-identical; composition with
  * positional DELETE vectors; compaction folds eq entries away and
  * restores the plain scan; index-shifting operations (metadata
  * DELETE, dynamic overwrite, small-file rewrite) refuse while eq
  * entries live; null/unknown/non-id-typed keys reject; the change
  * feed surfaces an upsert as delete-rows plus inserts; streaming
  * upsert epochs are exactly-once. */
class DvEqualityDeleteSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.geq",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"geq.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.mode'='dv')")
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "concat('a', id) FROM range(0, 4)")
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "concat('b', id) FROM range(4, 8)")
    t
  }

  private def table(name: String): graft.catalog.GraftDvTable =
    spark.sessionState.catalogManager.catalog("geq")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), name))
      .asInstanceOf[graft.catalog.GraftDvTable]

  private def upsert(t: String, df: org.apache.spark.sql.DataFrame,
      keys: String = "k"): Unit =
    df.writeTo(t).option("graft.upsert_keys", keys).append()

  test("a batch upsert key-deletes old versions without a position " +
      "scan, never kills its own inserts, and leaves base files " +
      "byte-identical") {
    val t = setup("eq_basic")
    import java.nio.file.{Files, Paths}
    val basePaths = table("eq_basic").stateNow.current.get.files.map(_.path)
    val sizes = basePaths.map(p => Files.size(Paths.get(p)))
    // upsert: k=2 and k=5 re-valued, k=100 brand new
    upsert(t, spark.sql(
      "SELECT * FROM VALUES (2L, 'two!'), (5L, 'five!'), (100L, 'new') " +
        "AS u(k, v)"))
    assert(sql(s"SELECT v FROM $t ORDER BY k").collect()
      .map(_.getString(0)).toSeq ==
      Seq("a0", "a1", "two!", "a3", "b4", "five!", "b6", "b7", "new"))
    val st = table("eq_basic").stateNow.current.get
    assert(st.files.map(_.path).take(2) == basePaths, "old bases kept")
    assert(basePaths.map(p => Files.size(Paths.get(p))) == sizes,
      "base files must be byte-identical after an equality upsert")
    val eqs = st.deltaFiles.filter(f => f.path.contains("/eq-"))
    assert(eqs.nonEmpty, "an eq delete file must have committed")
    assert(eqs.map(_.rows).sum == 3L, "3 distinct upserted keys")
    assert(eqs.forall(_.fence == 2), s"fence at the pre-commit base " +
      s"count: ${eqs.map(_.fence)}")
    // count must be eq-exact, not physical
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 9L)
  }

  test("repeated upserts: the last epoch wins; positional DELETE " +
      "composes; compaction folds everything away") {
    val t = setup("eq_repeat")
    upsert(t, spark.sql("SELECT 2L AS k, 'v1' AS v"))
    upsert(t, spark.sql("SELECT 2L AS k, 'v2' AS v"))
    assert(sql(s"SELECT v FROM $t WHERE k = 2").collect()
      .map(_.getString(0)).toSeq == Seq("v2"), "last upsert wins")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 8L)
    // positional DELETE on top of live eq entries
    sql(s"DELETE FROM $t WHERE k IN (0, 2)")
    assert(sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L))
    sql("CALL geq.system.compact('default.eq_repeat')")
    val st = table("eq_repeat").stateNow.current.get
    assert(st.deltaFiles.isEmpty, "compaction clears eq + vectors")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 6L)
  }

  test("index-shifting operations refuse while eq entries live; " +
      "key validation rejects bad specs") {
    val t = setup("eq_gates")
    upsert(t, spark.sql("SELECT 1L AS k, 'x' AS v"))
    // metadata-only DELETE (whole-file predicate) must NOT take the
    // fast path — k < 4 is file-decidable on the seed layout
    sql(s"DELETE FROM $t WHERE k < 4")
    // the positional fallback still answers correctly
    assert(sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(4L, 5L, 6L, 7L))
    val e1 = intercept[Exception] {
      upsert(t, spark.sql("SELECT 1L AS k, 'y' AS v"), keys = "nope")
    }
    assert(e1.getMessage.contains("not in"), e1.getMessage)
    val e2 = intercept[Exception] {
      upsert(t, spark.sql("SELECT CAST(NULL AS BIGINT) AS k, 'y' AS v"))
    }
    assert(exceptionChain(e2).exists(x => x.getMessage != null &&
      x.getMessage.contains("null")), e2.toString)
  }

  test("the change feed surfaces an upsert as delete-rows for the " +
      "superseded versions plus op-0 inserts") {
    val t = setup("eq_feed")
    val v = table("eq_feed").stateNow.current.get.version + 1
    upsert(t, spark.sql(
      "SELECT * FROM VALUES (3L, 'three!'), (200L, 'new') AS u(k, v)"))
    // from_version bounds away the seed INSERT waves (which the feed
    // now carries too — round-16 totality fix) to isolate the upsert
    val rows = spark.read.option("from_version", (v - 1).toString)
      .table(s"geq.default.`eq_feed$$changes`")
      .selectExpr("`__op`", "`__ver`", "k", "v")
      .orderBy("`__op`", "k").collect().toSeq
    assert(rows == Seq(
      Row(0, v, 3L, "three!"), Row(0, v, 200L, "new"),
      Row(2, v, 3L, "a3")), s"feed rows: $rows")
    // unbounded read = seed inserts + the upsert ops (totality)
    assert(sql(s"SELECT COUNT(*) FROM geq.default.`eq_feed$$changes`")
      .head().getLong(0) == 8 + rows.size)
  }

  test("streaming CDC upsert into a DV table: AvailableNow epochs " +
      "apply key-wise; a second query converges to the source") {
    val t = setup("eq_stream")
    // CDC source: a managed append-only table tailed via readStream
    sql("DROP TABLE IF EXISTS geq.default.eq_cdc_src")
    sql("CREATE TABLE geq.default.eq_cdc_src (k BIGINT, v STRING)")
    sql("""INSERT INTO geq.default.eq_cdc_src VALUES
           (1, 'u1'), (6, 'u6'), (300, 'n300')""")
    val ckpt = java.nio.file.Files
      .createTempDirectory("eq-ckpt-").toString
    val q = spark.readStream.table("geq.default.eq_cdc_src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .option("graft.upsert_keys", "k")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(t)
    q.awaitTermination()
    assert(sql(s"SELECT v FROM $t ORDER BY k").collect()
      .map(_.getString(0)).toSeq ==
      Seq("a0", "u1", "a2", "a3", "b4", "b5", "u6", "b7", "n300"))
    // second wave through the SAME checkpoint: only the new arrivals
    sql("INSERT INTO geq.default.eq_cdc_src VALUES (1, 'u1b'), (300, 'gone300')")
    val q2 = spark.readStream.table("geq.default.eq_cdc_src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .option("graft.upsert_keys", "k")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(t)
    q2.awaitTermination()
    assert(sql(s"SELECT v FROM $t WHERE k IN (1, 300) ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("u1b", "gone300"))
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 9L)
  }

  test("_pos stays physical under eq deletes; eq rows count toward " +
      "the fold bound") {
    spark.conf.set("spark.sql.catalog.geq",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "geq.default.eq_pos"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.mode'='dv', 'graft.dv.max_live_positions'='2')")
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "concat('a', id) FROM range(0, 4)")
    spark.sql("SELECT 1L AS k, 'x' AS v").writeTo(t)
      .option("graft.upsert_keys", "k").append()
    // k=1's old copy at pos 1 is eq-dead: _pos skips it
    assert(sql(s"SELECT _pos FROM $t WHERE _file = (SELECT _file FROM " +
      s"$t WHERE k = 0)").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 2L, 3L))
    // upserts are write-only (that's the point — no position scan),
    // so the fold bound fires on the next READ once eq rows exceed it
    spark.sql("SELECT 2L AS k, 'y' AS v").writeTo(t)
      .option("graft.upsert_keys", "k").append()
    spark.sql("SELECT 3L AS k, 'z' AS v").writeTo(t)
      .option("graft.upsert_keys", "k").append() // 3 eq rows > cap 2
    val e = intercept[Exception] {
      sql(s"SELECT count(*) FROM $t").collect()
    }
    assert(exceptionChain(e).exists(x => x.getMessage != null &&
      x.getMessage.contains("max_live_positions")), e.toString)
    sql("CALL geq.system.compact('default.eq_pos')")
    // seed k=0..3; k=1/2/3 replaced in place — still 4 live rows
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 4L)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] = {
    val b = Seq.newBuilder[Throwable]
    var cur: Throwable = e
    while (cur != null) { b += cur; cur = cur.getCause }
    b.result()
  }
}
