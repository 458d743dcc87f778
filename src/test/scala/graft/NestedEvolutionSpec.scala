package graft

/** Nested ADD COLUMN (`ALTER TABLE t ADD COLUMN parent.child <type>`):
  * metadata-only subfield addition to struct / array-of-struct /
  * map-of-struct parents. Old files lack the leaf — the reader clips
  * its parquet request per file and binds by name, so pre-ADD rows
  * read null; presence and array LENGTHS survive even when a
  * projection asks ONLY for post-file subfields (the presence-witness
  * clip). Nested RENAME/DROP and defaults stay loud rejects. */
class NestedEvolutionSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.gnev",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gnev.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    t
  }

  test("struct parent: old files read the new subfield as null, new " +
      "files carry values; full projections keep the wanted arity") {
    val t = setup("ev_struct")
    sql(s"CREATE TABLE $t (id BIGINT, m STRUCT<a: STRING>)")
    sql(s"INSERT INTO $t VALUES (1, named_struct('a', 'a1'))")
    sql(s"ALTER TABLE $t ADD COLUMN m.b BIGINT")
    sql(s"INSERT INTO $t VALUES (2, named_struct('a', 'a2', 'b', 20L))")
    val got = sql(s"SELECT id, m.a, m.b FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "a1", -1L), (2L, "a2", 20L)))
    // full-struct projection: old file's struct widens to arity 2
    val full = sql(s"SELECT m FROM $t WHERE id = 1").head().getStruct(0)
    assert(full.size == 2 && full.getString(0) == "a1" && full.isNullAt(1))
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
    // projecting ONLY the new subfield over the old file: presence
    // survives (non-null struct of nulls, not a null struct)
    val onlyNew = sql(s"SELECT m.b, m IS NULL AS isnull FROM $t " +
      "WHERE id = 1").head()
    assert(onlyNew.isNullAt(0) && !onlyNew.getBoolean(1))
  }

  test("array-of-struct parent: element COUNT survives a projection of " +
      "only the post-file subfield") {
    val t = setup("ev_aos")
    sql(s"CREATE TABLE $t (id BIGINT, xs ARRAY<STRUCT<k: STRING>>)")
    sql(s"INSERT INTO $t VALUES (1, array(named_struct('k', 'k1'), " +
      "named_struct('k', 'k2'), named_struct('k', 'k3')))")
    sql(s"ALTER TABLE $t ADD COLUMN xs.element.w BIGINT")
    sql(s"INSERT INTO $t VALUES (2, array(named_struct('k', 'k9', " +
      "'w', 90L)))")
    // old row: 3 elements, all w null — the length must NOT collapse
    val lens = sql(s"SELECT id, size(xs) AS n, " +
      "size(filter(xs, e -> e.w IS NULL)) AS nulls FROM " +
      s"$t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(lens == Seq((1L, 3, 3), (2L, 1, 0)), s"lens: $lens")
    // aggregate over the new subfield only (nested-pruned projection)
    assert(sql(s"SELECT CAST(SUM(aggregate(xs, 0L, " +
      s"(a, e) -> a + coalesce(e.w, 0L))) AS BIGINT) FROM $t")
      .head().getLong(0) == 90L)
    // old elements' existing subfields intact
    assert(sql(s"SELECT transform(xs, e -> e.k) FROM $t WHERE id = 1")
      .head().getSeq[String](0) == Seq("k1", "k2", "k3"))
  }

  test("map-of-struct value parent evolves; CoW DML carries old files") {
    val t = setup("ev_mos")
    sql(s"CREATE TABLE $t (id BIGINT, m MAP<STRING, STRUCT<p: BIGINT>>)")
    sql(s"INSERT INTO $t VALUES (1, map('x', named_struct('p', 10L)))")
    sql(s"INSERT INTO $t VALUES (2, map('y', named_struct('p', 20L)))")
    sql(s"ALTER TABLE $t ADD COLUMN m.value.q STRING")
    sql(s"INSERT INTO $t VALUES (3, map('z', " +
      "named_struct('p', 30L, 'q', 'q3')))")
    // CoW UPDATE touches only id=2's file; id=1's pre-ADD file is
    // carried over and must still read correctly afterwards
    sql(s"UPDATE $t SET id = 20 WHERE id = 2")
    val got = sql(s"SELECT id, map_keys(m)[0] AS k, m[map_keys(m)[0]].p," +
      s" m[map_keys(m)[0]].q FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(got == Seq((1L, "x", 10L, null), (3L, "z", 30L, "q3"),
      (20L, "y", 20L, null)), s"got: $got")
  }

  test("MOR: nested add folds across old base AND old delta files") {
    val t = setup("ev_mor")
    sql(s"""CREATE TABLE $t (id BIGINT, m STRUCT<a: STRING>)
            TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='id')""")
    sql(s"INSERT INTO $t VALUES (1, named_struct('a', 'a1')), " +
      "(2, named_struct('a', 'a2'))")
    // a pre-ADD delta entry (update) — its file also lacks the subfield
    sql(s"UPDATE $t SET m = named_struct('a', 'u2') WHERE id = 2")
    sql(s"ALTER TABLE $t ADD COLUMN m.b BIGINT")
    sql(s"INSERT INTO $t VALUES (3, named_struct('a', 'a3', 'b', 30L))")
    // a post-ADD delta over a pre-ADD row
    sql(s"UPDATE $t SET m = named_struct('a', 'u1', 'b', 11L) WHERE id = 1")
    val got = sql(s"SELECT id, m.a, m.b FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "u1", 11L), (2L, "u2", -1L), (3L, "a3", 30L)),
      s"got: $got")
    // compaction rewrites everything at the current schema
    sql("CALL gnev.system.compact('default.ev_mor')")
    val got2 = sql(s"SELECT id, m.a, m.b FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got2 == got)
  }

  test("adds compose to any depth: struct-in-struct and " +
      "array-of-struct-inside-struct") {
    val t = setup("ev_deep")
    sql(s"CREATE TABLE $t (id BIGINT, " +
      "m STRUCT<inner: STRUCT<x: STRING>, " +
      "         items: ARRAY<STRUCT<k: BIGINT>>>)")
    sql(s"INSERT INTO $t VALUES (1, named_struct(" +
      "'inner', named_struct('x', 'x1'), " +
      "'items', array(named_struct('k', 10L), named_struct('k', 20L))))")
    sql(s"ALTER TABLE $t ADD COLUMN m.inner.y BIGINT")
    sql(s"ALTER TABLE $t ADD COLUMN m.items.element.v STRING")
    sql(s"INSERT INTO $t VALUES (2, named_struct(" +
      "'inner', named_struct('x', 'x2', 'y', 22L), " +
      "'items', array(named_struct('k', 30L, 'v', 'v3'))))")
    val got = sql(s"SELECT id, m.inner.x, m.inner.y, size(m.items), " +
      s"size(filter(m.items, e -> e.v IS NULL)) FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3),
        r.getInt(4))).toSeq
    assert(got == Seq((1L, "x1", -1L, 2, 2), (2L, "x2", 22L, 1, 0)),
      s"got: $got")
  }

  test("time travel replays the pre-ADD schema; rejects stay loud") {
    val t = setup("ev_tt")
    sql(s"CREATE TABLE $t (id BIGINT, m STRUCT<a: STRING>)")
    sql(s"INSERT INTO $t VALUES (1, named_struct('a', 'a1'))") // v0
    sql(s"ALTER TABLE $t ADD COLUMN m.b BIGINT")               // v1
    assert(sql(s"SELECT m FROM $t VERSION AS OF 0").head()
      .getStruct(0).size == 1, "pre-ADD version must show old arity")
    // rejects: duplicate subfield, default, deeper nesting, non-struct
    // parent, nested rename/drop
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t ADD COLUMN m.b STRING")) != null)
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t ADD COLUMN m.c BIGINT DEFAULT 5")) != null)
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t ADD COLUMN id.x BIGINT")) != null)
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t RENAME COLUMN m.a TO m.z")) != null)
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t DROP COLUMN m.a")) != null)
  }

  test("ALTER COLUMN FIRST/AFTER reorders metadata-only: old files " +
      "(CoW and MOR delta) bind by field id; time travel replays the " +
      "old order") {
    import org.apache.spark.sql.Row
    val t = setup("ev_move")
    sql(s"CREATE TABLE $t (a BIGINT, b STRING, c DOUBLE)")
    sql(s"INSERT INTO $t VALUES (1, 'x', 1.5)") // v0
    sql(s"ALTER TABLE $t ALTER COLUMN c FIRST") // v1
    assert(sql(s"SELECT * FROM $t").schema.fieldNames.toSeq ==
      Seq("c", "a", "b"))
    assert(sql(s"SELECT * FROM $t").head() == Row(1.5, 1L, "x"))
    sql(s"ALTER TABLE $t ALTER COLUMN c AFTER a")
    assert(sql(s"SELECT * FROM $t").schema.fieldNames.toSeq ==
      Seq("a", "c", "b"))
    // a post-move INSERT uses the new order; the pre-move file still
    // reads right (field-id binding)
    sql(s"INSERT INTO $t VALUES (2, 2.5, 'y')")
    assert(sql(s"SELECT a, b, c FROM $t ORDER BY a").collect().toSeq ==
      Seq(Row(1L, "x", 1.5), Row(2L, "y", 2.5)))
    // time travel: version 0 replays the CREATE order
    assert(sql(s"SELECT * FROM $t VERSION AS OF 0")
      .schema.fieldNames.toSeq == Seq("a", "b", "c"))
    // MOR: reorder across live delta entries folds right
    val m = setup("ev_move_mor")
    sql(s"CREATE TABLE $m (k BIGINT, v STRING, w DOUBLE) " +
      "TBLPROPERTIES ('graft.mode'='mor','graft.row_id'='k')")
    sql(s"INSERT INTO $m VALUES (1, 'a', 0.5), (2, 'b', 1.5)")
    sql(s"UPDATE $m SET v = 'B' WHERE k = 2") // live delta entry
    sql(s"ALTER TABLE $m ALTER COLUMN w FIRST")
    assert(sql(s"SELECT * FROM $m ORDER BY k").collect().toSeq ==
      Seq(Row(0.5, 1L, "a"), Row(1.5, 2L, "B")))
    // unknown AFTER target stays loud
    assert(intercept[Exception](
      sql(s"ALTER TABLE $t ALTER COLUMN a AFTER nope")) != null)
  }
}
