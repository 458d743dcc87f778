package graft.catalog

import org.apache.spark.sql.Row

/** Round-18 fold-memo eviction contract ([[ByteLruCache]], VERDICT r17
  * item 4): the round-17 memos capped by entry COUNT (4096) and cleared
  * wholesale — a chain longer than the cap degraded to re-reading every
  * file on every fold, and retired files pinned heap until the clear.
  *
  * Pinned here: (1) a chain LONGER than the old 4096-entry cap computes
  * each entry exactly once across repeated folds (no thrash — the old
  * wholesale clear recomputed everything past the cap); (2) the hold is
  * bounded by BYTES with least-recently-used entries evicted first;
  * (3) invalidation removes exactly the named keys and their bytes;
  * (4) through the real DV table machinery: a re-fold of a committed
  * table opens ZERO parquet files (fileOpens counter), and the memoized
  * equality-delete key sets are unmodifiable (ADVICE r17 — mutation
  * throws instead of corrupting every later fold). */
class FoldCacheSpec extends graft.SparkSpec {

  test("chain longer than the old 4096 cap folds with one compute per key") {
    var computes = 0
    val c = new ByteLruCache[(String, Long, Long), Integer](
      () => 64L << 20, _ => 100L)
    // two full passes over 5000 keys — past the old count cap, the
    // wholesale clear() made the second pass recompute everything
    (1 to 2).foreach { _ =>
      (0 until 5000).foreach { i =>
        c.getOrCompute((s"f$i", 1L, 1L)) { computes += 1; Integer.valueOf(i) }
      }
    }
    assert(computes === 5000, "second fold pass must be all memo hits")
    assert(c.entryCount === 5000)
  }

  test("byte budget evicts least-recently-used entries, not everything") {
    val c = new ByteLruCache[String, String](() => 1000L, _ => 300L)
    c.getOrCompute("a")("va"); c.getOrCompute("b")("vb")
    c.getOrCompute("c")("vc")                       // 900 bytes held
    c.getOrCompute("a")("va2-should-not-compute")   // touch a -> MRU
    var computedD = 0
    c.getOrCompute("d") { computedD += 1; "vd" }    // 1200 > 1000: evict b
    assert(computedD === 1)
    assert(c.currentBytes <= 1000L)
    var recomputedB = 0
    c.getOrCompute("b") { recomputedB += 1; "vb" }  // b was evicted
    assert(recomputedB === 1, "LRU victim must be b (a was touched)")
    var recomputedA = 0
    c.getOrCompute("a") { recomputedA += 1; "va" }
    assert(recomputedA === 0, "recently-used a must have survived")
  }

  test("an entry larger than the whole budget is kept while in use") {
    val c = new ByteLruCache[String, String](() => 100L, _ => 500L)
    var n = 0
    c.getOrCompute("big") { n += 1; "v" }
    assert(n === 1 && c.entryCount === 1)
    c.getOrCompute("big2") { n += 1; "v2" } // evicts big, keeps big2
    assert(n === 2 && c.entryCount === 1)
  }

  test("invalidateIf removes exactly the named keys and debits bytes") {
    val c = new ByteLruCache[String, String](() => 1L << 20, _ => 100L)
    Seq("x", "y", "z").foreach(k => c.getOrCompute(k)(k))
    c.invalidateIf(_ == "y")
    assert(c.entryCount === 2 && c.currentBytes === 200L)
    var recomputed = 0
    c.getOrCompute("x") { recomputed += 1; "x" }
    assert(recomputed === 0)
  }

  test("re-folding a committed DV table opens zero parquet files") {
    spark.conf.set("spark.sql.catalog.gfc",
      classOf[GraftCatalog].getName)
    val t = "gfc.default.fold_memo_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.mode'='dv')")
    spark.sql(s"INSERT INTO $t SELECT id, concat('a', id) FROM range(0, 64)")
    spark.sql(s"DELETE FROM $t WHERE k % 5 = 1")  // writes DV files
    spark.sql(s"UPDATE $t SET v = 'u' WHERE k % 7 = 2")
    // first read folds the fresh vectors (memo misses, real opens) and
    // scans the base; a second identical read must fold from the memo —
    // only the BASE data files are re-opened by tasks
    val r1 = spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
    val scan0 = GraftStorage.fileOpens.get()
    val r2 = spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
    val scanOpens = GraftStorage.fileOpens.get() - scan0
    assert(r1 === r2)
    val st = spark.sessionState.catalogManager.catalog("gfc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "fold_memo_t"))
      .asInstanceOf[GraftDvTable]
    val opens1 = GraftStorage.fileOpens.get()
    st.newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap())).build()
    val foldOpens = GraftStorage.fileOpens.get() - opens1
    assert(foldOpens === 0L,
      s"re-fold of committed vectors must be all memo hits, opened $foldOpens")
    assert(scanOpens > 0L, "sanity: the base scan does open data files")
  }

  test("memoized equality-delete key sets are unmodifiable") {
    spark.conf.set("spark.sql.catalog.gfc",
      classOf[GraftCatalog].getName)
    val t = "gfc.default.fold_memo_eq"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.mode'='dv')")
    spark.sql(s"INSERT INTO $t SELECT id, concat('a', id) FROM range(0, 8)")
    // upsert writes an eq-delete file keyed on k
    spark.createDataFrame(Seq((2L, "u2"), (9L, "u9"))).toDF("k", "v")
      .writeTo(t).option("graft.upsert_keys", "k").append()
    val st = spark.sessionState.catalogManager.catalog("gfc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "fold_memo_eq"))
      .asInstanceOf[GraftDvTable]
    val state = st.stateNow.current.get
    val eqs = state.deltaFiles.toVector.filter(GraftDvTable.isEqRef)
    assume(eqs.nonEmpty, "upsert must have written an eq-delete file")
    val folded = GraftDvTable.foldEq(eqs, st.schema())
    intercept[UnsupportedOperationException] {
      folded.head.keys.add(java.lang.Long.valueOf(12345L)): Unit
    }
    // and the read is unaffected: upserted row visible, key 9 inserted
    val rows = spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect()
    assert(rows.contains(Row(2L, "u2")) && rows.contains(Row(9L, "u9")))
  }
}
