package graft

/** Multi-table atomic publish (VERDICT r15 item 7,
  * `CALL system.publish_tables`): N tables' branches fast-forward to
  * their mains as ONE transaction whose visibility flips at a single
  * atomic marker create.
  *
  * Pinned contracts: the no-torn-read protocol (a reader that observes
  * a stable fact count around its dim read always sees the matching
  * dim state — the fact+dim consistent cut); all-or-nothing under
  * divergence (one stale branch aborts the whole set, nothing
  * publishes); crash-mid-transaction leaves every table serving its
  * pre-transaction snapshot, and the next writer resolves the dead
  * transaction to an aborted marker under the index lock; a raced
  * publish either fully lands or fully aborts, never partially. */
class AtomicPublishSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def init(): Unit =
    spark.conf.set("spark.sql.catalog.gap",
      classOf[graft.catalog.GraftCatalog].getName)

  private def handle(name: String): graft.catalog.GraftTable =
    spark.sessionState.catalogManager.catalog("gap")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), name))
      .asInstanceOf[graft.catalog.GraftTable]

  private def freshPair(tag: String): (String, String) = {
    init()
    val (f, d) = (s"gap.default.fact_$tag", s"gap.default.dim_$tag")
    Seq(f, d, s"${f}_branch_pub", s"${d}_branch_pub").foreach(t =>
      sql(s"DROP TABLE IF EXISTS $t"))
    sql(s"CREATE TABLE $f (k BIGINT, fk BIGINT)")
    sql(s"CREATE TABLE $d (dk BIGINT, name STRING)")
    sql(s"INSERT INTO $f VALUES (1, 10), (2, 10)")
    sql(s"INSERT INTO $d VALUES (10, 'base')")
    (f, d)
  }

  private def branchBoth(f: String, d: String): Unit = {
    sql(s"CALL gap.system.create_branch('default.${f.split('.').last}', 'pub')")
    sql(s"CALL gap.system.create_branch('default.${d.split('.').last}', 'pub')")
  }

  test("happy path: both tables flip together; branch content lands " +
      "with referential integrity") {
    val (f, d) = freshPair("hp")
    branchBoth(f, d)
    sql(s"INSERT INTO ${f}_branch_pub VALUES (3, 20)")
    sql(s"INSERT INTO ${d}_branch_pub VALUES (20, 'synth')")
    val out = sql("CALL gap.system.publish_tables(" +
      s"'default.${f.split('.').last},default.${d.split('.').last}', " +
      "'pub')").collect()
    assert(out.head.getString(out.head.length - 1) == "2")
    // both mains show the published content; the new fact key resolves
    assert(sql(s"SELECT COUNT(*) FROM $f").head().getLong(0) == 3)
    assert(sql(s"""SELECT COUNT(*) FROM $f t JOIN $d x ON t.fk = x.dk""")
      .head().getLong(0) == 3)
  }

  test("all-or-nothing: one diverged branch aborts the whole set — " +
      "the other table publishes NOTHING") {
    val (f, d) = freshPair("div")
    branchBoth(f, d)
    sql(s"INSERT INTO ${f}_branch_pub VALUES (3, 20)")
    sql(s"INSERT INTO ${d}_branch_pub VALUES (20, 'synth')")
    // dim's MAIN diverges after the branch point
    sql(s"INSERT INTO $d VALUES (99, 'foreign')")
    val e = intercept[Exception] {
      sql("CALL gap.system.publish_tables(" +
        s"'default.${f.split('.').last},default.${d.split('.').last}', " +
        "'pub')").collect()
    }
    assert(e.getMessage.contains("NO table published"), e.getMessage)
    // fact main untouched even though ITS branch was clean
    assert(sql(s"SELECT COUNT(*) FROM $f").head().getLong(0) == 2)
    assert(sql(s"SELECT COUNT(*) FROM $d").head().getLong(0) == 2)
  }

  test("crash mid-transaction: a pending unmarked head is invisible, " +
      "and the next writer resolves it to aborted") {
    val (f, _) = freshPair("cr")
    val t = handle(f.split('.').last)
    val v = t.stateNow.current.map(_.version).getOrElse(-1)
    // simulate a publisher that died after its phase-1 CAS: a pending
    // fast-forward to EMPTY content, transaction marker never written
    t.commitFastForward(v, Vector.empty, publishTxnId = "dead-txn-1")
    // readers keep serving the pre-transaction snapshot
    assert(sql(s"SELECT COUNT(*) FROM $f").head().getLong(0) == 2)
    // time travel cannot reach the uncommitted head either
    intercept[Exception] {
      sql(s"SELECT COUNT(*) FROM $f VERSION AS OF ${v + 1}").collect()
    }
    // nor does SHOW TBLPROPERTIES leak the pending version — the MV
    // stamping pattern reads graft.current_version, and a leaked
    // pending stamp would mark a stale MV as fresh at commit
    val shownV = sql(s"SHOW TBLPROPERTIES $f").collect()
      .collectFirst {
        case r if r.getString(0) == "graft.current_version" =>
          r.getString(1).toInt
      }.get
    assert(shownV == v, s"properties leaked pending version $shownV")
    // the next writer disambiguates under the index lock: the dead
    // transaction aborts, its head drops, the insert lands on the
    // pre-transaction content
    sql(s"INSERT INTO $f VALUES (100, 10)")
    assert(sql(s"SELECT COUNT(*) FROM $f").head().getLong(0) == 3)
    assert(sql(s"SELECT COUNT(*) FROM $f WHERE k = 100")
      .head().getLong(0) == 1)
  }

  test("aborted publish larger than append_retain folds out cleanly: " +
      "the append axis ends where the pre-transaction axis ended") {
    init()
    val name = "fact_trimfold"
    sql(s"DROP TABLE IF EXISTS gap.default.$name")
    // retention keeps only 4 append-ledger entries — small enough that
    // a fast-forwarded file set larger than the window trims THROUGH
    // the stamped commit's own entries (the ADVICE r16 over-drop case)
    sql(s"""CREATE TABLE gap.default.$name (k BIGINT, fk BIGINT)
            TBLPROPERTIES ('graft.append_retain'='4')""")
    (0 until 3).foreach(i =>
      sql(s"INSERT INTO gap.default.$name VALUES ($i, 10)"))
    val t = handle(name)
    val st0 = t.stateNow
    val axisEnd0 = st0.appendBase + st0.appendLog.size
    val v = st0.current.map(_.version).getOrElse(-1)
    // dead publisher: phase-1 CAS lands 9 entries (> retain 4), the
    // trim inside that commit advances appendBase past 5 of the txn's
    // OWN entries — marker never written, so readers must fold it out
    val files = Vector.fill(3)(st0.current.get.files).flatten
    assert(files.size > 4, s"need > retain files, got ${files.size}")
    t.commitFastForward(v, files, publishTxnId = "dead-txn-trim")
    val st1 = t.stateNow
    // pre-fix: dropRight(n) over-dropped (log went empty but the base
    // kept the txn's phantom trim), leaving the axis ending PAST the
    // last offset that ever held committed data
    assert(st1.appendBase + st1.appendLog.size == axisEnd0,
      s"aborted fold must end the append axis at $axisEnd0, got " +
        s"base=${st1.appendBase} + log=${st1.appendLog.size}")
    // content view unchanged, and the next writer's resolution keeps a
    // consistent axis too
    assert(sql(s"SELECT COUNT(*) FROM gap.default.$name")
      .head().getLong(0) == 3)
    sql(s"INSERT INTO gap.default.$name VALUES (100, 10)")
    val st2 = t.stateNow
    assert(st2.appendBase + st2.appendLog.size == axisEnd0 + 1,
      "post-abort append must extend the pre-transaction axis by 1")
    sql(s"DROP TABLE gap.default.$name")
  }

  test("no torn read: a reader with a stable fact sample always sees " +
      "the matching dim state, across publishes racing foreign DML") {
    val (f, d) = freshPair("race")
    val (fn, dn) = (f.split('.').last, d.split('.').last)
    // baseline: 2 fact rows, 1 dim row; every transaction adds exactly
    // one row to EACH table, so any consistent cut satisfies
    // fact - 2 == dim - 1
    @volatile var stop = false
    @volatile var torn: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        val f1 = sql(s"SELECT COUNT(*) FROM $f").head().getLong(0)
        val dd = sql(s"SELECT COUNT(*) FROM $d").head().getLong(0)
        val f2 = sql(s"SELECT COUNT(*) FROM $f").head().getLong(0)
        if (f1 == f2 && dd - 1 != f1 - 2)
          torn = Some(s"fact=$f1 stable but dim=$dd")
      }
    }, "atomic-publish-reader")
    reader.start()
    try {
      (0 until 5).foreach { i =>
        branchBoth(f, d)
        sql(s"INSERT INTO ${f}_branch_pub VALUES (${1000 + i}, ${100 + i})")
        sql(s"INSERT INTO ${d}_branch_pub VALUES (${100 + i}, 'tx$i')")
        sql("CALL gap.system.publish_tables(" +
          s"'default.$fn,default.$dn', 'pub')").collect()
        sql(s"DROP TABLE ${f}_branch_pub")
        sql(s"DROP TABLE ${d}_branch_pub")
      }
    } finally { stop = true; reader.join(30000) }
    assert(torn.isEmpty, s"torn read observed: $torn")
    assert(sql(s"SELECT COUNT(*) FROM $f").head().getLong(0) == 7)
    assert(sql(s"SELECT COUNT(*) FROM $d").head().getLong(0) == 6)
  }

  test("consistent-cut publish (r16 item 7): a reader never sees base " +
      "and MV at different versions, and the MV serves immediately " +
      "after the flip — no refusal window") {
    init()
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2Relation => r.table.name()
        case s: DataSourceV2ScanRelation => s.relation.table.name()
      }
    }
    Seq("cc_base_branch_cut", "cc_mv_branch_cut", "cc_base", "cc_mv")
      .foreach(t => sql(s"DROP TABLE IF EXISTS gap.default.$t"))
    sql("CREATE TABLE gap.default.cc_base (g STRING, v BIGINT)")
    sql("INSERT INTO gap.default.cc_base SELECT concat('g', id % 4), " +
      "id FROM range(0, 100)")
    sql("""CREATE TABLE gap.default.cc_mv (g STRING, sum_v BIGINT,
             n BIGINT)
           TBLPROPERTIES ('graft.mv.of' = 'default/cc_base',
             'graft.mv.group' = 'g',
             'graft.mv.agg' = 'sum:v:sum_v,count:*:n')""")
    def refreshInto(mv: String, base: String): Unit =
      sql(s"INSERT OVERWRITE gap.default.$mv SELECT g, SUM(v), " +
        s"COUNT(*) FROM gap.default.$base GROUP BY 1"): Unit
    refreshInto("cc_mv", "cc_base")
    val v0 = handle("cc_base").stateNow.current.get.version
    sql(s"""ALTER TABLE gap.default.cc_mv SET TBLPROPERTIES
            ('graft.mv.base_version' = '$v0')""")
    sql("ALTER TABLE gap.default.cc_base SET TBLPROPERTIES " +
      "('graft.mv.tables' = 'cc_mv')")
    val agg = "SELECT g, SUM(v) AS sum_v, COUNT(*) AS n " +
      "FROM gap.default.cc_base GROUP BY g"
    assert(scansOf(sql(agg)).exists(_.contains("cc_mv")),
      "baseline MV serve must be in place before the cut")
    // racing reader: at EVERY observation the maybe-MV-served
    // aggregate must equal the truth computed by a direct base scan
    // (MV rewrite disabled) — a torn cut (fresh base + stale-served
    // MV, or stale base + fresh-served MV) diverges the two
    @volatile var stop = false
    @volatile var torn: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        val served = sql(agg).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        // direct truth via a shape MvRewrite refuses (a filter on a
        // non-group column): always scans the base — and without
        // touching the session-global kill-switch, which would race
        // the publisher thread's own plan checks
        val direct = sql(agg.replace("GROUP BY g",
            "WHERE v >= 0 GROUP BY g")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        // only comparable when the base did not advance between the
        // two reads: re-check served afterwards
        val served2 = sql(agg).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        if (served == served2 && served != direct)
          torn = Some(s"served=$served\ndirect=$direct")
      }
    }, "consistent-cut-reader")
    reader.start()
    try {
      (1 to 3).foreach { i =>
        sql("CALL gap.system.create_branch('default.cc_base', 'cut')")
        sql("CALL gap.system.create_branch('default.cc_mv', 'cut')")
        sql("INSERT INTO gap.default.cc_base_branch_cut SELECT " +
          s"concat('g', id % 4), id FROM range(${1000 * i}, " +
          s"${1000 * i + 40})")
        refreshInto("cc_mv_branch_cut", "cc_base_branch_cut")
        sql("CALL gap.system.publish_tables(" +
          "'default.cc_base,default.cc_mv', 'cut')")
        // the no-refusal-window half: IMMEDIATELY after the publish,
        // the aggregate serves from the MV again (the pending stamp
        // resolved at the marker — no ALTER races, no stale gap)
        assert(scansOf(sql(agg)).exists(_.contains("cc_mv")),
          s"MV must serve immediately after cut publish #$i")
        sql("DROP TABLE gap.default.cc_base_branch_cut")
        sql("DROP TABLE gap.default.cc_mv_branch_cut")
      }
    } finally { stop = true; reader.join(30000) }
    assert(torn.isEmpty, s"torn base/MV read observed:\n$torn")
    // the content is right too, not just consistent
    val fin = sql(agg).collect().map(r => (r.getString(0), r.getLong(2)))
      .toMap
    assert(fin.values.sum == 100L + 3 * 40L, s"final census: $fin")
    Seq("cc_base", "cc_mv").foreach(t =>
      sql(s"DROP TABLE gap.default.$t"))
  }

  test("two concurrent publishers serialize on the index lock: one " +
      "lands, the other aborts whole on the divergence it then sees") {
    val (f, d) = freshPair("pp")
    val (fn, dn) = (f.split('.').last, d.split('.').last)
    Seq(f, d).foreach(t => sql(s"DROP TABLE IF EXISTS ${t}_branch_pub_b"))
    branchBoth(f, d)
    sql(s"CALL gap.system.create_branch('default.$fn', 'pub_b')")
    sql(s"CALL gap.system.create_branch('default.$dn', 'pub_b')")
    sql(s"INSERT INTO ${f}_branch_pub VALUES (10, 50)")
    sql(s"INSERT INTO ${d}_branch_pub VALUES (50, 'a')")
    sql(s"INSERT INTO ${f}_branch_pub_b VALUES (11, 51)")
    sql(s"INSERT INTO ${d}_branch_pub_b VALUES (51, 'b')")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val ts = Seq("pub", "pub_b").map(b => new Thread(() => {
      try {
        sql("CALL gap.system.publish_tables(" +
          s"'default.$fn,default.$dn', '$b')").collect()
        results.add(true): Unit
      } catch { case _: Throwable => results.add(false): Unit }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    // exactly one transaction lands (the second sees a diverged main
    // under the lock and aborts whole); both tables agree on which
    assert(rs.count(identity) == 1 && rs.size == 2, rs.toString)
    val fNew = sql(s"SELECT COUNT(*) FROM $f WHERE k IN (10, 11)")
      .head().getLong(0)
    val dNew = sql(s"SELECT COUNT(*) FROM $d WHERE dk IN (50, 51)")
      .head().getLong(0)
    assert(fNew == 1 && dNew == 1, s"fact=$fNew dim=$dNew")
  }

  test("publish racing foreign DML on a member table either fully " +
      "lands or fully aborts") {
    val (f, d) = freshPair("dml")
    val (fn, dn) = (f.split('.').last, d.split('.').last)
    var published = 0
    var aborted = 0
    (0 until 4).foreach { i =>
      branchBoth(f, d)
      sql(s"INSERT INTO ${f}_branch_pub VALUES (${2000 + i}, ${200 + i})")
      sql(s"INSERT INTO ${d}_branch_pub VALUES (${200 + i}, 'r$i')")
      // foreign DML racing the publish from another thread
      val racer = new Thread(() => {
        try sql(s"INSERT INTO $f VALUES (${3000 + i}, 10)"): Unit
        catch { case _: Throwable => () }
      })
      racer.start()
      val preF = sql(s"SELECT COUNT(*) FROM $f WHERE k = ${2000 + i}")
      val preD = sql(s"SELECT COUNT(*) FROM $d WHERE dk = ${200 + i}")
      try {
        sql("CALL gap.system.publish_tables(" +
          s"'default.$fn,default.$dn', 'pub')").collect()
        published += 1
      } catch { case _: Exception => aborted += 1 }
      racer.join(30000)
      // invariant either way: the transaction's fact row and dim row
      // are visible together or not at all
      val hasF = preF.head().getLong(0) == 1
      val hasD = preD.head().getLong(0) == 1
      assert(hasF == hasD, s"torn publish at round $i: fact=$hasF dim=$hasD")
      sql(s"DROP TABLE ${f}_branch_pub")
      sql(s"DROP TABLE ${d}_branch_pub")
    }
    assert(published + aborted == 4)
  }
}
