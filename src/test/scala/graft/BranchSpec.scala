package graft

import org.apache.spark.sql.Row

/** Branch workflow ([[graft.catalog.GraftCatalog.createBranch]] /
  * fastForward): fork-write-publish with git's fast-forward rule.
  *
  * Pinned contracts: zero-copy fork (hard links — shared inodes), main
  * untouched while the branch mutates, one atomic publish commit,
  * DIVERGENCE refusal (a main commit after the branch point fails
  * fast_forward loudly instead of being erased), schema-drift refusal,
  * and branch abandonment via plain DROP TABLE without touching main's
  * data. */
class BranchSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.gbr",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gbr.default.$name"
    sql(s"DROP TABLE IF EXISTS ${t}_branch_fix")
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    t
  }

  test("fork -> write on branch -> fast_forward publishes atomically; " +
      "main is untouched in between") {
    val t = setup("br_happy")
    val out = sql(s"CALL gbr.system.create_branch('default.br_happy', " +
      "'fix')").collect()
    assert(out.head.getString(0) == "default.br_happy_branch_fix")
    val b = s"gbr.default.br_happy_branch_fix"
    // multi-statement repair on the branch
    sql(s"DELETE FROM $b WHERE k = 2")
    sql(s"INSERT INTO $b VALUES (4, 'd')")
    // main still serves the pre-branch content
    assert(sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val ff = sql(s"CALL gbr.system.fast_forward('default.br_happy', " +
      "'fix')").collect().head
    assert(ff.getLong(1) == 3L, s"rows published: $ff")
    assert(sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(3L, "c"), Row(4L, "d")))
    // publish is ONE commit: time travel to the pre-publish version
    // still shows the old content
    val vNow = sql(s"SHOW TBLPROPERTIES $t").collect()
      .collectFirst { case r if r.getString(0) == "graft.current_version" =>
        r.getString(1).toInt }.get
    assert(sql(s"SELECT count(*) FROM $t VERSION AS OF ${vNow - 1}")
      .head().getLong(0) == 3L)
    // branch table lives on independently until dropped
    sql(s"DROP TABLE $b")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3L)
  }

  test("divergence: a main commit after the branch point fails " +
      "fast_forward loudly and loses nothing") {
    val t = setup("br_div")
    sql(s"CALL gbr.system.create_branch('default.br_div', 'fix')")
    val b = s"gbr.default.br_div_branch_fix"
    sql(s"INSERT INTO $b VALUES (4, 'd')")
    sql(s"INSERT INTO $t VALUES (99, 'z')") // main moves -> diverged
    val e = intercept[Exception] {
      sql(s"CALL gbr.system.fast_forward('default.br_div', 'fix')")
    }
    assert(e.getMessage.contains("diverged"), s"got ${e.getMessage}")
    // nothing lost on either side
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 4L)
    assert(sql(s"SELECT count(*) FROM $b").head().getLong(0) == 4L)
    // ...and the refused publish removed its freshly created links:
    // every file under main's data dir is referenced by main's log
    val referenced = sql(s"SELECT path FROM gbr.default.`br_div$$files`")
      .collect().map(_.getString(0)).toSet
    import java.nio.file.{Files, Paths}
    val dataDir = Paths.get(referenced.head).getParent
    val onDisk = graft.util.Fs.children(dataDir).map(_.toString)
      .filterNot(p => Paths.get(p).getFileName.toString.startsWith("."))
      .toSet // Hadoop .crc sidecars aren't data files
    assert(onDisk == referenced,
      s"orphan links left by refused fast_forward: ${onDisk -- referenced}")
  }

  test("schema drift on the branch refuses fast_forward") {
    val t = setup("br_ddl")
    sql(s"CALL gbr.system.create_branch('default.br_ddl', 'fix')")
    sql(s"ALTER TABLE gbr.default.br_ddl_branch_fix ADD COLUMN w DOUBLE")
    val e = intercept[Exception] {
      sql(s"CALL gbr.system.fast_forward('default.br_ddl', 'fix')")
    }
    assert(e.getMessage.contains("schema"), s"got ${e.getMessage}")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3L)
  }

  test("zero-copy: unchanged files share inodes; branch-only writes " +
      "never appear under main until publish") {
    val t = setup("br_zero")
    sql(s"CALL gbr.system.create_branch('default.br_zero', 'fix')")
    val mainFiles = sql(
      s"SELECT path FROM gbr.default.`br_zero$$files`").collect()
      .map(_.getString(0)).toSeq
    val branchFiles = sql(
      s"SELECT path FROM gbr.default.`br_zero_branch_fix$$files`")
      .collect().map(_.getString(0)).toSeq
    assert(mainFiles.size == branchFiles.size)
    mainFiles.zip(branchFiles.sorted.zip(mainFiles.sorted).map(_._1))
    import java.nio.file.{Files, Paths}
    branchFiles.foreach { bf =>
      val name = Paths.get(bf).getFileName.toString
      val mf = mainFiles.find(_.endsWith(name)).get
      assert(Files.isSameFile(Paths.get(bf), Paths.get(mf)),
        "fork must hard-link, not copy")
    }
  }

  test("$refs lists tags and branches with fast-forward eligibility") {
    val t = setup("br_refs")
    sql(s"CALL gbr.system.tag('default.br_refs', 'audited')")
    sql(s"CALL gbr.system.create_branch('default.br_refs', 'fix')")
    val refs1 = sql(s"SELECT ref, kind, status FROM " +
      s"gbr.default.`br_refs$$refs` ORDER BY kind, ref").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(refs1.exists(r => r._1 == "fix" && r._2 == "branch" &&
      r._3 == "fast_forwardable"), s"got $refs1")
    assert(refs1.exists(r => r._1 == "audited" && r._2 == "tag"),
      s"got $refs1")
    // main moves -> the branch shows diverged
    sql(s"INSERT INTO $t VALUES (9, 'z')")
    val refs2 = sql(s"SELECT ref, status FROM " +
      s"gbr.default.`br_refs$$refs` WHERE kind = 'branch'").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs2 == Seq(("fix", "diverged")), s"got $refs2")
    sql("DROP TABLE gbr.default.br_refs_branch_fix")
  }

  test("non-branch table refuses fast_forward; MOR branch with live " +
      "delta demands compaction first") {
    val t = setup("br_guard")
    sql(s"DROP TABLE IF EXISTS ${t}2")
    sql(s"CREATE TABLE ${t}2 (k BIGINT, v STRING)")
    val e = intercept[Exception] {
      sql(s"CALL gbr.system.fast_forward('default.br_guard2', 'fix')")
    } // no such branch table at all
    assert(e.getMessage != null)
    // MOR: branch carries a live delta -> compact-first error
    sql(s"DROP TABLE IF EXISTS gbr.default.br_mor_branch_fix")
    sql(s"DROP TABLE IF EXISTS gbr.default.br_mor")
    sql("""CREATE TABLE gbr.default.br_mor (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor','graft.row_id'='k')""")
    sql("INSERT INTO gbr.default.br_mor VALUES (1, 'a'), (2, 'b')")
    sql("CALL gbr.system.create_branch('default.br_mor', 'fix')")
    sql("UPDATE gbr.default.br_mor_branch_fix SET v = 'B' WHERE k = 2")
    val e2 = intercept[Exception] {
      sql("CALL gbr.system.fast_forward('default.br_mor', 'fix')")
    }
    assert(e2.getMessage.contains("compact"), s"got ${e2.getMessage}")
    sql("CALL gbr.system.compact('default.br_mor_branch_fix')")
    sql("CALL gbr.system.fast_forward('default.br_mor', 'fix')")
    assert(sql("SELECT v FROM gbr.default.br_mor WHERE k = 2")
      .head().getString(0) == "B")
  }

  test("drop_branch lifecycle: fresh and published branches drop; " +
      "unpublished work refuses without force; $refs reflects it") {
    val t = setup("br_drop")
    // fresh branch (all files shared with main): safe drop
    sql("CALL gbr.system.create_branch('default.br_drop', 'fix')")
    sql("CALL gbr.system.drop_branch('default.br_drop', 'fix')")
    intercept[Exception] {
      sql(s"SELECT * FROM ${t}_branch_fix").collect()
    }
    // branch with unpublished work: refuse, then fast_forward, then drop
    sql("CALL gbr.system.create_branch('default.br_drop', 'fix')")
    sql(s"INSERT INTO ${t}_branch_fix VALUES (9, 'z')")
    val e = intercept[Exception] {
      sql("CALL gbr.system.drop_branch('default.br_drop', 'fix')")
    }
    assert(e.getMessage.contains("fast_forward"), s"got ${e.getMessage}")
    sql("CALL gbr.system.fast_forward('default.br_drop', 'fix')")
    sql("CALL gbr.system.drop_branch('default.br_drop', 'fix')")
    val refs = sql(s"SELECT ref FROM gbr.default.`br_drop$$refs`")
      .collect().map(_.getString(0)).toSeq
    assert(!refs.exists(_.contains("fix")), s"dropped branch in $$refs: $refs")
    // force discards unpublished work loudly-on-purpose
    sql("CALL gbr.system.create_branch('default.br_drop', 'junk')")
    sql(s"INSERT INTO ${t}_branch_junk VALUES (10, 'q')")
    sql("CALL gbr.system.drop_branch('default.br_drop', 'junk', 'true')")
    intercept[Exception] {
      sql(s"SELECT * FROM ${t}_branch_junk").collect()
    }
    // main kept everything that was published, nothing that wasn't
    assert(sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
  }

  test("expire_snapshots on main never GC's bytes a live branch " +
      "references: hard links keep them alive by construction") {
    spark.conf.set("spark.sql.catalog.gbr",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gbr.default.br_gc_branch_keep")
    sql("DROP TABLE IF EXISTS gbr.default.br_gc")
    sql("""CREATE TABLE gbr.default.br_gc (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.retain'='1')""")
    sql("INSERT INTO gbr.default.br_gc VALUES (1, 'a')")
    sql("UPDATE gbr.default.br_gc SET v = 'b'") // file B = current
    sql("CALL gbr.system.create_branch('default.br_gc', 'keep')")
    // main moves on: B is superseded and (retain=1) expires from
    // main's snapshot window; a 0-grace sweep reclaims main's entry
    sql("UPDATE gbr.default.br_gc SET v = 'c'")
    sql("CALL gbr.system.expire_snapshots('default.br_gc', 0)")
    // the BRANCH still reads its branch-point content in full — its
    // hard link is an independent directory entry on the same inode
    assert(sql("SELECT v FROM gbr.default.br_gc_branch_keep")
      .collect().map(_.getString(0)).toSeq == Seq("b"),
      "branch content lost after main's GC")
    assert(sql("SELECT v FROM gbr.default.br_gc")
      .head().getString(0) == "c")
    // main diverged, so the un-forced drop conservatively refuses;
    // force completes the lifecycle
    val e = intercept[Exception] {
      sql("CALL gbr.system.drop_branch('default.br_gc', 'keep')")
    }
    assert(e.getMessage.contains("force"), s"got ${e.getMessage}")
    sql("CALL gbr.system.drop_branch('default.br_gc', 'keep', 'true')")
  }
}
