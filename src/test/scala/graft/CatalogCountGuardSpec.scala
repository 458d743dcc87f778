package graft

/** Guard from VERDICT r12: run every catalog query under `.count()`.
  *
  * Bench counts each query's result (`Bench.scala`), which lets
  * Catalyst prune aggressively — including NESTED schema pruning, the
  * path that crashed q220 in the r12 bench while Verify (which
  * projects every field) stayed green. Counting here closes that gap
  * between the two channels: any catalog query whose scan misbinds a
  * pruned layout fails THIS suite, not the round's bench capture.
  * Runs at sf0.001 (smoke scale) — the plan shapes, not the data
  * volume, are what's under test. */
class CatalogCountGuardSpec extends SparkSpec {

  graft.catalog.CatalogQueries.defs.foreach { q =>
    test(s"${q.name} survives .count()") {
      val n = q.run(spark, sfDir).count()
      assert(n >= 0L)
    }
  }
}
