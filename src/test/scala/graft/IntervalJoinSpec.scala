package graft

import org.apache.spark.sql.functions._

/** q144 interval-overlap self-join: the bucket decomposition must plan as
  * an EQUI-join (that is the whole point — Catalyst would otherwise run a
  * nested-loop cartesian for an inequality-only self-join), and overlap
  * counting must be symmetric. */
class IntervalJoinSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("q144_interval_overlap_join")(spark, sfDir).cache()

  test("pair stage plans as an equi-join, not a nested-loop cartesian") {
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "interval join fell back to a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval join fell back to a nested-loop join")
  }

  test("overlap counts are symmetric: total directed count is even") {
    val total = out.agg(sum("n_concurrent")).head().getLong(0)
    assert(total > 0, "fixture produced no overlapping sessions")
    assert(total % 2 == 0,
      s"directed overlap count $total is odd — attribution dropped a side")
  }

  test("a session overlapping nothing reports zero, not a dropped row") {
    val sessions = out.count()
    val byUser = out.select("user_id").distinct().count()
    assert(sessions > byUser, "expected multiple sessions per user")
    assert(out.filter(col("n_concurrent") === 0).count() > 0)
  }
}
