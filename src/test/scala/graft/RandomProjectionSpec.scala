package graft

import org.apache.spark.sql.functions._

/** q145 signed-random-projection audit: the reduction must stay map-only
  * (one linear equi-join for the pair audit, never all-pairs), and the
  * error histogram must account for every consecutive pair exactly once.
  */
class RandomProjectionSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("q145_random_projection_audit")(spark, sfDir).cache()

  test("pair audit plans as an equi-join, not a cartesian/nested-loop") {
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "projection audit fell back to a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "projection audit fell back to a nested-loop join")
  }

  test("histogram mass equals the consecutive-pair count (n - 1)") {
    val n = Tables(spark, sfDir, "embeddings").count()
    val mass = out.agg(sum("n_pairs")).head().getLong(0)
    assert(mass == n - 1,
      s"histogram covers $mass pairs, expected ${n - 1}")
  }

  test("projection preserves cosine: most pairs land in low-error buckets") {
    val mass = out.agg(sum("n_pairs")).head().getLong(0)
    // |cos64 - cos16| < 0.25 (buckets 0-4) for a clear majority — the
    // Johnson-Lindenstrauss contract that makes the 16-dim space usable
    // as a pre-filter at all.
    val low = out.filter(col("err_bucket") <= 4)
      .agg(sum("n_pairs")).head().getLong(0)
    assert(low * 2 > mass,
      s"only $low / $mass pairs within 0.25 cosine error — projection broken")
  }
}
