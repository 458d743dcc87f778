package graft

import org.apache.spark.sql.functions._

/** Stratified sampling/split contract (SURVEY.md §2.1 F1/F2): exact
  * per-class sizes, determinism across runs, train/test disjointness —
  * the sklearn-contract invariants (prepare_data.py:19-31), scale-safely.
  */
class SamplingSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("stratified sample draws exactly min(20, class size) per class") {
    val got = run("q50_stratified_sample")
      .groupBy("label").agg(count(lit(1)).as("n"))
    val classSizes = Tables(spark, sfDir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("total"))
    val bad = got.join(classSizes, "label")
      .filter(col("n") =!= least(lit(20L), col("total"))).count()
    assert(bad == 0)
  }

  test("70/30 split is exactly stratified and disjoint") {
    val split = run("q51_train_test_split").cache()
    try {
      // every input row assigned exactly once
      assert(split.count() == Tables(spark, sfDir, "embeddings").count())
      assert(split.select("vec_id").distinct().count() == split.count())
      // per class: train = ceil(0.7 * n)
      val bad = split.groupBy("label").agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          count(lit(1)).as("n"))
        .filter(col("n_train") =!= ceil(col("n") * 0.7).cast("long"))
        .count()
      assert(bad == 0)
    } finally split.unpersist()
  }

  test("sampling is deterministic across runs (seed-42 analog)") {
    val a = run("q50_stratified_sample").collect().toSeq
    val b = run("q50_stratified_sample").collect().toSeq
    assert(a == b)
  }
}
