package graft.text

import org.apache.spark.sql.functions._

/** q146 held-out bigram-LM scoring: the train/score split must be real
  * (only odd doc_ids scored), the per-doc accounting must balance, and
  * the model join must broadcast (the corpus side never shuffles). */
class BigramLmSpec extends graft.SparkSpec {

  private lazy val out =
    graft.SparkEntry.queries("q146_bigram_lm_score")(spark, sfDir).cache()

  test("only held-out (odd) docs are scored, and every one appears") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val nOdd = docs.filter(col("doc_id") % 2 === 1).count()
    assert(out.count() == nOdd, "scored set != held-out set")
    assert(out.filter(col("doc_id") % 2 === 0).count() == 0,
      "a training doc leaked into the scored output")
  }

  test("accounting balances: unseen <= bigrams; rates only when defined") {
    assert(out.filter(col("n_unseen") > col("n_bigrams")).count() == 0)
    assert(out.filter(col("n_bigrams") === 0 &&
      col("unseen_rate").isNotNull).count() == 0,
      "a zero-bigram doc got a non-null rate")
    // a bigram seen in training has b_cnt >= 1, so sum_bigram_freq >= the
    // number of seen bigrams
    assert(out.filter(col("sum_bigram_freq") <
      col("n_bigrams") - col("n_unseen")).count() == 0)
  }

  test("model join is broadcast — the held-out stream never shuffles on it") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bigram/prefix model join did not broadcast")
  }
}
