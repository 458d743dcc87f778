package graft

import org.apache.spark.sql.functions._

/** Cross-query invariants tying the cleaning capstone (q118) to the
  * operators it composes — the guarantees a pipeline owner actually
  * relies on when swapping the funnel report (q107) for the
  * materialized corpus (q118). */
class CleanCorpusSpec extends SparkSpec {

  test("q118 survivors are bounded by q107's repetition-stage count") {
    val funnel = SparkEntry.queries("q107_clean_cascade")(spark, sfDir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val clean = SparkEntry.queries("q118_clean_corpus")(spark, sfDir)
    // every q118 survivor passed the same lang/length/repetition
    // predicates q107 counts at stage 3, then strictly-shrinking stages
    assert(clean.count() <= funnel("repetition"))
    assert(clean.count() > 0)
  }

  test("q118 cleaned docs contain no boilerplate span and no duplicates") {
    val clean = SparkEntry.queries("q118_clean_corpus")(spark, sfDir)
    // exact dedup held: clean_text is unique
    assert(clean.select("clean_text").distinct().count() == clean.count())
    // post-excision minimum length held
    val minLen = clean
      .select(min(size(split(col("clean_text"), " "))).as("m"))
      .head().getInt(0)
    assert(minLen >= 10, s"post-excision doc shorter than 10 tokens: $minLen")
    // accounting is internally consistent
    val bad = clean.filter(col("n_tokens_clean") > col("n_tokens_raw") ||
      col("n_tokens_clean") < 0).count()
    assert(bad == 0)
  }
}
