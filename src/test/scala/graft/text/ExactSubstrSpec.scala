package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants of the corpus-wide duplicated-substring excision (q143)
  * that the DuckDB hash-match can't see on its own: the keeper policy
  * (at least one occurrence of every duplicated window survives) and
  * span accounting bounds. */
class ExactSubstrSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("q143_exact_substr_dedup")(spark, sfDir).cache()

  test("every document reports, and accounting is internally consistent") {
    val docs = graft.Tables(spark, sfDir, "documents").count()
    assert(out.count() == docs)
    // removed tokens never exceed the doc's tokens; spans imply removal
    val bad = out.filter(
      col("n_removed") > col("n_tok") ||
        (col("n_spans") > 0) =!= (col("n_removed") > 0) ||
        col("n_removed") < col("n_spans") * 8).count()
    assert(bad == 0)
  }

  test("keeper policy: strictly fewer tokens are removed than duplicated " +
    "window occurrences cover (first occurrence always survives)") {
    // Recompute the duplicated-occurrence token cover without the keeper
    // exemption; q143's removal must be strictly smaller whenever any
    // duplicate exists (the rn=1 occurrence keeps its text).
    val toks = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr(TextAnalysis.tokensExpr).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")) - 7)).as("pos"),
        col("toks"))
      .select(col("doc_id"), col("pos"),
        md5(array_join(slice(col("toks"), col("pos"), lit(8)), " "))
          .as("fp"))
    val dupOcc = toks
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("cnt") >= 2)
    val removed = out.agg(sum("n_removed")).head().getLong(0)
    val dups = dupOcc.count()
    assert(dups > 0, "fixture carries no duplicated 8-grams — spec is vacuous")
    assert(removed > 0)
    // every gram's keeper occurrence is exempt, so the removed token cover
    // is strictly below W * duplicated occurrences
    assert(removed < dups * 8)
  }
}
