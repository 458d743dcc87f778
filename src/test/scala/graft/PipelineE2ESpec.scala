package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.FraudPipeline

/** Drives the complete reference-parity pipeline end to end:
  * prepare → train → persist → replay → streaming score → sink → read
  * back. The reference's flagship flow (SURVEY.md §3.2), in one test. */
class PipelineE2ESpec extends SparkSpec {

  test("prepare -> train -> replay -> streaming predict scores every test row exactly once") {
    val workDir = Files.createTempDirectory("graft_e2e_").toString
    val a = FraudPipeline.prepareTrainProduce(spark, sfDir, workDir)
    assert(a.nTest > 0)

    val q = FraudPipeline.predict(spark, a)
    q.awaitTermination()

    val preds = FraudPipeline.readPredictions(spark, a).cache()
    try {
      // exactly-once: one prediction per replayed test row
      assert(preds.count() == a.nTest)
      assert(preds.select("vec_id").distinct().count() == a.nTest)
      // output carries ground truth + prediction side by side (predict.py:40-42)
      assert(preds.filter(col("actual_label").isNull ||
        col("predicted_label").isNull).count() == 0)
      // predictions land in the label domain
      val labels = Tables(spark, sfDir, "embeddings")
        .select("label").distinct().collect().map(_.getInt(0)).toSet
      val outLabels = preds.select("predicted_label").distinct()
        .collect().map(_.getDouble(0).toInt).toSet
      assert(outLabels.subsetOf(labels))
    } finally preds.unpersist()
  }
}
