package graft

import java.nio.file.Files

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML parity (SURVEY.md §2.1 M1-M5): RF(100, 10, seed 42) pipeline —
  * reproducibility under the fixed seed and save/load/transform identity
  * (train_model.py:21-33, predict.py:18 analogs).
  */
class MLPipelineSpec extends SparkSpec {

  private def featurized: DataFrame =
    Tables(spark, sfDir, "embeddings")
      .withColumn("features", array_to_vector(col("embedding")))

  private def fit(df: DataFrame): PipelineModel = {
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setNumTrees(100).setMaxDepth(10).setSeed(42)
    new Pipeline().setStages(Array(rf)).fit(df)
  }

  private def preds(m: PipelineModel, df: DataFrame): Seq[(Long, Double)] =
    m.transform(df).select("vec_id", "prediction")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq

  test("two fits with seed 42 on identical data produce identical predictions") {
    val df = featurized.cache()
    try {
      val p1 = preds(fit(df), df)
      val p2 = preds(fit(df), df)
      assert(p1 == p2)
      assert(p1.nonEmpty)
    } finally df.unpersist()
  }

  test("model save -> load -> transform is identity (M4/M5)") {
    val df = featurized.cache()
    try {
      val m = fit(df)
      val dir = Files.createTempDirectory("graft_model_").toString + "/rf"
      m.write.overwrite().save(dir)
      val loaded = PipelineModel.load(dir)
      assert(preds(m, df) == preds(loaded, df))
    } finally df.unpersist()
  }
}
