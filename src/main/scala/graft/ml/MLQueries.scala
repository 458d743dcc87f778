package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** ML-pipeline parity (SURVEY.md §2.1 M1-M5): the reference's
  * VectorAssembler -> RandomForest(100 trees, depth 10, seed 42) pipeline
  * (train_model.py:16-31), rebuilt over the `embeddings` fixture.
  *
  * The feature vector comes from the embedding array (array_to_vector —
  * the fixture analog of assembling 30 scalar columns), the label from the
  * fixture's `label`. Mirrors the reference's staging exactly: a 2,000-row
  * stratified working set (prepare_data.py:19-24 analog) then the same
  * deterministic md5-based stratified 70/30 split as q51
  * (prepare_data.py:26-31 analog, seed 42).
  *
  * Declared WITHOUT an oracle: VectorUDT and RF internals are not
  * DuckDB-expressible (FIXTURES.md A4); the driver records a rows-only
  * check, and MLPipelineSpec asserts seed-reproducibility and
  * save/load/transform identity.
  */
object MLQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q60_rf_pipeline",
      (s, d) => {
        val raw = Tables(s, d, "embeddings")
        // Reference contract (prepare_data.py:19-31): draw a 2,000-row
        // stratified working set FIRST, then split 70/30 — training never
        // scales with the raw table. Proportional per-class quotas; the
        // global count arrives via a broadcast 1-row aggregate (no
        // single-partition global window), and the per-class rank via the
        // two-phase bucketed ranking (graft.pipeline.Sampling.rankedByClass)
        // — no bare-label window anywhere in the prep.
        val tot = raw.agg(count(lit(1)).as("n_total"))
        val base = graft.pipeline.Sampling.rankedByClass(raw, "label",
            md5(concat(lit("42:"), col("vec_id").cast("string"))), "vec_id")
          .crossJoin(broadcast(tot))
          .withColumn("quota", least(col("n_class"),
            round(lit(2000.0) * col("n_class") / col("n_total")).cast("long")))
          .filter(col("rn") <= col("quota"))
          .withColumn("is_train", col("rn") <= ceil(col("quota") * 0.7).cast("long"))
          .withColumn("features", array_to_vector(col("embedding")))
          // The working set is ≤2,000 rows by construction, but tree
          // induction runs many small jobs (one per node group per level);
          // at 32+ partitions each job is scheduler-bound. Exchange the
          // sampled set down to a handful of partitions before fit — valid
          // at any cluster size because the sample is bounded, not the table.
          .repartition(4)
          // Materialize the prep ONCE: `train`, `test`, and the final
          // transform all consume this set, and RF induction re-triggers
          // its input many times (one job per node group per level) — an
          // eager localCheckpoint cuts the lineage so the two-phase
          // ranking + broadcast join never re-derives from the raw table.
          // Bounded set -> executor-local storage is safe; released by the
          // ContextCleaner when the plan is GC'd.
          .localCheckpoint()
        val train = base.filter(col("is_train"))
        val test = base.filter(!col("is_train"))
        val rf = new RandomForestClassifier()
          .setLabelCol("label").setFeaturesCol("features")
          .setNumTrees(100).setMaxDepth(10).setSeed(42)
        val model = new Pipeline().setStages(Array(rf)).fit(train)
        model.transform(test)
          .select(col("vec_id"), col("label"),
            col("prediction").cast("int").as("predicted_label"))
          .orderBy("vec_id")
      },
      None)
  )
}
