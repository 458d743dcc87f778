package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** ML-pipeline parity (SURVEY.md §2.1 M1-M5): the reference's two-stage
  * VectorAssembler -> RandomForest(100 trees, depth 10, seed 42) pipeline
  * (train_model.py:16-31), rebuilt over the `embeddings` fixture.
  *
  * The reference assembles ~30 scalar feature columns into `features`
  * inside the persisted Pipeline; the fixture carries one embedding array
  * instead, so the analog is: derive two scalar features (L2 norm and
  * mean of the embedding — the kind of per-row summary a real feature
  * table carries as columns) plus the vectorized embedding, and let a
  * real [[VectorAssembler]] stage — stage 1 of the PERSISTED 2-stage
  * pipeline, exactly train_model.py:29-31's shape — concatenate them
  * into `features` for the RF stage. `PipelineModel.load` then
  * round-trips assembler + classifier together, so the predict path
  * needs only the raw columns, not a hand-maintained feature recipe.
  *
  * Mirrors the reference's staging: a 2,000-row stratified working set
  * (prepare_data.py:19-24 analog) then the same deterministic md5-based
  * stratified 70/30 split as q51 (prepare_data.py:26-31 analog, seed 42).
  *
  * Declared WITHOUT an oracle: VectorUDT and RF internals are not
  * DuckDB-expressible (FIXTURES.md A4); the driver records a rows-only
  * check, and MLPipelineSpec asserts seed-reproducibility and
  * save/load/transform identity of the 2-stage model.
  */
object MLQueries {

  /** Raw-to-assembler-input derivation shared by every train and predict
    * path (q60, FraudPipeline train/predict): scalar summaries + the
    * vectorized embedding. Everything downstream of this — assembly and
    * classification — lives INSIDE the persisted pipeline, so train and
    * predict cannot drift apart on the feature recipe.
    * Pure narrow column work: no shuffle, codegen'd higher-order funcs.
    *
    * `dim`: when known (streaming predict), declared as ML attribute
    * metadata on `emb_vec` — VectorAssembler otherwise infers undeclared
    * vector sizes with a batch `first()`, which is illegal on a
    * streaming DataFrame. Batch callers may omit it. */
  def withAssemblerInputs(df: DataFrame, dim: Option[Int] = None): DataFrame = {
    val base = df
      .withColumn("emb_norm",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn("emb_mean",
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double")) / size(col("embedding")))
      .withColumn("emb_vec", array_to_vector(col("embedding")))
    dim.fold(base)(d => base.withMetadata("emb_vec",
      new org.apache.spark.ml.attribute.AttributeGroup("emb_vec", d)
        .toMetadata()))
  }

  /** Stage 1 of the persisted pipeline (train_model.py:16-19 analog):
    * 2 scalar columns + the embedding vector -> `features`. */
  def assembler(): VectorAssembler = new VectorAssembler()
    .setInputCols(Array("emb_norm", "emb_mean", "emb_vec"))
    .setOutputCol("features")

  /** Stage 2: the reference's classifier, hyperparameters verbatim
    * (train_model.py:21-24). */
  def classifier(): RandomForestClassifier = new RandomForestClassifier()
    .setLabelCol("label").setFeaturesCol("features")
    .setNumTrees(100).setMaxDepth(10).setSeed(42)

  /** The full 2-stage assembler->classifier pipeline
    * (train_model.py:29-31). */
  def pipeline(): Pipeline =
    new Pipeline().setStages(Array(assembler(), classifier()))

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
        val base = withAssemblerInputs(
          graft.pipeline.Sampling.rankedByClass(raw, "label",
              md5(concat(lit("42:"), col("vec_id").cast("string"))), "vec_id")
            .crossJoin(broadcast(tot))
            .withColumn("quota", least(col("n_class"),
              round(lit(2000.0) * col("n_class") / col("n_total")).cast("long")))
            .filter(col("rn") <= col("quota"))
            .withColumn("is_train",
              col("rn") <= ceil(col("quota") * 0.7).cast("long")))
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
        val model = pipeline().fit(train)
        model.transform(test)
          .select(col("vec_id"), col("label"),
            col("prediction").cast("int").as("predicted_label"))
          .orderBy("vec_id")
      },
      None)
  )
}
