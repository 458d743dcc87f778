package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Reference-parity sampling ops (SURVEY.md §2.1 F1/F2): exact-n
  * stratified sampling and a stratified 70/30 train/test split, re-expressed
  * as distributed Spark transformations.
  *
  * The reference does this driver-side in pandas/sklearn
  * (prepare_data.py:19-31, seed 42) — fine for 2,000 rows, impossible at
  * 100 TB. Here the "random" order is a deterministic md5 of "42:<key>"
  * (seed 42 analog), ranked per class with a window — one shuffle on the
  * class key, no driver collect, and the sample is stable under any
  * cluster size or partitioning. The DuckDB oracle replays the identical
  * ranking, so the *exact row identity* of the sample is verified, not
  * just its size.
  */
object Sampling {

  private val rkSpark = md5(concat(lit("42:"), col("vec_id").cast("string")))

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q50:
    // exact-n stratified sample: 20 rows per label, seed-42-deterministic.
    QueryDef(
      "q50_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy(col("label")).orderBy(col("rk"), col("vec_id"))
        Tables(s, d, "embeddings")
          .withColumn("rk", rkSpark)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("vec_id"), col("label"), col("rn"))
          .orderBy("label", "rn")
      },
      Some("""
        SELECT vec_id, label, rn FROM (
          SELECT vec_id, label,
                 CAST(ROW_NUMBER() OVER (PARTITION BY label
                      ORDER BY md5(concat('42:', vec_id)), vec_id) AS INTEGER) rn
          FROM embeddings) x
        WHERE rn <= 20
        ORDER BY label, rn""")),

    // --------------------------------------------------------------- q51:
    // stratified 70/30 split: per-class md5 rank against ceil(0.7 * n) —
    // exactly stratified (unlike randomSplit, which is only approximate).
    QueryDef(
      "q51_train_test_split",
      (s, d) => {
        val w = Window.partitionBy(col("label")).orderBy(col("rk"), col("vec_id"))
        val wc = Window.partitionBy(col("label"))
        Tables(s, d, "embeddings")
          .withColumn("rk", rkSpark)
          .withColumn("rn", row_number().over(w))
          .withColumn("n_class", count(lit(1)).over(wc))
          .withColumn("split",
            when(col("rn") <= ceil(col("n_class") * 0.7).cast("long"), "train")
              .otherwise("test"))
          .select(col("vec_id"), col("label"), col("split"))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id, label,
               CASE WHEN rn <= CAST(CEIL(n_class * 0.7) AS BIGINT)
                    THEN 'train' ELSE 'test' END AS split
        FROM (SELECT vec_id, label,
                     CAST(ROW_NUMBER() OVER (PARTITION BY label
                          ORDER BY md5(concat('42:', vec_id)), vec_id) AS INTEGER) rn,
                     COUNT(*) OVER (PARTITION BY label) n_class
              FROM embeddings) x
        ORDER BY vec_id"""))
  )
}
