package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}

/** Pins the partial stage's group-cardinality cap: past `maxGroups`
  * distinct keys, overflow rows PASS THROUGH unreduced (bounded memory)
  * and the final stage's re-reduction still produces the exact per-group
  * top-k — the correctness-preservation claim the cap rests on. */
class TopKCapSpec extends graft.SparkSpec {

  test("partial-stage cap passes overflow through; final re-reduce is exact") {
    import spark.implicits._
    val k = 5
    val df = (1 to 1000).map(i => (i % 50, i)).toDF("g", "x")
    val out = df.queryExecution.analyzed.output
    val groupExprs = Seq(out.head)
    val order = Seq(SortOrder(out(1), Descending))
    val rows = df.queryExecution.toRdd.collect().map(_.copy()).toSeq

    // cap far below the 50 distinct groups: only 7 groups reduce in-map,
    // the other 43 groups' 20 rows each must stream through unreduced
    val partial = TopKPerGroupExec
      .topKPerPartition(rows.iterator, groupExprs, order, k, out, maxGroups = 7)
      .map(_.copy()).toSeq
    assert(partial.size > 43 * 20 - 50 && partial.size < rows.size,
      s"expected mostly-pass-through partial output, got ${partial.size}")

    val finalRows = TopKPerGroupExec
      .topKPerPartition(partial.iterator, groupExprs, order, k, out, Int.MaxValue)
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    val expected = (1 to 1000).groupBy(_ % 50).toSeq
      .flatMap { case (g, xs) => xs.sorted.reverse.take(k).map((g, _)) }.toSet
    assert(finalRows.toSet == expected)
    assert(finalRows.size == 50 * k)
  }
}
