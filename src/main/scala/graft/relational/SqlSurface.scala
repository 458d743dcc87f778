package graft.relational

import graft.{QueryDef, Tables}

/** Modern Spark-4 SQL text surfaces: pipe syntax and parameterized
  * queries. Semantically these are spellings of plans the suite already
  * covers — the point of declaring them is that a user of the engine
  * writes QUERIES, and these are query dialects Spark 4 ships that the
  * suite would otherwise never parse. Both compile to ordinary Catalyst
  * plans (the pipe operators desugar during parsing; parameters bind
  * before analysis), so distribution and optimization are unchanged.
  */
object SqlSurface {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q188:
    // SQL PIPE SYNTAX (`|>`): the q01 pricing-summary flow written as a
    // linear pipeline — FROM |> WHERE |> AGGREGATE..GROUP BY |> WHERE
    // (post-aggregation filter, i.e. HAVING without the keyword) |>
    // ORDER BY. Each operator desugars to the same logical node the
    // keyword form produces; the plan, pushdown, and partial
    // aggregation are identical — the pipe form is purely a reading
    // order that matches execution order.
    QueryDef(
      "q188_sql_pipe",
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("q188_lineitem")
        s.sql("""
          FROM q188_lineitem
          |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |> AGGREGATE COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_qty
             GROUP BY l_returnflag, l_linestatus
          |> WHERE n > 100
          |> ORDER BY l_returnflag, l_linestatus""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 100
        ORDER BY l_returnflag, l_linestatus""")),

    // -------------------------------------------------------------- q189:
    // PARAMETERIZED SQL: named parameter markers bound through
    // spark.sql(text, args). Parameters bind as literals BEFORE
    // analysis, so the optimizer sees constants (pushdown-able,
    // constant-foldable) while the TEXT stays stable — the plan-cache /
    // injection-safety contract every SQL client library wants. The
    // oracle inlines the same values as literals, which is exactly the
    // equivalence being asserted.
    QueryDef(
      "q189_parameterized_sql",
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("q189_orders")
        s.sql(
          """SELECT o_orderpriority, COUNT(*) AS n,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                      AS sum_total
             FROM q189_orders
             WHERE o_totalprice > :minp
               AND o_orderdate < CAST(:cutoff AS TIMESTAMP)
             GROUP BY o_orderpriority
             ORDER BY o_orderpriority""",
          Map("minp" -> 150000.0, "cutoff" -> "1997-01-01 00:00:00"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_total
        FROM orders
        WHERE o_totalprice > 150000.0
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------- q191:
    // SQL sugar battery: GROUP BY ALL (group on every non-aggregate
    // select item), ORDER BY ALL (sort by the full select list), and
    // IDENTIFIER() (a table name supplied as a bound string — the safe
    // spelling of dynamic-table SQL that template engines otherwise
    // build by concatenation). All three desugar during
    // analysis/binding; the plan is byte-identical to the explicit
    // form, which is what the shared oracle asserts. DuckDB happens to
    // speak GROUP BY ALL / ORDER BY ALL natively, so even the oracle
    // exercises the same sugar.
    QueryDef(
      "q191_sql_sugar_battery",
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("q191_orders")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                      AS sum_total
             FROM IDENTIFIER(:tab)
             GROUP BY ALL
             ORDER BY ALL""",
          Map("tab" -> "q191_orders"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                 AS sum_total
        FROM orders
        GROUP BY ALL
        ORDER BY ALL"""))
  )
}
