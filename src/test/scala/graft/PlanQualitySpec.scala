package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the optimizations the engine's scale story relies
  * on must be visible in the executed plan, not assumed. Runs against the
  * sf0.001 testdata so real parquet scans (with pushdown) are planned. */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def df(name: String) = SparkEntry.queries(name)(spark, dir)
  private def plan(name: String): String =
    df(name).queryExecution.executedPlan.toString
  /** Final adaptive plan (after execution) — codegen spans and exchange
    * reuse only materialize in the finalized plan. */
  private def finalPlan(name: String): String = {
    val q = df(name)
    q.collect()
    q.queryExecution.executedPlan.toString
  }

  test("p1: filter and projection push into the parquet scan") {
    val p = plan("p1_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull") &&
      p.contains("GreaterThan(o_totalprice,100000.0)"), p)
    // column pruning: scan reads only the 3 projected + 1 filter column
    assert(!p.contains("o_orderdate") && !p.contains("o_orderpriority"), p)
  }

  test("q5: dimension joins broadcast, no shuffle of the nation side") {
    val p = plan("q5_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q2: the summary engine shuffles exactly once (grouping sets + explode unpivot)") {
    val p = plan("q2_summary_engine")
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q3: quality pass-1 aggregate is cached and reused, not recomputed per branch") {
    val p = finalPlan("q3_quality_report")
    // both the simple-counts report and the z-score moments join read the
    // 1-row pass-1 aggregate from cache → exactly 2 input scans at runtime
    // (cache materialization + the z-score second pass)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("j1: cross-cohort agg never builds a row-level cross product") {
    val p = plan("j1_cross_agg")
    // the cartesian join happens on two 1-row aggregated sides
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
    // each side fully aggregates before the join: partial+final per side
    assert("HashAggregate".r.findAllIn(p).length >= 4 ||
      "SortAggregate".r.findAllIn(p).length >= 4, p)
  }

  test("whole-stage codegen spans cover the relational queries") {
    Seq("q1_agg", "p2_cast_project", "e1_events_hourly").foreach { q =>
      val p = finalPlan(q)
      assert(p.contains("WholeStageCodegen") || p.contains("*("),
        s"$q has no codegen span:\n$p")
    }
  }
}
