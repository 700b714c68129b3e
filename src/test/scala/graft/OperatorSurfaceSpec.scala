package graft

import org.scalatest.funsuite.AnyFunSuite

/** Umbrella spec: every SparkEntry query runs at sf0.001, returns rows
  * (except genuinely-empty-result ops) and every oracle key maps to a
  * query. The value-level check is the driver's DuckDB gate; this keeps
  * the surface wired and the plans executable.
  */
class OperatorSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._

  // ops whose correct result can legitimately be empty at sf0.001
  // (embedding-cosine pairs: the tiny corpus has no cross pair over
  // the 0.45 threshold — for the streaming twin, none within the SRP
  // hamming-1 reach; both rows carry real rows at sf0.01+ and their
  // oracles hash-match the emptiness here)
  private val mayBeEmpty = Set("dedup_embedding", "q_stream_semantic")

  // ops with a DELIBERATE nested-loop join of a guaranteed-one-row
  // broadcast side (a scalar append: O(n) work at any scale, not the
  // O(n·m) blowup the hygiene assert exists to catch)
  private val scalarNlj = Set(
    "q_mixture_sample",
    // three 1-row global aggregates (the separate-distinct profile
    // shape) cross-joined; a 1-row build side can't blow up
    "q_profile_events",
    // the brute top-k totals (one row: n_true, n_queries) cross-joined
    // onto the 5-row per-family hit counts
    "sim_recall_matrix")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // plan hygiene on the already-built plan: a cartesian product or
      // nested-loop join anywhere is an O(n²) task at 100 TB — the
      // family specs assert this per-operator; this catches the query
      // that slips in without one. Eagerly-materialized harness ops
      // reduce to an ExistingRDD scan here (vacuously clean); their
      // internal plans carry their own specs.
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!scalarNlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
