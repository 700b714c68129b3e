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
  private val mayBeEmpty = Set("dedup_embedding")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
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
