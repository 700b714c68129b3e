package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of join — the classic time-series operator Spark lacks natively,
  * composed from built-ins (preference (a) of the build rules): tag both
  * sides, union, one window pass per key ordered by time with
  * `last_value(…, ignoreNulls)` carrying the most recent right-side row
  * forward, then keep left rows. One shuffle on the key, no range
  * explosion — the plan a sort-merge as-of join would produce anyway,
  * so it scales to billions of rows per key group.
  *
  * Tie rule: at equal timestamps the right row sorts first, so a
  * same-instant right row IS visible to the left row (`left.ts >=
  * right.ts` semantics, matching DuckDB's ASOF JOIN, which the oracle
  * uses).
  */
object AsOfJoin {

  /** Generic: left ⟕asof right on equal `key`, `leftTs >= rightTs`.
    * `rightPayload` columns are carried (NULL when no prior right row).
    */
  def apply(left: DataFrame, right: DataFrame, key: String, tsCol: String,
            rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    // align schemas: left lacks payload cols, right lacks left-only cols
    val allCols = (leftCols ++ rightPayload).distinct
    def aligned(df: DataFrame, have: Set[String]): DataFrame =
      df.select(((allCols.map(c =>
        if (have(c)) col(c) else lit(null).as(c)) :+ col("__side"))
        .toIndexedSeq): _*)
    val unioned = aligned(l, leftCols.toSet)
      .unionByName(aligned(r, (Seq(key, tsCol) ++ rightPayload).toSet))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the matched right row as ONE struct — carrying columns
    // independently would let a NULL payload field inherit a stale value
    // from an older right row (torn rows mixing two right rows)
    val carried = unioned.withColumn("__asof",
      last(when(col("__side") === 0,
          struct(rightPayload.map(col): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col("__asof").getField(c).as(s"asof_$c")))
        .toIndexedSeq: _*)
  }

  /** Oracle-checked entry: for every purchase event, the most recent
    * prior (or same-instant) click of the same user. */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    apply(purchases, clicks, "user_id", "ts",
        Seq("click_id", "click_value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_id").as("click_id"),
        col("asof_click_value").as("click_value"))
      .orderBy("event_id")
  }
}
