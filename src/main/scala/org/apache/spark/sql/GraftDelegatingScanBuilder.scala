package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Pushdown-preserving scan-builder delegation — the second (and last)
  * `private[sql]` bridge this library needs: Spark's OWN file-source
  * builders (`FileScanBuilder`) receive filters through the INTERNAL
  * `SupportsPushDownCatalystFilters` trait, not the public
  * `SupportsPushDownFilters` — a wrapper outside the `sql` package
  * cannot implement it, so wrapping a parquet builder (to intercept
  * `build()` and add streaming to the produced scan) would silently
  * drop ALL filter and partition pushdown: every filtered query of a
  * named commit-log table would scan the whole snapshot. This class
  * lives in the `sql` package purely to forward that trait; it holds
  * no logic beyond delegation.
  */
class GraftDelegatingScanBuilder(delegate: ScanBuilder, wrap: Scan => Scan)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate match {
      case d: SupportsPushDownRequiredColumns => d.pruneColumns(requiredSchema)
      case _ => ()
    }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate match {
      case d: SupportsPushDownCatalystFilters => d.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters: Array[Predicate] = delegate match {
    case d: SupportsPushDownCatalystFilters => d.pushedFilters
    case _ => Array.empty
  }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    delegate match {
      case d: SupportsPushDownAggregates => d.pushAggregation(aggregation)
      case _ => false
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    delegate match {
      case d: SupportsPushDownAggregates => d.supportCompletePushDown(aggregation)
      case _ => false
    }

  override def build(): Scan = wrap(delegate.build())
}
