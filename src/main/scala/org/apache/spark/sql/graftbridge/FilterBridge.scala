package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Bridge into the `protected[sql]` Catalyst→`sources.Filter`
  * translation — the same conversion every DSv2 pushdown path runs.
  * `CALL graftlog.compact_where` compiles its SQL condition through
  * it so the maintenance verb's partition-scope test speaks EXACTLY
  * the filter language the scan's partition pruning consumes;
  * re-implementing the translation library-side would be the drift
  * this repo's shared-seam rule exists to prevent. Package-cheat,
  * same posture as [[ColumnBridge]]. */
object FilterBridge {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = false)
}
