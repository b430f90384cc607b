// Bridge hosted inside Catalyst's aggregate package: CollectTopK is
// private[aggregate] in the public Spark jars, and this one-liner is
// the narrowest way to reach it (the alternative — re-implementing
// the same TypedImperativeAggregate — would be a copy with a
// different name).
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

private[sql] object GraftCollectTopK {
  /** `CollectTopK(e, k, reverse = true)`: retains the k SMALLEST
    * values under the child type's natural ordering (bounded priority
    * queue), evals ascending. */
  def ascending(e: Expression, k: Int): CollectTopK =
    CollectTopK(e, k, reverse = true)
}
