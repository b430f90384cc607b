// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the Column/expression bridge helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
import org.apache.spark.sql.classic.ExpressionUtils

/** Bounded top-k aggregation — the fold that replaces the
  * `slice(array_sort(collect_list(x)), 1, k)` spelling wherever a
  * group's candidate count is unbounded (kNN label propagation's
  * per-corpus-row seed matches, VERDICT r10 "What's wrong #1").
  *
  * Built on Spark's own
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK]]
  * (the engine behind `Dataset.summary`'s internal top-k): a
  * TypedImperativeAggregate over a `BoundedPriorityQueue` of size k,
  * so the per-group state is k elements at every point of the
  * partial/merge/final pipeline — the collect_list spelling
  * materializes the WHOLE group (O(|group|) memory) before sorting
  * and slicing. With `reverse = true` the queue retains the k
  * SMALLEST elements under the child type's natural ordering and
  * `eval` emits them ascending — element-for-element identical to the
  * sorted-slice spelling whenever the ordering is total over the
  * group (e.g. a struct carrying a distinct id field; spec-pinned in
  * LabelsSpec). Struct ordering is field-by-field in declaration
  * order, the same rule `array_sort` applies.
  */
object TopKColumns {
  /** The k smallest values of `e` per group, ascending —
    * `slice(array_sort(collect_list(e)), 1, k)` with O(k) state. */
  def collectTopKAsc(e: Column, k: Int): Column = {
    // Fail at plan-build time with the offending parameter: k <= 0
    // would otherwise surface as an opaque PriorityQueue
    // IllegalArgumentException inside an executor task.
    require(k >= 1, s"k must be positive, got $k")
    ExpressionUtils.column(
      GraftCollectTopK.ascending(ExpressionUtils.expression(e), k)
        .toAggregateExpression())
  }
}
