package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the storage-side
  * answer to "this join shuffles 100 TB every run".
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted)
  * by the join key lets Spark plan the join with NO shuffle exchange:
  * bucket i of the left table joins bucket i of the right table
  * directly (and pre-sorted buckets skip the sort of a sort-merge
  * join too). The shuffle is paid ONCE at write time instead of on
  * every query — the same trade the reference hard-wires with its
  * `keyBy(groupId)` ownership model, but durable across jobs.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table.
    * `numBuckets` should match downstream parallelism (and both sides
    * of a co-located join must use the same count and keys). */
  def writeBucketed(
      df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket keys. The merge
    * hint pins a sort-merge join (a broadcast join would ignore the
    * bucket layout); the plan is then shuffle-free (verified by spec):
    * scan → sort-merge join within aligned buckets. */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), keys)
}
