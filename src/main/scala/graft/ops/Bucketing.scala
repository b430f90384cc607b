package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Salted equi-join for skewed keys — the manual fallback when AQE's
    * skew-join split cannot apply (e.g. the skewed side feeds a
    * stateful operator, or partitions are skewed inside one key).
    *
    * The LEFT (large, skewed) side gets a uniform random salt in
    * [0, salt); the RIGHT side is replicated `salt` times with every
    * salt value, so `key == key && salt == salt` splits each hot key's
    * rows across `salt` reducers while keeping exactly the inner-join
    * semantics (each left row meets each matching right row exactly
    * once — under the one replica carrying its salt). Replication
    * multiplies the right side, so use it dimension-side-small,
    * salt ≈ the skew factor. Results are identical to the plain join
    * (spec-verified); row ORDER is not, as with any shuffle.
    *
    * Picking `salt`: run the [[Profiling.keyStats]] pre-flight on the
    * left side's join key first. `skew_uniform` ≈ 1 means don't salt
    * at all (the plain hash join balances); above ~10 the hot key
    * strands a reducer and `salt = min(ceil(skew_uniform), cluster
    * parallelism)` spreads it — the decision is spec-pinned in
    * OpsSpec ("profiling drives the skew knobs"). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Working-column name must not collide with either input's schema
    // (a fixed "_salt" would silently clobber — and then drop — a user
    // column of that name).
    val taken = (left.columns ++ right.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"_graft_salt_$i")
      .find(!taken(_)).get
    val saltedLeft = left.withColumn(saltCol,
      (rand(seed = 42) * salt).cast("int"))
    val replicatedRight = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedRight, Seq(key, saltCol)).drop(saltCol)
  }
}
