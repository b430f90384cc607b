package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-6 A/B of the as-of join spelling, as alternating
  * laps in ONE JVM (cross-run absolutes are not comparable on this
  * host — see verify skill notes).
  *
  * "Naive" is the spelling most engines (and most users) reach for
  * first: a range theta-join (`l.key = r.key AND r.ts <= l.ts`) +
  * per-left-row `max_by` aggregation to keep the latest match. Spark
  * plans the theta part as a broadcast-nested-loop or a sort-merge
  * with a residual range filter, and the aggregation re-shuffles the
  * (left × matching right) blow-up — at 100 TB the blow-up term is
  * the killer (every left row pairs with EVERY prior right row of its
  * key before the max_by throws all but one away).
  *
  * "Union" is [[Joins.asofJoin]]: tagged union + one keyed window —
  * |L| + |R| rows through one shuffle regardless of how many prior
  * right rows each left row has.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound6 [laps]" }}}
  */
object AbRound6 {
  def main(args: Array[String]): Unit = {
    val laps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def events: DataFrame = SparkEntry.events(spark, sfDir)

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    def sides(): (DataFrame, DataFrame) = {
      val ev = events
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      (ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        purchases)
    }

    def naive(): DataFrame = {
      val (l, r) = sides()
      l.join(r.select(col("user_id"), col("ts").as("r_ts"),
          col("purchase_value")),
          Seq("user_id"), "left")
        .filter(col("r_ts").isNull || col("r_ts") <= col("ts"))
        .groupBy(col("event_id"))
        .agg(first(col("user_id")).as("user_id"),
          first(col("value")).as("value"),
          max_by(col("purchase_value"), col("r_ts")).as("purchase_value"))
    }

    def union(): DataFrame = {
      val (l, r) = sides()
      Joins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
        Seq("purchase_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("purchase_value"))
    }

    def lapSet(name: String, a: () => DataFrame, b: () => DataFrame): String = {
      time(a); time(b) // warm-up both spellings
      val as = Array.fill(laps)(0.0)
      val bs = Array.fill(laps)(0.0)
      for (i <- 0 until laps) { as(i) = time(a); bs(i) = time(b) }
      f""""$name":{"naive_min":${as.min}%.3f,"union_min":${bs.min}%.3f,""" +
        f""""naive":[${as.map(v => f"$v%.3f").mkString(",")}],""" +
        f""""union":[${bs.map(v => f"$v%.3f").mkString(",")}]}"""
    }

    // Dense right side: EVERY event is a snapshot (right = all
    // events, unique per (user, ts)). The naive theta-join's
    // intermediate is then sum over users of |events_u|²/2 pairs —
    // the quadratic term the union spelling never materializes
    // (|L| + |R| rows through one shuffle either way).
    def denseSides(): (DataFrame, DataFrame) = {
      val ev = events
      val snaps = ev.groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      (ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        snaps)
    }
    def naiveDense(): DataFrame = {
      val (l, r) = denseSides()
      l.join(r.select(col("user_id"), col("ts").as("r_ts"),
          col("purchase_value")),
          Seq("user_id"), "left")
        .filter(col("r_ts").isNull || col("r_ts") <= col("ts"))
        .groupBy(col("event_id"))
        .agg(first(col("user_id")).as("user_id"),
          first(col("value")).as("value"),
          max_by(col("purchase_value"), col("r_ts")).as("purchase_value"))
    }
    def unionDense(): DataFrame = {
      val (l, r) = denseSides()
      Joins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
        Seq("purchase_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("purchase_value"))
    }

    Bench.calibLap(); Bench.calibLap()
    val c0 = Bench.calibLap()
    val asof = lapSet("asof_naive_v_union", naive _, union _)
    val dense = lapSet("asof_dense_naive_v_union", naiveDense _, unionDense _)
    val c1 = Bench.calibLap()
    println(s"""{"metric":"ab_round6",$asof,$dense,"calib_ratio":${math.min(c0, c1) / Bench.CalibRefSec}}""")
    spark.stop()
  }
}
