package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Keyed event-time window operators: gap sessionization and
  * trailing (rolling) range aggregates — the two window shapes every
  * event/feature pipeline reaches for that are one `Window` spec in
  * Spark but easy to get subtly wrong (half-open bounds, gap
  * inclusivity, frame alignment). Both are single-shuffle plans: one
  * hash partition on the key, one per-key sort — the per-key sort is
  * the operator's intrinsic order requirement (pre-shard hot keys by
  * time range as in [[Joins.asofJoin]]'s bucketing if one key holds a
  * task-breaking share of events).
  */
object Windows {

  /** Gap-based sessionization: events of one key belong to the same
    * session while consecutive gaps are <= `gap` (same time units as
    * `ts`). A gap EXACTLY equal to `gap` stays in-session — this is
    * Spark's own `session_window` convention (a new event merges
    * while `ts <= previous session end`, and the end is
    * `last + gap`), pinned by the randomized sessionize≡sessionAgg
    * law, so these batch labels agree session-for-session with
    * [[sessionAgg]] and with a streaming deployment of the same
    * logic. Adds `session_seq` (0-based per key, in time order —
    * deterministic given unique (key, ts)).
    *
    * The spelling is the standard two-window composition: a boundary
    * flag per event (`ts - lag(ts) > gap`), then a running sum of
    * boundaries — both over the SAME (key, ts-order) window spec, so
    * Catalyst plans ONE exchange + ONE sort and evaluates both frames
    * in a single WindowExec pass. Ties on ts are broken by `tieBreak`
    * (pass a unique id) so re-runs sessionize identically. */
  def sessionize(df: DataFrame, keys: Seq[String], ts: String,
      gap: Long, tieBreak: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "sessionize requires at least one key column")
    require(gap > 0, s"gap must be positive, got $gap")
    val ord: Seq[Column] = col(ts).asc +: tieBreak.map(col(_).asc).toSeq
    val w = W.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val boundary = when(
      col(ts) - lag(col(ts), 1).over(w) > gap, 1L).otherwise(0L)
    df.withColumn("session_seq", sum(boundary).over(
        w.rowsBetween(W.unboundedPreceding, 0)))
  }

  /** Per-session aggregates via Spark's native `session_window` — the
    * operator's streaming-ready face: the SAME call works on a batch
    * frame (gate-oracled) and on a `readStream` frame (with a
    * watermark, append mode — sessions emit when the watermark passes
    * their end; e2e spec-pinned). Output: the key columns,
    * `session_start` (first event), `session_end` (last event + gap),
    * and one column per aggregate.
    *
    * Session semantics are Spark's: an event extends a session while
    * `ts <= last + gap` (gap-equal MERGES — verified against the
    * engine by the randomized sessionize≡sessionAgg law);
    * [[sessionize]] deliberately matches, so batch labels and session
    * aggregates agree session-for-session. `ts` must be a TIMESTAMP
    * column here (session_window's contract); `gap` is a duration
    * string like "30 minutes". */
  def sessionAgg(df: DataFrame, keys: Seq[String], ts: String,
      gap: String, aggs: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "sessionAgg requires at least one key column")
    require(aggs.nonEmpty, "sessionAgg requires at least one aggregate")
    df.groupBy(session_window(col(ts), gap) +: keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .select(keys.map(col) ++
        Seq(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end")) ++
        aggs.map { case (n, _) => col(n) }: _*)
  }

  /** Trailing range aggregate: for every event, aggregate `value`
    * over the SAME KEY's events in the half-open trailing window
    * `(ts - range, ts]` — "user's last-hour purchase total at each
    * click", the classic point-in-time feature. Adds one column per
    * aggregate in `aggs` (name -> aggregator of the value column).
    *
    * Spark's `rangeBetween` frame is inclusive on both ends, so the
    * trailing bound uses `-(range - 1)` to get the half-open
    * `(ts - range, ts]` convention (an event exactly `range` old has
    * aged out). Events sharing a timestamp share a frame (RANGE
    * semantics — all peers included); the aggregate is therefore
    * well-defined without a tie-break. One shuffle, one sort, all
    * aggregates in one WindowExec pass. `ts` must be numeric (cast
    * timestamps with `unix_micros` first; `range` is then micros).
    *
    * Each agg function must return a BARE aggregate expression
    * (`sum(...)`, `count(...)`) — the window attaches to it directly;
    * wrapping it (e.g. an outer cast) breaks the OVER attachment.
    * Post-process the output column in a later select instead. */
  def trailingAgg(df: DataFrame, keys: Seq[String], ts: String,
      range: Long, aggs: Seq[(String, Column => Column)],
      value: String): DataFrame = {
    require(keys.nonEmpty, "trailingAgg requires at least one key column")
    require(range > 0, s"range must be positive, got $range")
    require(aggs.nonEmpty, "trailingAgg requires at least one aggregate")
    val w = W.partitionBy(keys.map(col): _*).orderBy(col(ts).asc)
      .rangeBetween(-(range - 1), 0)
    aggs.foldLeft(df) { case (acc, (name, f)) =>
      acc.withColumn(name, f(col(value)).over(w))
    }
  }
}
