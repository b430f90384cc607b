package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}
import graft.streaming.StatefulCep.{CepEvent, CepResult, KeyState}

/** Spark 4 `transformWithState` twin of [[StatefulCep]] — same
  * per-(rule, group) window engine (reference engine/CEPEngine.java:
  * 36-64 processing model), on the current-generation state API:
  *
  *  - state lives in a named, typed [[ValueState]];
  *  - firing is explicitly timer-driven: each key keeps ONE event-time
  *    timer at its earliest open window end; `handleExpiredTimer`
  *    fires and re-arms. Events arriving after the watermark already
  *    passed a window's end fire it inline (same behavior as the
  *    flatMapGroupsWithState engine's fire-on-input).
  *
  * Both engines share the SAME pure state transitions
  * ([[StatefulCep.foldEvents]] / [[StatefulCep.fireReady]]), so
  * emission timing, late-data drop, and decimal-exact aggregation are
  * semantically identical by construction; the parity spec runs one
  * scenario through both and diffs the outputs.
  *
  * Retention note: Spark's native state TTL (`TTLConfig`) is
  * processing-time based and is REJECTED in `TimeMode.EventTime`
  * ([STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL]), so this
  * engine deliberately exposes no TTL knob. It does not need one for
  * boundedness: state is one quadruple per OPEN window, every window's
  * end carries a timer, and `commit` clears a key's state entirely
  * once no window remains open — a group's state cannot outlive the
  * watermark passing its last window. The residual operational case
  * (a permanently stalled watermark) stalls ALL event-time processing,
  * not just state cleanup.
  */
object TransformCep {

  /** One per-key timer at the earliest open window end: timers fire
    * when the EVENT-TIME watermark passes them (TimeMode.EventTime),
    * exactly the old engine's setTimeoutTimestamp contract. */
  private class CepProcessor(align: StatefulCep.Alignment)
      extends StatefulProcessor[(Int, String), CepEvent, CepResult] {

    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState](
        "cepWindows", Encoders.product[KeyState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def currentOrNull: KeyState =
      if (state.exists()) state.get() else null

    /** Persist survivors + re-arm the timer, or clear everything. */
    private def commit(kept: KeyState, oldTimer: Option[Long]): Unit = {
      oldTimer.foreach(getHandle.deleteTimer)
      if (kept == null || kept.windows.isEmpty) {
        state.clear()
      } else {
        state.update(kept)
        getHandle.registerTimer(kept.windows.map(_.ws_ms + kept.w_ms).min)
      }
    }

    private def existingTimer: Option[Long] = {
      val st = currentOrNull
      if (st == null || st.windows.isEmpty) None
      else Some(st.windows.map(_.ws_ms + st.w_ms).min)
    }

    override def handleInputRows(
        key: (Int, String), rows: Iterator[CepEvent],
        tv: TimerValues): Iterator[CepResult] = {
      val wm = tv.getCurrentWatermarkInMs()
      val oldTimer = existingTimer
      val st = StatefulCep.foldEvents(currentOrNull, rows, wm, align)
      if (st == null) return Iterator.empty
      val (out, kept) = StatefulCep.fireReady(key, st, wm)
      commit(kept, oldTimer)
      out.iterator
    }

    override def handleExpiredTimer(
        key: (Int, String), tv: TimerValues,
        timer: ExpiredTimerInfo): Iterator[CepResult] = {
      val st = currentOrNull
      if (st == null) return Iterator.empty
      // The expired timer IS the one we registered; no delete needed.
      val (out, kept) = StatefulCep.fireReady(key, st, tv.getCurrentWatermarkInMs())
      commit(kept, None)
      out.iterator
    }
  }

  /** Wire the transformWithState engine over a fanned-out event stream
    * (same input contract as [[StatefulCep.run]]: watermarked
    * `eventTime` + [[CepEvent]] columns). Output mode: Append. */
  def run(fannedOut: DataFrame,
      align: StatefulCep.Alignment = StatefulCep.Epoch): Dataset[CepResult] = {
    implicit val eEnc = Encoders.product[CepEvent]
    implicit val rEnc = Encoders.product[CepResult]
    implicit val kEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    fannedOut
      .as[CepEvent]
      .groupByKey(e => (e.rule_id, e.group_id))
      .transformWithState(new CepProcessor(align),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
