package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model._

/** Per-event, per-(rule,group) stateful window engine on
  * `flatMapGroupsWithState` — the faithful rebuild of the reference's
  * imperative processing model (reference: engine/CEPEngine.java:36-64:
  * one `WindowAssigner` per groupId owning open windows;
  * engine/window/Window.java:40-47: per-event fold into running
  * aggregates; engine/trigger: fire + evict when a window's time
  * passes).
  *
  * The declarative plans in [[graft.cep.CepQuery]] are the scale
  * default — Catalyst optimizes them and the state store handles the
  * windows. This operator exists for the semantics the declarative
  * path cannot express per-event:
  *
  *  - **emission timing**: results emit exactly when the watermark
  *    passes a window's end (append-style finality per window), not on
  *    every update;
  *  - **late-data drop**: an event for an already-closed window is
  *    silently discarded — the reference's observable behavior
  *    (SURVEY §2.3 "late data": re-created windows never re-fire);
  *  - **global windows never emit** here, exactly like the reference
  *    (its AllWindow trigger can never fire, SURVEY §2.4 #5) — use the
  *    declarative path in update mode for correct global results.
  *
  * State per key is bounded: one (sum, count, min, max) quadruple per
  * OPEN window — never the raw events (AVG divides sum by count, so no
  * `originValues` buffer; the reference's unbounded TreeMap leak,
  * SURVEY §2.4 #1, is structurally impossible here). Keys are
  * (rule_id, group values), identical to the reference's
  * `keyBy(groupId)` partitioning.
  */
object StatefulCep {

  /** One fanned-out event: metric × matched rule (the output of the
    * broadcast rule-match join, CepQuery.planAll steps 1-2).
    * `eventTime` carries the watermark into the stateful operator
    * (Spark's event-time-timeout check requires the watermarked column
    * to reach it); `ev_ms` is its millisecond twin for arithmetic. */
  final case class CepEvent(
      rule_id: Int, group_id: String, eventTime: java.sql.Timestamp,
      ev_ms: Long, v: Double,
      window_type: String, w_ms: Long, s_ms: Long,
      agg_type: String, cmp_op: String, limit: Double)

  /** Running aggregate of one open window. `sum` is a BigDecimal of
    * the per-event values rounded to 6 decimal places — exactly
    * [[graft.cep.CepQuery.SumDecimal]]'s cast-then-sum — so SUM/AVG
    * are order-independent and bit-equal to the declarative plans
    * (double accumulation would make threshold comparisons at the
    * limit boundary fold-order-dependent). */
  final case class WindowAgg(
      ws_ms: Long, sum: BigDecimal, cnt: Long, mn: Double, mx: Double)

  /** Window-grid alignment of the stateful engines. [[Epoch]] matches
    * the declarative [[graft.cep.CepQuery.planAll]]/planRule plans;
    * [[FirstEvent]] matches the reference assigners — tumbling windows
    * tile from the group's first event, the sliding grid anchors at
    * `firstEvent − w` (SlidingWindowAssigner.java:26-33), mirroring
    * [[graft.cep.CepQuery.planRuleFirstAligned]]. In a stream, "first"
    * is the first event PROCESSED for the key; an even-earlier late
    * event lands on the same grid extended backward (the reference's
    * backward extension has a negative-modulo bug there — declared
    * deviation, SURVEY §2.4). */
  sealed trait Alignment
  case object Epoch extends Alignment
  case object FirstEvent extends Alignment

  /** Open windows of one (rule, group) key, plus the rule's constant
    * parameters (needed on timeout invocations, which carry no
    * events). `closedBelow` is the eviction frontier: windows ending
    * at or below it have fired and must never be re-created
    * (late-data drop). `anchor` is the window-grid origin: 0 for
    * epoch alignment, the first event's grid origin otherwise.
    *
    * STATE FORMAT v2 (breaking): [[WindowAgg.sum]] went Double →
    * BigDecimal and `anchor` was added. A streaming job restarted from
    * a v1 (pre-change) checkpoint fails state-schema validation —
    * there is no migration path; drop the old checkpoint and replay,
    * or drain the old job before upgrading. Any future field change
    * here is the same operational event: call it out in the release
    * note, never reuse a checkpoint across state shapes. */
  final case class KeyState(
      w_ms: Long, agg_type: String, cmp_op: String, limit: Double,
      windows: List[WindowAgg], closedBelow: Long, anchor: Long)

  /** Emitted result row (same shape as CepQuery.planAll output). */
  final case class CepResult(
      rule_id: Int, group_id: String, window_start: Long, window_end: Long,
      result: Double)

  /** Window starts covering `ev_ms` on the grid with origin `anchor`
    * (0 = epoch alignment — the arithmetic twin of the reference's
    * assigners, see [[Alignment]]). */
  private[graft] def windowStarts(e: CepEvent, anchor: Long = 0L): Seq[Long] =
    e.window_type match {
      case "tumbling" =>
        Seq(anchor + Math.floorDiv(e.ev_ms - anchor, e.w_ms) * e.w_ms)
      case "sliding" =>
        // ceil(w/s) candidate starts, then drop those whose window ends
        // at or before the event: when s does not divide w, events near a
        // slide boundary are covered by floor(w/s) windows, others by
        // floor(w/s)+1 — a fixed floor(w/s) count silently loses rows.
        val n = ((e.w_ms + e.s_ms - 1) / e.s_ms).toInt
        val top = anchor + Math.floorDiv(e.ev_ms - anchor, e.s_ms) * e.s_ms
        (0 until n).map(i => top - i.toLong * e.s_ms).filter(_ > e.ev_ms - e.w_ms)
      case _ => Seq.empty // global: never windows, never fires (see Scaladoc)
    }

  /** Grid origin a new key adopts for its first event. */
  private def anchorFor(align: Alignment, e: CepEvent): Long = align match {
    case Epoch => 0L
    case FirstEvent =>
      if (e.window_type == "sliding") e.ev_ms - e.w_ms else e.ev_ms
  }

  /** `v` rounded the way CepQuery.SumDecimal's cast rounds (HALF_UP to
    * 6 decimal places) before entering the running sum. */
  private def dec6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def fold(w: WindowAgg, v: Double): WindowAgg =
    WindowAgg(w.ws_ms, w.sum + dec6(v), w.cnt + 1,
      math.min(w.mn, v), math.max(w.mx, v))

  private def result(aggType: String, w: WindowAgg): Double = aggType match {
    case "SUM" => w.sum.toDouble
    case "AVG" => w.sum.toDouble / w.cnt
    case "MIN" => w.mn
    case _ => w.mx
  }

  private def passes(cmp: String, r: Double, limit: Double): Boolean = cmp match {
    case ">" => r > limit
    case "<" => r < limit
    case ">=" => r >= limit
    case "<=" => r <= limit
    case "=" => r == limit
    case _ => r != limit
  }

  /** Fold one batch of events into open windows (reference
    * Window.receive, Window.java:40-47). Late events — window end at or
    * below the watermark or the eviction frontier — are silently
    * dropped, the reference's observable late-data behavior
    * (SURVEY §2.3). Rules are upsertable at runtime: the state adopts
    * the latest event's rule parameters, so firing/eviction agrees
    * with window assignment after a rule's width changes. Returns null
    * when no state existed and no event survived.
    *
    * Pure state transition — shared by the flatMapGroupsWithState and
    * transformWithState engines, which must stay semantically twins. */
  private[graft] def foldEvents(st0: KeyState, events: Iterator[CepEvent],
      wm: Long, align: Alignment = Epoch): KeyState = {
    var st = st0
    events.foreach { e =>
      st =
        if (st == null)
          KeyState(e.w_ms, e.agg_type, e.cmp_op, e.limit, Nil, Long.MinValue,
            anchorFor(align, e))
        else
          st.copy(w_ms = e.w_ms, agg_type = e.agg_type,
            cmp_op = e.cmp_op, limit = e.limit)
      windowStarts(e, st.anchor).foreach { ws =>
        val we = ws + e.w_ms
        if (we > st.closedBelow && we > wm) {
          val updated = st.windows.find(_.ws_ms == ws) match {
            case Some(w) => fold(w, e.v) :: st.windows.filterNot(_.ws_ms == ws)
            case None => WindowAgg(ws, dec6(e.v), 1, e.v, e.v) :: st.windows
          }
          st = st.copy(windows = updated)
        }
      }
    }
    st
  }

  /** Fire every window whose end the watermark has passed (reference
    * Trigger.trigger + evict, Trigger.java:14-19), in window order,
    * applying the threshold (HAVING) at fire time. Returns the
    * emissions and the surviving state (open windows only, eviction
    * frontier advanced). Pure — shared by both stateful engines. */
  private[graft] def fireReady(
      key: (Int, String), st: KeyState, wm: Long): (List[CepResult], KeyState) = {
    val (toFire, open) = st.windows.partition(w => w.ws_ms + st.w_ms <= wm)
    val out = for {
      w <- toFire.sortBy(_.ws_ms)
      r = result(st.agg_type, w)
      if passes(st.cmp_op, r, st.limit)
    } yield CepResult(key._1, key._2, w.ws_ms, w.ws_ms + st.w_ms, r)
    val closedBelow =
      if (toFire.isEmpty) st.closedBelow
      else math.max(st.closedBelow, toFire.map(_.ws_ms + st.w_ms).max)
    (out, st.copy(windows = open, closedBelow = closedBelow))
  }

  private[graft] def processKey(align: Alignment)(
      key: (Int, String),
      events: Iterator[CepEvent],
      state: GroupState[KeyState]): Iterator[CepResult] = {
    // 0 = "no watermark yet"; real event times dwarf it, so a plain
    // <=/> comparison does the right thing in every phase.
    val wm = state.getCurrentWatermarkMs()
    val st = foldEvents(state.getOption.orNull, events, wm, align)
    if (st == null) { state.remove(); return Iterator.empty }

    val (out, kept) = fireReady(key, st, wm)

    // Keep only open windows; wake up when the earliest can fire.
    if (kept.windows.isEmpty) {
      state.remove()
    } else {
      state.update(kept)
      state.setTimeoutTimestamp(kept.windows.map(_.ws_ms + kept.w_ms).min)
    }
    out.iterator
  }

  /** Metric frame × rule frame → fanned-out [[CepEvent]] columns: the
    * broadcast rule-match join (CepQuery.planAll steps 1-2 — the
    * hash-joinable pivot-key fan-out, shared via CepQuery.fanOutJoin).
    * The watermark is applied on the retained `eventTime` column AFTER
    * the projection, so the event-time-timeout check finds the
    * watermarked attribute in the stateful operator's input. */
  def fanOut(metricFrame: DataFrame, ruleFrame: DataFrame,
      watermarkDelay: String = "0 seconds"): DataFrame =
    projectEvents(graft.cep.CepQuery.fanOutJoin(metricFrame, ruleFrame),
      watermarkDelay)

  /** [[fanOut]] with driver-resident rule rows (the engine path):
    * identical plan, but pivot statistics come from plain Scala over
    * the rows — building it runs no Spark job (see
    * [[graft.cep.CepQuery.planAllRows]]). */
  def fanOutRows(metricFrame: DataFrame, rows: Seq[graft.cep.Metrics.RuleRow],
      watermarkDelay: String = "0 seconds"): DataFrame =
    projectEvents(graft.cep.CepQuery.fanOutJoinRows(metricFrame, rows),
      watermarkDelay)

  private def projectEvents(joined: DataFrame, watermarkDelay: String): DataFrame =
    joined
      .select(
        col("rule_id"),
        concat_ws("_", col("rule_id").cast("string"),
          graft.functions.map_values_for_keys(col("tags"), col("grouping_key_names")))
          .as("group_id"),
        col("eventTime"),
        unix_millis(col("eventTime")).as("ev_ms"),
        element_at(col("metrics"), col("agg_field")).as("v"),
        col("window_type"),
        (col("window_minutes").cast("long") * 60000L).as("w_ms"),
        (col("window_slide_minute").cast("long") * 60000L).as("s_ms"),
        col("agg_type"), col("cmp_op"), col("limit"))
      .withWatermark("eventTime", watermarkDelay)

  /** Wire the stateful engine over a fanned-out event stream.
    * `fannedOut` must be watermarked on an `eventTime` timestamp column
    * and carry the [[CepEvent]] columns. Output mode: Append.
    * `align` picks the window grid (see [[Alignment]]). */
  def run(fannedOut: DataFrame, align: Alignment = Epoch): Dataset[CepResult] = {
    implicit val eEnc = Encoders.product[CepEvent]
    implicit val sEnc = Encoders.product[KeyState]
    implicit val rEnc = Encoders.product[CepResult]
    implicit val kEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    fannedOut
      .as[CepEvent]
      .groupByKey(e => (e.rule_id, e.group_id))
      .flatMapGroupsWithState[KeyState, CepResult](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(processKey(align))
  }
}
