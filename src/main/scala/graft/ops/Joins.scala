package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators Spark has no built-in for.
  *
  * [[asofJoin]] is the classic event-enrichment shape: each left row
  * picks up the LATEST right row with `right.ts <= left.ts` in the
  * same key group (prices at trade time, feature snapshots at label
  * time, the last rule/config version in force when an event fired).
  */
object Joins {

  /** Numeric view of a ts column for tolerance/bucket arithmetic:
    * timestamps become unix MICROSECONDS, integral types pass through.
    * `tolerance`/`bucketWidth` are therefore micros for timestamp
    * columns and the column's own units otherwise. */
  private def tsNumeric(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"as-of ts column must be timestamp or integral, got $other")
  }

  /** As-of join, composed from a union + one keyed window — the
    * Spark-first spelling of an operator the engine lacks: both
    * inputs are tagged and unioned, the union is shuffled ONCE by the
    * key and sorted by (ts, side) inside each partition, and a
    * running `last(matchedRow, ignoreNulls)` carries the matched
    * right ROW (one struct — all its values atomically, nulls
    * included) onto every left row. No range join, no per-row
    * subquery, no broadcast of either side: cost is one shuffle +
    * one sort over |L| + |R| rows regardless of time-range density —
    * the plan that survives 100 TB of events against 1 TB of
    * snapshots. (A per-key sort is the operator's intrinsic order
    * requirement; pass `bucketWidth` to bound any single task's sort
    * when one key is hot — see below.)
    *
    * `direction` (pandas `merge_asof` surface):
    *  - `"backward"` (default): the single right row with the greatest
    *    `rightTs <= leftTs` — prices at trade time, the config version
    *    in force when an event fired;
    *  - `"forward"`: the single right row with the smallest
    *    `rightTs >= leftTs` — next maintenance window, next quote;
    *  - `"nearest"`: whichever of the two is closer in time (tie goes
    *    backward). Both scans share the same single shuffle — nearest
    *    adds a second window over the already-partitioned data, not a
    *    second exchange.
    *
    * Semantics (DuckDB `ASOF LEFT JOIN` — the gate oracle — agrees):
    * every left row appears exactly once; a right row at exactly
    * `leftTs` counts in every direction (right rows order BEFORE left
    * rows at equal ts); left rows with no match get nulls. Because the
    * carry is one struct per matched row, a matched row whose value
    * column is legitimately NULL yields NULL — another row's value is
    * never substituted in. The right side must be unique per
    * (keys, rightTs) — pre-aggregate it otherwise, or which-row-wins
    * is undefined in any engine.
    *
    * `tolerance` (kdb/pandas `merge_asof` ergonomic): when set, a
    * match only counts if `|leftTs − rightTs| <= tolerance` —
    * otherwise the left row gets nulls instead of silently joining an
    * arbitrarily distant right row. Equivalent to matching
    * closest-then-nulling-far, since any other candidate in the
    * match direction is farther still. Units: micros for timestamp ts
    * columns, the column's units for integral ts.
    *
    * `bucketWidth`: optional hot-key bound. Whether a key is hot
    * enough to need it is a [[Profiling.keyStats]] pre-flight question:
    * `skew_uniform` ≈ 1 → leave unset (per-key sorts are balanced);
    * tens-and-up → set `bucketWidth` so one (key, bucket) holds
    * roughly `n_rows / n_keys` rows of the hottest key (i.e. its span
    * divided by ~`skew_uniform` buckets). Both sides are bucketed on
    * `floor(ts / bucketWidth)`, the window runs per (keys, bucket) —
    * so no task ever sorts more than one bucket of one key — and a
    * tiny per-(key, bucket) "last right row" summary is chained
    * through a second window (rows = distinct buckets, not events) to
    * seed each bucket with the carry from earlier buckets. Results
    * are identical to the unbucketed plan (equivalence spec-pinned).
    * Plan shape (audited): the BIG side is hash-partitioned exactly
    * once — the summary frame joins back in as a broadcast (or, above
    * the broadcast threshold, a shuffle that matches the big side's
    * existing (keys, bucket) partitioning), never re-shuffling the
    * events. The summary subtrees re-derive the union from source by
    * default — for parquet inputs these are column-pruned scans
    * feeding map-side-combined aggregates (scan-heavy, shuffle-light:
    * usually the right 100 TB trade); pass `unionPersist` to
    * materialize the tagged union once instead when the inputs are
    * expensive computed lineages rather than table scans.
    *
    * Output: every left column, plus `valueCols` from the right side.
    * Right value columns must not collide with left column names
    * (alias them before the call). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tolerance: Option[Long] = None,
      bucketWidth: Option[Long] = None,
      direction: String = "backward",
      unionPersist: Option[Persistence] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    require(valueCols.nonEmpty, "asofJoin requires at least one value column")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    bucketWidth.foreach(w =>
      require(w > 0, s"bucketWidth must be positive, got $w"))
    val dir = direction.toLowerCase
    require(Set("backward", "forward", "nearest")(dir),
      s"direction must be backward|forward|nearest, got $direction")
    val needB = dir != "forward"
    val needF = dir != "backward"
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: $collisions — alias them")
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightSchema = right.schema
    val ltsType = left.schema(leftTs).dataType
    val rtsType = rightSchema(rightTs).dataType
    // The matched right row travels as ONE nullable struct ("__asof_r"):
    // non-null on every right row (even when its value fields are
    // null), null on left rows — so last(_, ignoreNulls) carries whole
    // rows, never mixes values across rows, and keeps legitimate NULLs.
    val rStructType = StructType(
      StructField("__rts", rtsType) +:
        valueCols.map(c => StructField(c, rightSchema(c).dataType)))
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__asof_ts"), lit(1).as("__asof_is_left")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructType).as("__asof_r"): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__asof_ts"), lit(0).as("__asof_is_left")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).as("__rts") +: valueCols.map(col): _*)
          .as("__asof_r"): _*)
    val union = taggedLeft.unionByName(taggedRight)
    // Scan order per direction: backward scans ts ascending (carry =
    // latest right at-or-before), forward scans ts DESCENDING (carry =
    // earliest right at-or-after). Right rows order before left rows
    // at equal ts in BOTH scans, so an exact-ts right row counts.
    def ord(desc: Boolean) = Seq(
      if (desc) col("__asof_ts").desc else col("__asof_ts").asc,
      col("__asof_is_left").asc)

    val carried = bucketWidth match {
      case None =>
        def w(desc: Boolean) = Window.partitionBy(keys.map(col): _*)
          .orderBy(ord(desc): _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        // Both carries (when nearest needs both) are windows over the
        // SAME partitioning — one shuffle, two sorts, zero extra
        // exchanges.
        Seq("__asof_cb" -> false, "__asof_cf" -> true)
          .filter { case (c, desc) => if (desc) needF else needB }
          .foldLeft(union) { case (df, (c, desc)) =>
            df.withColumn(c,
              last(col("__asof_r"), ignoreNulls = true).over(w(desc)))
          }
      case Some(bw) =>
        val bucketed0 = union.withColumn("__asof_bkt",
          floor(tsNumeric(col("__asof_ts"), ltsType) / bw).cast(LongType))
        val bucketed = unionPersist.fold(bucketed0)(_.apply(bucketed0))
        val bktKeys = keys :+ "__asof_bkt"
        // Within-bucket carry: the window partition includes the
        // bucket, so a hot key's sort is split across its buckets.
        def localW(desc: Boolean) = Window.partitionBy(bktKeys.map(col): _*)
          .orderBy(ord(desc): _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        // Chain across buckets through a summary frame whose size is
        // (distinct key × bucket), not events: backward seeds each
        // bucket with the LAST right row of earlier buckets, forward
        // with the FIRST right row of later buckets.
        val rightOnly = bucketed.filter(col("__asof_is_left") === 0)
          .groupBy(bktKeys.map(col): _*)
        val bucketEnds = (if (needB)
            Seq(max_by(col("__asof_r"),
              tsNumeric(col("__asof_ts"), rtsType)).as("__bl_b"))
          else Nil) ++ (if (needF)
            Seq(min_by(col("__asof_r"),
              tsNumeric(col("__asof_ts"), rtsType)).as("__bl_f"))
          else Nil)
        val bucketLast = rightOnly.agg(bucketEnds.head, bucketEnds.tail: _*)
        val allBuckets = bucketed.select(bktKeys.map(col): _*).distinct()
        def chainW(desc: Boolean) = Window.partitionBy(keys.map(col): _*)
          .orderBy(if (desc) col("__asof_bkt").desc else col("__asof_bkt").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val incoming0 = allBuckets.join(bucketLast, bktKeys, "left")
        val incoming = Seq(("__bl_b", "__asof_in_b", false),
            ("__bl_f", "__asof_in_f", true))
          .filter { case (_, _, desc) => if (desc) needF else needB }
          .foldLeft(incoming0) { case (df, (src, dst, desc)) =>
            df.withColumn(dst,
              last(col(src), ignoreNulls = true).over(chainW(desc)))
          }
          .select(bktKeys.map(col) ++
            (if (needB) Seq(col("__asof_in_b")) else Nil) ++
            (if (needF) Seq(col("__asof_in_f")) else Nil): _*)
        // The union is already hash-partitioned on (keys, bucket) by
        // localW; this equi-join reuses that partitioning on the big
        // side (only the small summary frame shuffles).
        val withLocal = Seq(("__asof_lb", false), ("__asof_lf", true))
          .filter { case (_, desc) => if (desc) needF else needB }
          .foldLeft(bucketed) { case (df, (c, desc)) =>
            df.withColumn(c,
              last(col("__asof_r"), ignoreNulls = true).over(localW(desc)))
          }
        var joined = withLocal.join(incoming, bktKeys)
        if (needB) joined = joined.withColumn("__asof_cb",
          coalesce(col("__asof_lb"), col("__asof_in_b")))
        if (needF) joined = joined.withColumn("__asof_cf",
          coalesce(col("__asof_lf"), col("__asof_in_f")))
        joined
    }

    def dist(carry: Column): Column =
      abs(tsNumeric(col("__asof_ts"), ltsType) -
        tsNumeric(carry.getField("__rts"), rtsType))
    val chosen = dir match {
      case "backward" => col("__asof_cb")
      case "forward" => col("__asof_cf")
      case "nearest" =>
        val b = col("__asof_cb"); val f = col("__asof_cf")
        // Tie (equal distance) goes backward — the pandas convention.
        when(b.isNull, f).when(f.isNull, b)
          .when(dist(b) <= dist(f), b).otherwise(f)
    }
    val withChoice = carried.withColumn("__asof_carry", chosen)

    // Tolerance: the carried row is the CLOSEST match in the chosen
    // direction, so if it is out of reach every other candidate is
    // farther — nulling it out equals "closest within tolerance".
    val inReach = tolerance match {
      case None => col("__asof_carry").isNotNull
      case Some(t) =>
        col("__asof_carry").isNotNull && dist(col("__asof_carry")) <= t
    }
    withChoice.filter(col("__asof_is_left") === 1)
      .withColumn(leftTs, col("__asof_ts"))
      .select(left.columns.map(col) ++ valueCols.map(c =>
        when(inReach, col("__asof_carry").getField(c)).as(c)): _*)
  }

  /** Interval (range) join: every (left row, right interval) pair in
    * the same key group with `rightStart <= leftTs < rightEnd` —
    * events inside sessions, trades inside halts, labels inside
    * feature-validity windows.
    *
    * Spark-first spelling of the second temporal operator the engine
    * lacks natively: a naive range predicate plans a per-key
    * NESTED-LOOP (quadratic in the hot key); here each right interval
    * is EXPLODED onto the fixed-width time buckets it covers
    * (`sequence(floor(start/w), floor((end−1)/w))`) and each left row
    * carries its single bucket, so the match is a plain equi-join on
    * (keys, bucket) + an exact range filter. Cost: |R| × (avg
    * interval length / bucketWidth + 1) expanded rows through one
    * hash shuffle — pick `bucketWidth` near the typical interval
    * length and expansion is ~2×. No pair is generated across
    * buckets, so there is no quadratic blowup anywhere.
    *
    * A left row's bucket is unique, so each matching (row, interval)
    * pair is emitted exactly once — no dedup pass. Intervals are
    * half-open `[start, end)`; empty intervals (end <= start) match
    * nothing. Ts/start/end must be numeric (cast timestamps with
    * `unix_micros` first); non-key column names must not collide.
    *
    * Open-interval hazard: an interval is expanded into
    * `length/bucketWidth + 1` rows, so a sentinel "still open" end
    * (e.g. `Long.MaxValue`) would try to materialize billions of
    * bucket rows. `maxBucketsPerInterval` guards this with a loud
    * task-side error instead of a silent OOM — cap/close open
    * intervals before joining, or raise `bucketWidth`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightStart: String, rightEnd: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(keys.nonEmpty, "intervalJoin requires at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"non-key columns collide across sides: $collisions — alias them")
    val firstBkt = floor(col(rightStart) / bucketWidth).cast("long")
    val lastBkt = floor((col(rightEnd) - 1) / bucketWidth).cast("long")
    val rx = right
      .filter(col(rightEnd) > col(rightStart)) // empty: matches nothing
      // assert_true returns NULL when the predicate holds and throws
      // with the message otherwise; the coalesce keeps it un-prunable
      // as a filter so every surviving interval is actually checked.
      .filter(coalesce(
        assert_true(lastBkt - firstBkt < maxBucketsPerInterval,
          concat(lit("intervalJoin: one interval expands to "),
            lastBkt - firstBkt + 1,
            lit(s" buckets (> maxBucketsPerInterval=$maxBucketsPerInterval)" +
              " — an open-ended/sentinel interval end? Cap open intervals" +
              " or raise bucketWidth."))).cast("boolean"),
        lit(true)))
      .withColumn("__ij_bucket", explode(sequence(firstBkt, lastBkt)))
    left.withColumn("__ij_bucket",
        floor(col(leftTs) / bucketWidth).cast("long"))
      .join(rx, keys :+ "__ij_bucket")
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) < col(rightEnd))
      .drop("__ij_bucket")
  }

  /** Interval-OVERLAP join: every (left interval, right interval)
    * pair in the same key group whose half-open intervals intersect
    * (`lStart < rEnd && rStart < lEnd`) — sessions × incidents,
    * maintenance windows × SLAs, any two event-window tables.
    *
    * Same bucket-expansion idea as [[intervalJoin]], on BOTH sides: a
    * pair sharing k buckets would be emitted k times, so each pair is
    * kept only in its CANONICAL bucket — the one containing the
    * overlap's start (`greatest(lStart, rStart)`), which both
    * expansions provably cover (the overlap start lies inside both
    * intervals). Exactly-once without a distinct/dedup pass; no
    * cross-bucket pairs, so no quadratic blowup on a hot key.
    * `maxBucketsPerInterval` guards both sides against open-ended
    * sentinel intervals, as in [[intervalJoin]]. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(keys.nonEmpty,
      "intervalOverlapJoin requires at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"non-key columns collide across sides: $collisions — alias them")
    def expanded(df: DataFrame, s: String, e: String): DataFrame = {
      val firstBkt = floor(col(s) / bucketWidth).cast("long")
      val lastBkt = floor((col(e) - 1) / bucketWidth).cast("long")
      df.filter(col(e) > col(s))
        .filter(coalesce(
          assert_true(lastBkt - firstBkt < maxBucketsPerInterval,
            concat(lit("intervalOverlapJoin: one interval expands to "),
              lastBkt - firstBkt + 1,
              lit(s" buckets (> maxBucketsPerInterval=" +
                s"$maxBucketsPerInterval) — an open-ended/sentinel" +
                " interval end? Cap open intervals or raise" +
                " bucketWidth."))).cast("boolean"),
          lit(true)))
        .withColumn("__ij_bucket", explode(sequence(firstBkt, lastBkt)))
    }
    expanded(left, leftStart, leftEnd)
      .join(expanded(right, rightStart, rightEnd), keys :+ "__ij_bucket")
      .filter(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd))
      // Canonical-bucket guard: emit the pair only where the overlap
      // starts — every shared bucket sees the pair, exactly one keeps it.
      .filter(col("__ij_bucket") ===
        floor(greatest(col(leftStart), col(rightStart)) / bucketWidth)
          .cast("long"))
      .drop("__ij_bucket")
  }

}
