package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cep.{CepQuery, Metrics}
import graft.model._

/** Engine semantics against the reference's own fixtures:
  * the resources/rules + resources/metrics demo (SURVEY §7.2) and the
  * WindowTest vectors (FIXTURES §A3). */
class CepQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (epochMillis, group, cpu) → engine metric frame. */
  private def metricFrame(rows: Seq[(Long, String, Int)]): DataFrame =
    rows.toDF("ms", "g", "cpu").select(
      timestamp_millis(col("ms")).as("eventTime"),
      map(lit("t_group"), col("g")).as("tags"),
      map(lit("cpu_usage"), col("cpu").cast("double")).as("metrics"))

  // Reference demo fixture (resources/metrics:1-6, resources/rules:1):
  // SUM(cpu_usage) per t_group over 2-minute tumbling windows, emit > 11.
  private val t0 = 1650557501028L
  private val demoEvents = Seq(
    (t0, "business", 9), (t0 + 1000, "work", 1), (t0 + 2000, "business", 2),
    (t0 + 3000, "work", 5), (t0 + 4000, "business", 5), (t0 + 5000, "work", 10))
  private val demoRule = Rule(1, RuleState.Active, WindowType.Tumbling, 2, 0,
    Seq("t_group"), AggType.Sum, "cpu_usage", CmpOp.Gt, BigDecimal(11))

  test("reference demo: SUM per group over 2-min tumbling window, both groups emit 16") {
    val out = CepQuery.planRule(metricFrame(demoEvents), demoRule)
      .select("t_group", "result").as[(String, Double)].collect().toMap
    assert(out == Map("business" -> 16.0, "work" -> 16.0))
  }

  test("threshold filters: > 16 emits nothing, >= 16 emits both") {
    val none = CepQuery.planRule(metricFrame(demoEvents),
      demoRule.copy(limit = BigDecimal(16)))
    assert(none.count() == 0)
    val both = CepQuery.planRule(metricFrame(demoEvents),
      demoRule.copy(limitOperatorType = CmpOp.Ge, limit = BigDecimal(16)))
    assert(both.count() == 2)
  }

  test("keyless rule through planAll: sentinel pivot matches every metric, one global group") {
    // A rule with NO grouping keys has a vacuously-true key-subset
    // predicate (reference isHit over an empty key list): it must
    // match every metric via the sentinel pivot and aggregate them as
    // one group whose group_id is just the rule id. Also exercises a
    // mixed book — the keyed rule must be unaffected.
    val keyless = demoRule.copy(ruleId = 7,
      groupingKeyNames = Seq.empty, limit = BigDecimal(0))
    val out = CepQuery.planAll(metricFrame(demoEvents),
        Metrics.rulesToDF(spark, Seq(demoRule, keyless)))
      .select("rule_id", "group_id", "result")
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set(
      (1, "1_business", 16.0), (1, "1_work", 16.0), (7, "7", 32.0)))
  }

  test("rarest-key pivot: heterogeneous rule books still produce each match exactly once") {
    // Two rules on different single keys + one on both: whatever pivot
    // each rule gets, a metric carrying both tags must fan out to all
    // three rules exactly once.
    val byGroup = demoRule.copy(limit = BigDecimal(-1))
    val byType = demoRule.copy(ruleId = 2, groupingKeyNames = Seq("t_type"),
      limit = BigDecimal(-1))
    val byBoth = demoRule.copy(ruleId = 3,
      groupingKeyNames = Seq("t_group", "t_type"), limit = BigDecimal(-1))
    val frame = Seq((t0, "business", "web", 5), (t0 + 1000, "business", "web", 3))
      .toDF("ms", "g", "ty", "cpu").select(
        timestamp_millis(col("ms")).as("eventTime"),
        map(lit("t_group"), col("g"), lit("t_type"), col("ty")).as("tags"),
        map(lit("cpu_usage"), col("cpu").cast("double")).as("metrics"))
    val out = CepQuery.planAll(frame,
        Metrics.rulesToDF(spark, Seq(byGroup, byType, byBoth)))
      .select("rule_id", "group_id", "result")
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set(
      (1, "1_business", 8.0), (2, "2_web", 8.0), (3, "3_business_web", 8.0)))
  }

  test("window membership is half-open [begin, end): boundary event starts a new window") {
    // Window containing t0 is [1650557400000, 1650557520000); an event at
    // exactly the end boundary must land in the NEXT window (Window.java:66-68).
    val boundary = 1650557520000L
    val out = CepQuery.planRule(
      metricFrame(Seq((boundary - 1, "g", 1), (boundary, "g", 2))),
      demoRule.copy(limitOperatorType = CmpOp.Gt, limit = BigDecimal(0)))
    val byStart = out
      .select(unix_millis(col("window_start")), col("result"))
      .as[(Long, Double)].collect().toMap
    assert(byStart == Map((boundary - 120000L) -> 1.0, boundary -> 2.0))
  }

  test("first-event-aligned tumbling matches TumblingWindowAssignerTest vectors: [1, 240001) then [240001, 480001)") {
    // Reference vectors (TumblingWindowAssignerTest.java:17-59): 4-min
    // window, first event at t=1 → window [1, 240001); event at
    // t=240001 opens [240001, 480001).
    val frame = metricFrame(Seq((1L, "g", 5), (2L, "g", 7), (240001L, "g", 3)))
    val r = Rule(1, RuleState.Active, WindowType.Tumbling, 4, 0,
      Seq("t_group"), AggType.Sum, "cpu_usage", CmpOp.Ge, BigDecimal(0))
    val out = CepQuery.planRuleFirstAligned(frame, r)
      .select(unix_millis(col("window_start")), unix_millis(col("window_end")),
        col("result"))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 240001L, 12.0), (240001L, 480001L, 3.0)))
  }

  test("first-event-aligned sliding: grid anchors at t0 - w (SlidingWindowAssigner semantics)") {
    // w=4min, s=2min, first event at t=1 → grid −239999 + k·120000.
    // The assigner's initial window [−239999, 1) half-open-EXCLUDES the
    // first event; coverage per event derived by hand:
    //   ev 1      → starts {−119999, 1}
    //   ev 120001 → starts {1, 120001}
    //   ev 240001 → starts {120001, 240001}
    val frame = metricFrame(Seq((1L, "g", 5), (120001L, "g", 7), (240001L, "g", 3)))
    val r = Rule(1, RuleState.Active, WindowType.Sliding, 4, 2,
      Seq("t_group"), AggType.Sum, "cpu_usage", CmpOp.Ge, BigDecimal(0))
    val out = CepQuery.planRuleFirstAligned(frame, r)
      .select(unix_millis(col("window_start")), unix_millis(col("window_end")),
        col("result"))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set(
      (-119999L, 120001L, 5.0),
      (1L, 240001L, 12.0),
      (120001L, 360001L, 10.0),
      (240001L, 480001L, 3.0)))
  }

  test("WindowTest vectors: SUM(5,7)=12 and AVG(5,7)=6 (global window)") {
    val frame = metricFrame(Seq((1L, "g", 5), (5L, "g", 7)))
    val sumR = CepQuery.planRule(frame,
      Rule(1, RuleState.Active, WindowType.Global, 0, 0, Seq("t_group"),
        AggType.Sum, "cpu_usage", CmpOp.Gt, BigDecimal(0)))
      .select("result").as[Double].head()
    assert(sumR == 12.0)
    val avgR = CepQuery.planRule(frame,
      Rule(1, RuleState.Active, WindowType.Global, 0, 0, Seq("t_group"),
        AggType.Avg, "cpu_usage", CmpOp.Gt, BigDecimal(0)))
      .select("result").as[Double].head()
    assert(avgR == 6.0)
  }

  test("MIN/MAX handle all-negative windows correctly (intended semantics, not the reference's MAX-identity-0 bug)") {
    val frame = metricFrame(Seq((1L, "g", -5), (5L, "g", -7)))
    def agg(a: AggType): Double = CepQuery.planRule(frame,
      Rule(1, RuleState.Active, WindowType.Global, 0, 0, Seq("t_group"),
        a, "cpu_usage", CmpOp.Lt, BigDecimal(0))).select("result").as[Double].head()
    assert(agg(AggType.Max) == -5.0) // reference bug would return 0
    assert(agg(AggType.Min) == -7.0)
  }

  test("PAUSE and DELETE rules match nothing; sliding fan-out covers W/S windows") {
    val frame = metricFrame(demoEvents)
    val paused = CepQuery.planRule(frame, demoRule.copy(ruleState = RuleState.Pause))
    assert(paused.count() == 0)

    val sliding = CepQuery.planRule(frame,
      demoRule.copy(windowType = WindowType.Sliding, windowMinutes = 4,
        windowSlideMinute = 1, limitOperatorType = CmpOp.Gt, limit = BigDecimal(0)))
    // Each event covers 4 windows; all 6 events share the same 1-min slide
    // bucket, so the group sees exactly 4 distinct windows.
    assert(sliding.select("window_start").distinct().count() == 4)
  }

  test("non-divisible sliding (w % s != 0): planAll arithmetic == planRule's built-in window(w,s)") {
    // 3-min window, 2-min slide: events alternate between 1 and 2
    // covering windows; the two independent spellings must agree row
    // for row (Spark's window() is the semantic authority here).
    val frame = metricFrame(demoEvents)
    val r = demoRule.copy(windowType = WindowType.Sliding, windowMinutes = 3,
      windowSlideMinute = 2, limitOperatorType = CmpOp.Gt, limit = BigDecimal(0))
    def rows(df: DataFrame) = df
      .select(unix_millis(col("window_start")), unix_millis(col("window_end")),
        col("result"))
      .as[(Long, Long, Double)].collect().toSet
    val fromBuiltin = rows(CepQuery.planRule(frame, r))
    val fromArith = rows(CepQuery.planAll(frame, Metrics.rulesToDF(spark, Seq(r))))
    assert(fromBuiltin.nonEmpty && fromArith == fromBuiltin)
  }

  test("planAll one-pass == per-rule plans, PAUSE rule contributes nothing") {
    val frame = metricFrame(demoEvents)
    val rules = Seq(
      demoRule,
      demoRule.copy(ruleId = 2, aggregatorFunctionType = AggType.Avg,
        limitOperatorType = CmpOp.Gt, limit = BigDecimal(0)),
      demoRule.copy(ruleId = 3, ruleState = RuleState.Pause))
    val out = CepQuery.planAll(frame, Metrics.rulesToDF(spark, rules))
      .select("rule_id", "group_id", "result")
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set(
      (1, "1_business", 16.0), (1, "1_work", 16.0),
      (2, "2_business", 16.0 / 3), (2, "2_work", 16.0 / 3)))
  }

  test("planAllRows (driver-resident rules) == planAll, incl. keyless + paused") {
    val frame = metricFrame(demoEvents)
    val rules = Seq(
      demoRule,
      demoRule.copy(ruleId = 2, groupingKeyNames = Seq.empty,
        limit = BigDecimal(0)),
      demoRule.copy(ruleId = 3, ruleState = RuleState.Pause))
    def rows(df: DataFrame) = df
      .select("rule_id", "group_id", "result")
      .as[(Int, String, Double)].collect().toSet
    val fromDF = rows(CepQuery.planAll(frame, Metrics.rulesToDF(spark, rules)))
    val fromRows = rows(CepQuery.planAllRows(frame, rules.map(Metrics.toRow)))
    assert(fromRows.nonEmpty && fromRows == fromDF)
  }

  test("engine plan construction triggers no Spark job (rule stats are driver-resident)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val frame = metricFrame(demoEvents)
    val rows = Seq(demoRule,
      demoRule.copy(ruleId = 2, groupingKeyNames = Seq.empty))
      .map(Metrics.toRow)
    spark.sparkContext.addSparkListener(listener)
    try {
      // Build + physically plan (but do not execute) both engine-path
      // plans: with the pivot statistics driver-resident, neither may
      // submit a Spark job — the old collect-based path ran two jobs
      // per plan build, which lands on the control hot path once rules
      // replan per micro-batch.
      CepQuery.planAllRows(frame, rows).queryExecution.executedPlan
      graft.streaming.StatefulCep.fanOutRows(frame, rows)
        .queryExecution.executedPlan
      Thread.sleep(1000) // let the async listener bus drain
      assert(jobs.get() == 0,
        s"plan construction submitted ${jobs.get()} Spark job(s)")
    } finally {
      spark.sparkContext.removeSparkListener(listener); ()
    }
  }

  test("planAllFirstAligned == per-rule planRuleFirstAligned (+ global passthrough)") {
    val frame = metricFrame(demoEvents)
    val tumb = demoRule.copy(ruleId = 1, limitOperatorType = CmpOp.Gt, limit = BigDecimal(-99))
    val slid = Rule(2, RuleState.Active, WindowType.Sliding, 3, 2, Seq("t_group"),
      AggType.Avg, "cpu_usage", CmpOp.Gt, BigDecimal(-99))
    val glob = Rule(3, RuleState.Active, WindowType.Global, 0, 0, Seq("t_group"),
      AggType.Max, "cpu_usage", CmpOp.Gt, BigDecimal(-99))
    val fromAll = CepQuery.planAllFirstAligned(frame,
      Metrics.rulesToDF(spark, Seq(tumb, slid, glob)))
      .select(col("rule_id"), col("group_id"),
        unix_millis(col("window_start")), col("result"))
      .as[(Int, String, Option[Long], Double)].collect().toSet
    val fromSingles = (Seq(tumb, slid).flatMap { r =>
      CepQuery.planRuleFirstAligned(frame, r)
        .select(col("t_group"), unix_millis(col("window_start")), col("result"))
        .as[(String, Option[Long], Double)].collect()
        .map { case (g, ws, res) => (r.ruleId, s"${r.ruleId}_$g", ws, res) }
    } ++ CepQuery.planRule(frame, glob)
      .select(col("t_group"), col("result")).as[(String, Double)].collect()
      .map { case (g, res) => (glob.ruleId, s"${glob.ruleId}_$g", None, res) }).toSet
    assert(fromAll.nonEmpty && fromAll == fromSingles)
  }

  test("randomized battery: planAll one-pass == per-rule planRule across the rule space") {
    // The two compilation modes are independent implementations
    // (built-in window() vs native arithmetic; per-rule static filters
    // vs broadcast fan-out + CASE dispatch). A seeded battery across
    // {tumbling, sliding (divisible + not), global} × {SUM,AVG,MIN,MAX}
    // × all six comparators must agree row for row.
    val rnd = new scala.util.Random(7)
    val frame = metricFrame((1 to 60).map { _ =>
      (t0 + rnd.nextInt(600000).toLong,
        if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(100) - 20)
    })
    val wts = Seq(WindowType.Tumbling, WindowType.Sliding, WindowType.Global)
    val aggs = Seq(AggType.Sum, AggType.Avg, AggType.Min, AggType.Max)
    val ops = Seq(CmpOp.Gt, CmpOp.Lt, CmpOp.Ge, CmpOp.Le, CmpOp.Eq, CmpOp.Ne)
    val rules = (1 to 12).map { id =>
      val wt = wts(rnd.nextInt(wts.size))
      val w = 1 + rnd.nextInt(10)
      val s = if (wt == WindowType.Sliding) 1 + rnd.nextInt(w) else 0
      Rule(id, RuleState.Active, wt, if (wt == WindowType.Global) 0 else w, s,
        Seq("t_group"), aggs(rnd.nextInt(aggs.size)), "cpu_usage",
        ops(rnd.nextInt(ops.size)), BigDecimal(rnd.nextInt(60) - 10))
    }
    val fromAll = CepQuery.planAll(frame, Metrics.rulesToDF(spark, rules))
      .select(col("rule_id"), col("group_id"),
        unix_millis(col("window_start")), col("result"))
      .as[(Int, String, Option[Long], Double)].collect().toSet
    val fromSingles = rules.flatMap { r =>
      val single = CepQuery.planRule(frame, r)
      val rows = r.windowType match {
        case WindowType.Global =>
          single.select(col("t_group"), lit(null).cast("long"), col("result"))
        case _ =>
          single.select(col("t_group"), unix_millis(col("window_start")), col("result"))
      }
      rows.as[(String, Option[Long], Double)].collect()
        .map { case (g, ws, res) => (r.ruleId, s"${r.ruleId}_$g", ws, res) }
    }.toSet
    assert(fromAll.nonEmpty && fromAll == fromSingles)
  }

  test("randomized fan-out: pivot hash join == brute-force subset predicate over random books") {
    // The pivot machinery (rarest-key choice, sentinel, intersect
    // pruning) must be invisible: for ANY tag map and ANY rule key
    // set, a (metric, rule) pair joins iff the rule is ACTIVE and its
    // keys are a subset of the metric's tags. Seeded random books
    // exercise keyless rules, paused rules, shared/unshared pivot
    // keys, and metrics missing pivot values entirely.
    val rnd = new scala.util.Random(11)
    val keyPool = (0 until 6).map(i => s"k$i")
    val metrics = (1 to 40).map { id =>
      val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(4))
      (id.toLong, keys.map(k => k -> s"v${rnd.nextInt(3)}").toMap)
    }
    val rules = (1 to 12).map { id =>
      Rule(id, if (rnd.nextInt(4) == 0) RuleState.Pause else RuleState.Active,
        WindowType.Tumbling, 2, 0,
        rnd.shuffle(keyPool).take(rnd.nextInt(4)), // size 0..3, incl. keyless
        AggType.Sum, "cpu_usage", CmpOp.Gt, BigDecimal(0))
    }
    val expected = (for {
      (mid, tags) <- metrics
      r <- rules
      if r.ruleState == RuleState.Active && r.groupingKeyNames.forall(tags.contains)
    } yield (mid, r.ruleId)).toSet
    val metricDF = metrics.toDF("mid", "kv").select(
      col("mid"),
      timestamp_millis(lit(t0)).as("eventTime"),
      col("kv").as("tags"),
      map(lit("cpu_usage"), lit(1.0)).as("metrics"))
    val got = CepQuery.fanOutJoin(metricDF, Metrics.rulesToDF(spark, rules))
      .select(col("mid"), col("rule_id")).as[(Long, Int)].collect()
    assert(got.length == got.toSet.size, "a (metric, rule) pair fanned out twice")
    assert(got.toSet == expected)
  }

  test("rule match requires ALL grouping keys present in tags (fan-out join predicate)") {
    val frame = metricFrame(demoEvents) // tags: only t_group
    val needsMissingTag = demoRule.copy(groupingKeyNames = Seq("t_group", "t_host"))
    assert(CepQuery.planRule(frame, needsMissingTag).count() == 0)
    val rules = Metrics.rulesToDF(spark, Seq(demoRule, needsMissingTag.copy(ruleId = 9)))
    val all = CepQuery.planAll(frame, rules)
    assert(all.select("rule_id").distinct().as[Int].collect().toSet == Set(1))
  }
}
