package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep.{CepQuery, Metrics}
import graft.model._
import graft.parse.Parsers

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/query from SURVEY.md §2's
  * inventory (or a north-star LLM-pipeline operator), and every entry in
  * [[oracleSql]] is the equivalent DuckDB SQL over the same parquet
  * tables. Column names and value arithmetic are aligned so the
  * driver's sorted-column hash compare matches exactly: sums are done
  * in DECIMAL(38,6) (order-independent, exact) on both sides and cast
  * to DOUBLE at the end; MIN/MAX on doubles are exact; timestamps are
  * epoch-millis-aligned on both sides.
  */
object SparkEntry {

  /** The testdata `events.parquet` stores `ts` as TIMESTAMP(NANOS),
    * which Spark only reads via the nanosAsLong legacy knob (as a
    * nanosecond LONG). Set it at load time — works under any session,
    * including the driver's — and convert to a microsecond timestamp
    * with exact integer division (never `/1000` through a double: a
    * 1.7e18 nanos value exceeds 2^53 and would lose precision). */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def metricsFrame(spark: SparkSession, dir: String): DataFrame =
    Metrics.eventsAsMetrics(events(spark, dir))

  // ---------------------------------------------------------------------------
  // CEP core: the reference's single query shape (SURVEY §2.2), one static
  // plan per rule (CepQuery.planRule), covering {SUM,AVG,MIN,MAX} ×
  // {tumbling,sliding,global} × all six comparators.
  // ---------------------------------------------------------------------------

  private def rule(
      id: Int, wt: WindowType, w: Int, s: Int, keys: Seq[String],
      agg: AggType, op: CmpOp, lim: Double): Rule =
    Rule(id, RuleState.Active, wt, w, s, keys, agg, "value", op, BigDecimal(lim))

  private val cepStaticRules: Map[String, Rule] = Map(
    "cep_sum_tumbling_gt" ->
      rule(1, WindowType.Tumbling, 360, 0, Seq("t_type"), AggType.Sum, CmpOp.Gt, 800.0),
    "cep_avg_tumbling_lt" ->
      rule(2, WindowType.Tumbling, 720, 0, Seq("t_type"), AggType.Avg, CmpOp.Lt, 48.0),
    "cep_max_tumbling_ge" ->
      rule(3, WindowType.Tumbling, 1440, 0, Seq("t_type"), AggType.Max, CmpOp.Ge, 225.0),
    "cep_min_tumbling_le" ->
      rule(4, WindowType.Tumbling, 1440, 0, Seq("t_type", "t_user"), AggType.Min, CmpOp.Le, 10.0),
    "cep_sum_sliding_gt" ->
      rule(5, WindowType.Sliding, 120, 30, Seq("t_type"), AggType.Sum, CmpOp.Gt, 250.0),
    "cep_max_sliding_lt" ->
      rule(6, WindowType.Sliding, 360, 120, Seq("t_type"), AggType.Max, CmpOp.Lt, 300.0),
    "cep_avg_global_ne" ->
      rule(7, WindowType.Global, 0, 0, Seq("t_type"), AggType.Avg, CmpOp.Ne, 0.0),
    "cep_min_global_eq" ->
      rule(8, WindowType.Global, 0, 0, Seq("t_type"), AggType.Min, CmpOp.Eq, 0.01))

  /** DuckDB oracle for one static rule (mirrors CepQuery.planRule). */
  private def staticRuleOracle(r: Rule): String = {
    val keyExprs = r.groupingKeyNames.map {
      case "t_type" => "event_type AS t_type"
      case "t_user" => "CAST(user_id AS VARCHAR) AS t_user"
      case k => sys.error(s"no oracle mapping for tag $k")
    }
    val aggExpr = r.aggregatorFunctionType match {
      case AggType.Sum => "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
      case AggType.Avg => "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/COUNT(value)"
      case AggType.Min => "MIN(value)"
      case AggType.Max => "MAX(value)"
    }
    val having = s"HAVING result ${r.limitOperatorType.symbol} ${r.limit}"
    r.windowType match {
      case WindowType.Global =>
        s"""SELECT ${keyExprs.mkString(", ")}, $aggExpr AS result
           |FROM events GROUP BY ${(1 to keyExprs.size).mkString(", ")} $having""".stripMargin
      case WindowType.Tumbling =>
        val w = r.windowMillis
        s"""SELECT ${keyExprs.mkString(", ")},
           |make_timestamp((epoch_ms(ts)//$w)*$w*1000) AS window_start,
           |make_timestamp(((epoch_ms(ts)//$w)+1)*$w*1000) AS window_end,
           |$aggExpr AS result
           |FROM events GROUP BY ${(1 to keyExprs.size + 2).mkString(", ")} $having""".stripMargin
      case WindowType.Sliding =>
        val w = r.windowMillis; val s = r.slideMillis; val n = w / s - 1
        s"""SELECT ${keyExprs.mkString(", ")},
           |make_timestamp(((epoch_ms(ts)//$s)-i)*$s*1000) AS window_start,
           |make_timestamp((((epoch_ms(ts)//$s)-i)*$s+$w)*1000) AS window_end,
           |$aggExpr AS result
           |FROM events, generate_series(0, $n) g(i)
           |GROUP BY ${(1 to keyExprs.size + 2).mkString(", ")} $having""".stripMargin
    }
  }

  // ---------------------------------------------------------------------------
  // Flagship: N dynamic rules in ONE pass (CepQuery.planAll) — broadcast
  // rule fan-out + arithmetic windows + CASE-dispatched agg/comparator.
  // Thresholds chosen to emit rows at sf0.001 (driver smoke) and sf0.01.
  // ---------------------------------------------------------------------------

  private val flagshipRules: Seq[Rule] = Seq(
    Rule(1, RuleState.Active, WindowType.Tumbling, 1440, 0, Seq("t_type"),
      AggType.Sum, "value", CmpOp.Gt, BigDecimal(100.0)),
    Rule(2, RuleState.Active, WindowType.Sliding, 1440, 360, Seq("t_type"),
      AggType.Avg, "value", CmpOp.Le, BigDecimal(60.0)),
    Rule(3, RuleState.Active, WindowType.Global, 0, 0, Seq("t_user"),
      AggType.Max, "value", CmpOp.Ge, BigDecimal(200.0)),
    Rule(4, RuleState.Pause, WindowType.Tumbling, 60, 0, Seq("t_type"),
      AggType.Sum, "value", CmpOp.Gt, BigDecimal(0.0)), // PAUSE: must not match
    Rule(5, RuleState.Active, WindowType.Tumbling, 1440, 0, Seq("t_type", "t_user"),
      AggType.Min, "value", CmpOp.Lt, BigDecimal(5.0)))

  private def multiRule(spark: SparkSession, dir: String): DataFrame =
    CepQuery.planAll(metricsFrame(spark, dir),
      Metrics.rulesToDF(spark, flagshipRules))

  private val multiRuleOracle: String = {
    val d = 86400000L // 1440 min
    val s6 = 21600000L // 360 min
    s"""WITH e AS (SELECT *, epoch_ms(ts) AS ms FROM events)
       |SELECT 1 AS rule_id, concat_ws('_', '1', event_type) AS group_id,
       |  make_timestamp((ms//$d)*$d*1000) AS window_start,
       |  make_timestamp(((ms//$d)+1)*$d*1000) AS window_end,
       |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS result
       |FROM e GROUP BY 2,3,4 HAVING result > 100.0
       |UNION ALL
       |SELECT 2, concat_ws('_', '2', event_type),
       |  make_timestamp(((ms//$s6)-i)*$s6*1000),
       |  make_timestamp((((ms//$s6)-i)*$s6+$d)*1000),
       |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/COUNT(value) AS result
       |FROM e, generate_series(0,3) g(i) GROUP BY 2,3,4 HAVING result <= 60.0
       |UNION ALL
       |SELECT 3, concat_ws('_', '3', CAST(user_id AS VARCHAR)),
       |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), MAX(value) AS result
       |FROM e GROUP BY 2 HAVING result >= 200.0
       |UNION ALL
       |SELECT 5, concat_ws('_', '5', event_type, CAST(user_id AS VARCHAR)),
       |  make_timestamp((ms//$d)*$d*1000),
       |  make_timestamp(((ms//$d)+1)*$d*1000),
       |  MIN(value) AS result
       |FROM e GROUP BY 2,3,4 HAVING result < 5.0""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Parsing operators (reference O2/O3/O5): JSON-line metric parse with
  // tag/measure key routing; lenient rule parse; rule-stream upsert
  // compaction (latest state per ruleId, DELETE drops the rule).
  // ---------------------------------------------------------------------------

  /** Round-trip events through the reference's JSON metric wire format:
    * serialize each event as a JSON line (integer measures, per the
    * reference's Integer.parseInt ingest), parse with the key-routing
    * parser, and flatten back to columns. */
  private def parseMetricQuery(spark: SparkSession, dir: String): DataFrame = {
    val lines = events(spark, dir).select(
      to_json(struct(
        unix_millis(col("ts")).as("eventTime"),
        col("event_type").as("t_type"),
        (col("user_id") * 10 + col("event_id") % 7).as("cpu"),
        col("event_id").as("seq"))).as("line"))
    Parsers.parseMetrics(lines)
      .select(
        element_at(col("metrics"), "seq").cast("long").as("seq"),
        unix_millis(col("eventTime")).as("t_ms"),
        element_at(col("tags"), "t_type").as("t_type"),
        element_at(col("metrics"), "cpu").cast("long").as("cpu"))
  }

  private val parseMetricOracle: String =
    """SELECT event_id AS seq, epoch_ms(ts) AS t_ms, event_type AS t_type,
      |user_id*10 + event_id%7 AS cpu FROM events""".stripMargin

  /** Lenient rule-JSON parsing: array vs bare-string groupingKeyNames,
    * case-insensitive field names, word vs symbol comparators, unknown
    * window type → global, invalid lines dropped. */
  private val ruleJsonLines = Seq(
    """{"ruleId":1,"ruleState":"ACTIVE","windowType":"tumbling","windowMinutes":2,"windowSlideMinute":1,"groupingKeyNames":["t_group"],"aggregatorFunctionType":"SUM","aggregateFieldName":"cpu_usage","limitOperatorType":"GREATER","limit":11}""",
    """{"ruleId":2,"ruleState":"ACTIVE","windowType":"sliding","windowMinutes":10,"windowSlideMinute":5,"groupingKeyNames":"t_host","aggregatorFunctionType":"AVG","aggregateFieldName":"mem","LimitOperatorType":">=","limit":0.5}""",
    """{"ruleId":3,"ruleState":"PAUSE","windowType":"session","windowMinutes":0,"windowSlideMinute":0,"groupingKeyNames":["t_a","t_b"],"aggregatorFunctionType":"MIN","aggregateFieldName":"lat","limitOperatorType":"LESS_EQUAL","limit":99}""",
    """{"ruleId":4,"ruleState":"DELETE","windowType":"tumbling","windowMinutes":1,"windowSlideMinute":0,"groupingKeyNames":["t_x"],"aggregatorFunctionType":"MAX","aggregateFieldName":"v","limitOperatorType":"!=","limit":-1}""",
    """not json at all""",
    """{"ruleState":"ACTIVE"}""")

  private def parseRuleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Parsers.parseRules(ruleJsonLines.toDF("line"))
      .select(col("rule_id"), col("rule_state"), col("window_type"),
        col("window_minutes"), col("window_slide_minute"),
        array_join(col("grouping_key_names"), ",").as("group_keys"),
        col("agg_type"), col("agg_field"), col("cmp_op"), col("limit"))
  }

  private val parseRuleOracle: String =
    """SELECT * FROM (VALUES
      |(1,'ACTIVE','tumbling',2,1,'t_group','SUM','cpu_usage','>',11.0),
      |(2,'ACTIVE','sliding',10,5,'t_host','AVG','mem','>=',0.5),
      |(3,'PAUSE','global',0,0,'t_a,t_b','MIN','lat','<=',99.0),
      |(4,'DELETE','tumbling',1,0,'t_x','MAX','v','!=',-1.0)
      |) AS t(rule_id, rule_state, window_type, window_minutes,
      |       window_slide_minute, group_keys, agg_type, agg_field, cmp_op, "limit")""".stripMargin

  /** Rule-stream upsert compaction (reference O5, PartitionEngine.java:54-63):
    * latest state per ruleId wins; DELETE removes the rule. */
  private val ruleChangeLog = Seq(
    (1L, 1, "ACTIVE", 10.0), (2L, 2, "ACTIVE", 20.0), (3L, 1, "PAUSE", 10.0),
    (4L, 3, "ACTIVE", 5.0), (5L, 2, "DELETE", 0.0), (6L, 4, "ACTIVE", 7.0),
    (7L, 4, "DELETE", 0.0), (8L, 4, "ACTIVE", 9.0))

  private def ruleUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val log = ruleChangeLog.toDF("seq", "rule_id", "rule_state", "limit")
    log
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rule_id")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("rule_state") =!= "DELETE")
      .select(col("rule_id"), col("rule_state"), col("limit"))
  }

  private val ruleUpsertOracle: String =
    """SELECT rule_id, rule_state, "limit" FROM (
      |  SELECT *, row_number() OVER (PARTITION BY rule_id ORDER BY seq DESC) rn
      |  FROM (VALUES (1,1,'ACTIVE',10.0),(2,2,'ACTIVE',20.0),(3,1,'PAUSE',10.0),
      |               (4,3,'ACTIVE',5.0),(5,2,'DELETE',0.0),(6,4,'ACTIVE',7.0),
      |               (7,4,'DELETE',0.0),(8,4,'ACTIVE',9.0))
      |       AS t(seq, rule_id, rule_state, "limit")
      |) WHERE rn = 1 AND rule_state <> 'DELETE'""".stripMargin

  // ---------------------------------------------------------------------------
  // Driver contract
  // ---------------------------------------------------------------------------

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    multiRule(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val statics = cepStaticRules.map { case (name, r) =>
      name -> ((s: SparkSession, dir: String) =>
        CepQuery.planRule(metricsFrame(s, dir), r))
    }
    statics ++ Map[String, (SparkSession, String) => DataFrame](
      "cep_multi_rule" -> multiRule,
      "cep_parse_metric" -> parseMetricQuery,
      "cep_parse_rule" -> parseRuleQuery,
      "cep_rule_upsert" -> ruleUpsertQuery)
  }

  /** DuckDB-equivalent SQL per query (same column names + arithmetic). */
  def oracleSql: Map[String, String] =
    cepStaticRules.map { case (n, r) => n -> staticRuleOracle(r) } ++ Map(
      "cep_multi_rule" -> multiRuleOracle,
      "cep_parse_metric" -> parseMetricOracle,
      "cep_parse_rule" -> parseRuleOracle,
      "cep_rule_upsert" -> ruleUpsertOracle)
}
