package graft.model

/** The standing-query model of the rebuilt engine.
  *
  * Mirrors the reference's `Rule` POJO surface
  * (reference: src/main/java/org/apache/sn/task/model/Rule.java:12-24)
  * but normalized at construction time: enum-ish string fields are
  * canonicalized once so the query compiler ([[graft.cep.CepQuery]])
  * never re-parses them.
  *
  * A rule describes exactly one logical plan (SURVEY.md §2.2):
  *
  * {{{
  * SELECT <grouping tag values>, window, AGG(metrics[field]) AS result
  * FROM metrics
  * WHERE <all groupingKeyNames present in tags>
  * GROUP BY <grouping tags>, <window over eventTime>
  * HAVING result <op> <limit>
  * }}}
  */
final case class Rule(
    ruleId: Int,
    ruleState: RuleState,
    windowType: WindowType,
    windowMinutes: Int,
    windowSlideMinute: Int,
    groupingKeyNames: Seq[String],
    aggregatorFunctionType: AggType,
    aggregateFieldName: String,
    limitOperatorType: CmpOp,
    limit: BigDecimal) {
  def windowMillis: Long = windowMinutes * 60000L
  def slideMillis: Long = windowSlideMinute * 60000L
}

/** Rule lifecycle (reference: Rule.java:110-114). ACTIVE matches,
  * PAUSE keeps identity but stops matching, DELETE removes the rule. */
sealed abstract class RuleState(val name: String)
object RuleState {
  case object Active extends RuleState("ACTIVE")
  case object Pause extends RuleState("PAUSE")
  case object Delete extends RuleState("DELETE")
  val all = Seq(Active, Pause, Delete)
  def parse(s: String): RuleState =
    all.find(_.name.equalsIgnoreCase(s)).getOrElse(
      throw new IllegalArgumentException(s"unknown ruleState: $s"))
}

/** Window kind. The reference treats any string other than
  * "tumbling"/"sliding" as a global window (CEPEngine.java:75-81);
  * we keep that dispatch but name it explicitly. */
sealed abstract class WindowType(val name: String)
object WindowType {
  case object Tumbling extends WindowType("tumbling")
  case object Sliding extends WindowType("sliding")
  case object Global extends WindowType("global")
  def parse(s: String): WindowType = s.toLowerCase match {
    case "tumbling" => Tumbling
    case "sliding" => Sliding
    case _ => Global // reference semantics: anything else is the all-window
  }
}

/** Aggregator set (reference: Rule.java:68-86). */
sealed abstract class AggType(val name: String)
object AggType {
  case object Sum extends AggType("SUM")
  case object Avg extends AggType("AVG")
  case object Min extends AggType("MIN")
  case object Max extends AggType("MAX")
  val all = Seq(Sum, Avg, Min, Max)
  def parse(s: String): AggType =
    all.find(_.name.equalsIgnoreCase(s)).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregator: $s"))
}

/** Threshold comparator (reference: Rule.java:88-108 accepts both
  * word and symbol spellings; so do we). */
sealed abstract class CmpOp(val name: String, val symbol: String)
object CmpOp {
  case object Eq extends CmpOp("EQUAL", "=")
  case object Ne extends CmpOp("NOT_EQUAL", "!=")
  case object Gt extends CmpOp("GREATER", ">")
  case object Lt extends CmpOp("LESS", "<")
  case object Ge extends CmpOp("GREATER_EQUAL", ">=")
  case object Le extends CmpOp("LESS_EQUAL", "<=")
  val all = Seq(Eq, Ne, Gt, Lt, Ge, Le)
  def parse(s: String): CmpOp =
    all.find(o => o.name.equalsIgnoreCase(s) || o.symbol == s).getOrElse(
      throw new IllegalArgumentException(s"unknown comparator: $s"))
}
