package graft.streaming

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import scala.collection.concurrent.TrieMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import graft.cep.Metrics.RuleRow
import graft.streaming.StatefulCep.CepEvent

/** Zero-downtime rule distribution for the one-pass stateful mode —
  * the rebuild of the reference's broadcast-state rule swap
  * (reference: PartitionEngine.java:54-63: a rule upsert takes effect
  * on the very next event, with NO job restart).
  *
  * Spark has no updatable broadcast variable and a stream-static join
  * freezes its static side's file listing at plan time, so the dynamic
  * rule book travels OUT OF BAND, the way reference data is refreshed
  * in production Spark streams:
  *
  *  - the control path ([[persist]]) writes the ACTIVE-rule snapshot
  *    as a tiny versioned file (`rules-v<version>.bin`, KBs of control
  *    data) under a shared directory — local FS, HDFS, or S3 via the
  *    Hadoop FileSystem API — atomically (write tmp, rename);
  *  - every fan-out task ([[fanOut]]) starts by listing that directory
  *    (one cheap metadata call against a dir holding a handful of
  *    files) and, only when the max version moved, re-reads the
  *    snapshot into a per-executor-JVM cache. So a rule change is
  *    picked up at the next micro-batch's task launch with no query
  *    restart, no replanning, and no per-event cost.
  *
  * The fanned-out events carry the full rule parameters (the
  * [[CepEvent]] contract), and the downstream stateful operator's
  * state schema is rule-independent — so the ONLY thing that changes
  * when a rule is upserted is which events fan out. Open windows of a
  * paused/deleted rule keep their state and their timers, and still
  * fire exactly once when the watermark passes them (spec-pinned).
  *
  * Freshness contract (documented deviation from the reference's
  * per-event broadcast ordering): tasks observe the newest snapshot
  * available when they LAUNCH, so a rule change lands on a micro-batch
  * boundary, and two tasks of one batch racing a concurrent persist
  * may briefly disagree — the same window of ambiguity as Flink's
  * broadcast stream, whose rule/data interleaving is also unordered.
  */
object DynamicRules {

  /** Hadoop `Configuration` is not `java.io.Serializable`; this holder
    * ships the driver's Hadoop conf (with all `spark.hadoop.*` keys,
    * e.g. object-store credentials) to executors via the conf's own
    * writable protocol. */
  final class ConfHolder(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  private val SnapshotName = "rules-v([0-9]{20})\\.bin".r

  private def fileName(version: Long): String = f"rules-v$version%020d.bin"

  /** How many published versions [[persist]] retains. Readers take the
    * max, so only the newest is live; the trailing window exists purely
    * so a reader that listed the directory JUST before a publish still
    * finds its file. A long-running book would otherwise grow one tiny
    * file per rule change, forever. */
  private val KeepVersions = 8

  /** Write the rule snapshot for `version` atomically (idempotent: a
    * snapshot that already exists is left alone — versions come from
    * [[RuleBook.version]], which only moves forward), then drop
    * versions older than the retention window. Driver-side control
    * path; KBs of data. */
  def persist(spark: SparkSession, dir: String, version: Long,
      rows: Seq[RuleRow]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(d)
    val fin = new Path(d, fileName(version))
    if (!fs.exists(fin)) {
      val tmp = new Path(d, fileName(version) + ".tmp")
      val out = new ObjectOutputStream(fs.create(tmp, true))
      try out.writeObject(rows.toArray) finally out.close()
      if (!fs.rename(tmp, fin) && !fs.exists(fin))
        throw new IOException(s"cannot publish rule snapshot $fin")
    }
    fs.listStatus(d).foreach { st =>
      st.getPath.getName match {
        case SnapshotName(v) if v.toLong < version - KeepVersions + 1 =>
          fs.delete(st.getPath, false); ()
        case _ => ()
      }
    }
  }

  /** Executor-side matcher view of one ACTIVE rule. */
  private[streaming] final case class Compiled(
      ruleId: Int, keys: Array[String], aggField: String,
      windowType: String, wMs: Long, sMs: Long,
      aggType: String, cmpOp: String, limit: Double)

  private def compile(r: RuleRow): Compiled = Compiled(
    r.rule_id, r.grouping_key_names.toArray, r.agg_field,
    r.window_type, r.window_minutes.toLong * 60000L,
    r.window_slide_minute.toLong * 60000L, r.agg_type, r.cmp_op, r.limit)

  /** version → compiled snapshot, one entry per rule directory, shared
    * by every task in this executor JVM. */
  private val cache = TrieMap.empty[String, (Long, Array[Compiled])]

  /** The newest published snapshot, re-read only when the directory's
    * max version moved. Called once per task. */
  private[streaming] def currentRules(dir: String,
      conf: Configuration): Array[Compiled] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    // A directory that doesn't exist yet (fanOut before any persist —
    // fanOut is public API) is an empty book, same as the static twin,
    // not a task failure.
    if (!fs.exists(d)) return Array.empty
    val latest = fs.listStatus(d).foldLeft(-1L) { (acc, st) =>
      st.getPath.getName match {
        case SnapshotName(v) => math.max(acc, v.toLong)
        case _ => acc
      }
    }
    if (latest < 0) return Array.empty
    cache.get(dir) match {
      case Some((v, rules)) if v == latest => rules
      case _ =>
        val in = new ObjectInputStream(fs.open(new Path(d, fileName(latest))))
        val rows = try in.readObject().asInstanceOf[Array[RuleRow]]
          finally in.close()
        val rules = rows.filter(_.rule_state == graft.model.RuleState.Active.name)
          .sortBy(_.rule_id).map(compile)
        cache.put(dir, (latest, rules))
        rules
    }
  }

  /** Typed mirror of the canonical metric schema (Metrics.scala).
    * `metrics` values ride as boxed doubles: a half-malformed event can
    * carry a null measure, which must contribute nothing — exactly the
    * declarative plan's null-ignoring aggregates. */
  final case class MetricRow(
      eventTime: java.sql.Timestamp,
      tags: Map[String, String],
      metrics: Map[String, java.lang.Double])

  /** Dynamic twin of [[StatefulCep.fanOut]]: metric × current-snapshot
    * rule match as a per-task loop instead of a plan-frozen broadcast
    * join. Semantics are identical (parity spec): a rule matches when
    * every grouping key is present in the event's tag map; `group_id`
    * is `ruleId_tagVal…` with null tag values skipped (concat_ws
    * semantics); a missing or null measure produces no event. Rules
    * are KBs and the loop is O(rules) per event with candidate check
    * on (few) tag keys — the same work the reference's per-event
    * broadcast-state lookup does (CEPEngine.java:36-64). */
  def fanOut(metricFrame: DataFrame, ruleDir: String,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val spark = metricFrame.sparkSession
    val conf = new ConfHolder(spark.sessionState.newHadoopConf())
    implicit val mEnc = Encoders.product[MetricRow]
    implicit val eEnc = Encoders.product[CepEvent]
    metricFrame.select("eventTime", "tags", "metrics").as[MetricRow]
      .mapPartitions { it =>
        val rules = currentRules(ruleDir, conf.value)
        it.flatMap { m =>
          if (m.eventTime == null || m.tags == null || m.metrics == null)
            Iterator.empty
          else {
            val evMs = m.eventTime.getTime
            rules.iterator
              .filter(r => r.keys.forall(m.tags.contains))
              .flatMap { r =>
                m.metrics.get(r.aggField).flatMap(Option(_)).map { v =>
                  val gid = (Iterator(r.ruleId.toString) ++
                    r.keys.iterator.flatMap(k => Option(m.tags(k))))
                    .mkString("_")
                  CepEvent(r.ruleId, gid, m.eventTime, evMs, v.doubleValue,
                    r.windowType, r.wMs, r.sMs, r.aggType, r.cmpOp, r.limit)
                }
              }
          }
        }
      }
      .withWatermark("eventTime", watermarkDelay)
      .toDF()
  }
}
