package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries run in sorted-name order, and the whole set does one
  * warm-up lap before the timed lap, so reported numbers are
  * steady-state engine throughput rather than "whichever query
  * happened to run first pays JVM/codegen/parquet-footer warm-up" —
  * the per-query attribution is meaningless otherwise (first-query
  * noise was ±10s on a 0.3s query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Gate queries plus the bench-only production-hash twins (no
    // DuckDB oracle possible, but regressions must stay visible).
    val queries = (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq.sortBy(_._1)
    // A failing query must not bench as fast: its error is carried into
    // the JSON ("errors" map) instead of being swallowed into a small
    // elapsed time.
    // Force the query's OWN physical plan (all result columns
    // materialized), not the `.count()` rewrite: under count(),
    // Catalyst prunes every unreferenced projection (a pure-projection
    // query benches as a bare row count) and can even eliminate a
    // left join against an aggregate via distinct-keys inference —
    // both under-measure the work a real consumer of the rows pays.
    def lap(): Seq[(String, Double, Option[String])] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).queryExecution.toRdd.count(); None } catch {
        case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    lap() // warm-up: JIT, codegen cache, parquet footers
    // Three timed laps, min per query: the shared VM shows sporadic
    // external CPU interference (whole laps drift ±15%, sub-2s queries
    // spike ×5); the per-query min across laps is the faithful engine
    // cost.
    val results = Seq(lap(), lap(), lap()).transpose.map { laps =>
      (laps.head._1, laps.map(_._2).min,
        laps.flatMap(_._3).headOption) }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Full JSON string escaping: any control char < 0x20 (tabs, CRs,
    // ANSI escapes in exception messages) must not leak raw into the
    // one-line contract output.
    def jstr(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + jstr(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._3.isDefined)) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
