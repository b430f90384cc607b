package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry query
  * and time N laps of it (steady-state). Usage:
  *   runMain graft.Explain <queryName> [sfDir] [laps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val laps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = (SparkEntry.queries ++ SparkEntry.benchOnly)(name)
    fn(spark, sfDir).explain("formatted")
    var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    (1 to laps).foreach { i =>
      val t0 = System.nanoTime()
      // Same action as Bench: force the query's own plan, not the
      // count() rewrite (which prunes projections / eliminates joins).
      lastQe = fn(spark, sfDir).queryExecution
      val n = lastQe.toRdd.count()
      println(f"[explain] lap $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // The static plan above predates AQE's runtime re-planning (stage
    // reuse, skew splits, coalescing only appear in the FINAL adaptive
    // plan) — dump it post-execution when asked.
    if (sys.env.contains("SPARK_GRAFT_FINAL_PLAN"))
      println(lastQe.executedPlan.toString)
    spark.stop()
  }
}
