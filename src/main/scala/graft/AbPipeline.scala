package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: A/B the curation pipeline spellings on one machine —
  * (A) the pre-token-index composition (each branch re-scans and
  * re-tokenizes the corpus) vs (B) `Curation.pipeline` (shared
  * materialized token index). Alternating laps, min-of-N, forced
  * execution via `queryExecution.toRdd` like Bench.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbPipeline [laps]" }}}
  */
object AbPipeline {
  def main(args: Array[String]): Unit = {
    val laps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    def evalDocs: DataFrame = docs.filter(col("doc_id") % 100 === 7)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))

    // (A) the old composition: every branch from raw text.
    def oldPipeline(): DataFrame = {
      val d = docs
      val quality = TextAnalysis.qualityFilter(d, 25, 100000, 0.09, 0.09)
        .select(col("doc_id"), col("keep").as("quality_keep"))
      val losers = Dedup.components(Dedup.ngramJaccardPairs(d, 3, 0.8, 10))
        .filter(col("component_id") =!= col("doc_id"))
        .select(col("doc_id"), lit(true).as("dup_loser"))
      val contaminated = Decontamination.flagContaminated(d, evalDocs, 13)
        .select(col("doc_id"), lit(true).as("contaminated"))
      d.select(col("doc_id"))
        .join(quality, Seq("doc_id"))
        .join(losers, Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality_keep"),
          coalesce(col("dup_loser"), lit(false)).as("dup_loser"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"),
          (col("quality_keep") && !coalesce(col("dup_loser"), lit(false)) &&
            !coalesce(col("contaminated"), lit(false))).as("keep"))
    }

    def newPipeline(): DataFrame = Curation.pipeline(docs, evalDocs)

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up both, then alternate.
    time(() => oldPipeline()); time(() => newPipeline())
    val as = Array.fill(laps)(0.0)
    val bs = Array.fill(laps)(0.0)
    for (i <- 0 until laps) {
      as(i) = time(() => oldPipeline())
      bs(i) = time(() => newPipeline())
    }
    println(f"""{"metric":"ab_pipeline","old_min":${as.min}%.3f,"new_min":${bs.min}%.3f,"old":[${as.map(v => f"$v%.3f").mkString(",")}],"new":[${bs.map(v => f"$v%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
