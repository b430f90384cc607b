package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

// Throwaway segment profiler for curation_pipeline (dev only).
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    def evalDocs: DataFrame = docs.filter(col("doc_id") % 100 === 7)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobTimes.put(js.jobId, (js.time, 0L))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobTimes.get(je.jobId)).foreach { case (s, _) =>
          jobTimes.put(je.jobId, (s, je.time)) }
    })
    def t(name: String)(f: => Unit): Unit = {
      jobTimes.clear()
      val t0 = System.nanoTime(); f
      val tot = (System.nanoTime()-t0)/1e9
      import scala.jdk.CollectionConverters._
      val jobs = jobTimes.asScala.toSeq.sortBy(_._1)
        .map { case (id, (s, e)) => f"j$id=${(e-s)/1e3}%.2f" }
      println(f"SEG $name $tot%.3f jobs=${jobs.size} [${jobs.mkString(" ")}]")
    }
    for (lap <- 1 to 3) {
      println(s"--- lap $lap")
      t("full_pipeline") { Curation.pipeline(docs, evalDocs).queryExecution.toRdd.count() }
      val base = Persistence.Local(docs.repartition(col("doc_id"))
        .select(col("doc_id"), graft.functions.word_tokens(col("text")).as("toks")))
      t("base_only") { base.queryExecution.toRdd.count() }
      var pairs: DataFrame = null
      t("pairs") { pairs = Persistence.Local(Dedup.ngramJaccardPairsFromTokens(base, 3, 0.8, 10)); pairs.count() }
      t("components") { Dedup.components(pairs).queryExecution.toRdd.count() }
      t("quality") { TextAnalysis.qualityFilterFromTokens(base, 25, 100000, 0.09, 0.09).queryExecution.toRdd.count() }
      t("decontam") { Decontamination.flagContaminatedFromTokens(base, evalDocs, 13).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
