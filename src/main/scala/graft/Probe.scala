package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main for the r15 optimization session: prints
  * the ngram candidate self-join physical plan (the subtree the SHJ
  * hint rewrites — it is checkpoint-interior, so the gate plan dumps
  * cannot show it). Honors SPARK_GRAFT_SHJ like the operator. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", SessionTuning.localDir)
      .config("spark.sql.optimizer.excludedRules", SessionTuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // The capped candidate pipeline's self-join shape, replicated from
    // Dedup.pairsFromIndex with the same hint spelling.
    val sh = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(graft.functions.word_shingle_hashes(col("text"), 3))
          .as("sh_arr"))
      .select(col("doc_id"), explode(col("sh_arr")).as("shingle"),
        size(col("sh_arr")).as("n_sh"))
      .localCheckpoint()
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 10).select(col("shingle"))
    val candIdx = sh.join(broadcast(hot.withColumn("is_hot", lit(1))),
        Seq("shingle"), "left")
      .withColumn("n_hot", sum(coalesce(col("is_hot"), lit(0))).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("is_hot").isNull)
      .select(col("doc_id"), col("shingle"), col("n_sh"), col("n_hot"))
    def shjHint(df: org.apache.spark.sql.DataFrame) =
      if (sys.env.getOrElse("SPARK_GRAFT_SHJ", "on") != "off")
        df.hint("SHUFFLE_HASH") else df
    val scored = candIdx.as("x")
      .join(shjHint(candIdx.as("y")),
        col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("cc"),
        first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"),
        first(col("x.n_hot")).as("ha"), first(col("y.n_hot")).as("hb"))
    println("=== candidate self-join physical (SPARK_GRAFT_SHJ=" +
      sys.env.getOrElse("SPARK_GRAFT_SHJ", "on") + ") ===")
    println(scored.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
