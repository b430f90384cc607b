package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

// Throwaway: A/B of capped ngram pair spellings (dev only).
object ProfileCuration2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SEG $name ${(System.nanoTime()-t0)/1e9}%.3f rows=$n")
    }
    val threshold = 0.8
    val maxDf = 10

    def shIndex(hashed: Boolean): DataFrame = {
      val base = docs.repartition(col("doc_id"))
        .select(col("doc_id"), graft.functions.word_tokens(col("text")).as("toks"))
      val arr =
        if (hashed) graft.functions.array_shingle_hashes(col("toks"), 3)
        else graft.functions.array_shingles(col("toks"), 3).cast("array<string>")
      Persistence.Local(base
        .select(col("doc_id"), array_distinct(arr).as("sh_arr"))
        .select(col("doc_id"), explode(col("sh_arr")).as("shingle"),
          size(col("sh_arr")).as("n_sh")))
    }

    def verify(cand: DataFrame, sh: DataFrame): DataFrame =
      cand
        .join(sh.as("a"), col("id_a") === col("a.doc_id"))
        .join(sh.as("b"),
          col("id_b") === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_common"),
          first(col("a.n_sh")).as("n_a"), first(col("b.n_sh")).as("n_b"))
        .select(col("id_a"), col("id_b"),
          (col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)

    // A: current spelling (anti/semi joins + two hotCnt joins on scored).
    def variantA(sh: DataFrame): DataFrame = {
      val hot = Persistence.Local(sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
        .select(col("shingle")))
      val candIdx = sh.join(hot, Seq("shingle"), "left_anti")
      val hotCnt = sh.join(hot, Seq("shingle"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hot"))
      val scored = candIdx.as("x")
        .join(candIdx.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("cc"),
          first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"))
        .join(hotCnt.select(col("doc_id").as("id_a"), col("n_hot").as("ha")),
          Seq("id_a"), "left")
        .join(hotCnt.select(col("doc_id").as("id_b"), col("n_hot").as("hb")),
          Seq("id_b"), "left")
      val ub = col("cc") + least(coalesce(col("ha"), lit(0L)), coalesce(col("hb"), lit(0L)))
      val cand = scored
        .filter(ub.cast("double") / (col("n_a") + col("n_b") - ub) >= threshold)
        .select(col("id_a"), col("id_b"))
      verify(cand, sh)
    }

    // B: broadcast hot flag + per-row window n_hot; no hotCnt joins.
    def variantB(sh: DataFrame, bcastCandVerify: Boolean): DataFrame = {
      val hot = Persistence.Local(sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
        .select(col("shingle")))
      val flagged = sh.join(
          broadcast(hot.withColumn("is_hot", lit(1))), Seq("shingle"), "left")
        .withColumn("n_hot", sum(coalesce(col("is_hot"), lit(0)))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      val candIdx = flagged.filter(col("is_hot").isNull)
        .select(col("doc_id"), col("shingle"), col("n_sh"), col("n_hot"))
      val scored = candIdx.as("x")
        .join(candIdx.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("cc"),
          first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"),
          first(col("x.n_hot")).as("ha"), first(col("y.n_hot")).as("hb"))
      val ub = col("cc") + least(col("ha"), col("hb"))
      val cand = scored
        .filter(ub.cast("double") / (col("n_a") + col("n_b") - ub) >= threshold)
        .select(col("id_a"), col("id_b"))
      verify(if (bcastCandVerify) broadcast(cand) else cand, sh)
    }

    for (lap <- 1 to 4) {
      println(s"--- lap $lap")
      t("r4_strings_joinhot") {
        val sh = shIndex(hashed = false); variantA(sh).count() }
      t("r5_hashes_bcasthot") {
        val sh = shIndex(hashed = true); variantB(sh, bcastCandVerify = false).count() }
    }
    spark.stop()
  }
}
