package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-5 A/B of the two serial-latency fixes, measured
  * as alternating laps in ONE JVM (the host's fluctuating CPU steal
  * makes cross-run absolute numbers non-comparable — see verify
  * skill notes).
  *
  *  - connected components: one propagation round per materialized
  *    job (`stepsPerJob = 1`, the round-4 spelling) vs two chained
  *    rounds per job (`stepsPerJob = 2`).
  *  - stratified cap: forced two-phase (`singlePhaseMaxBytes = 0`,
  *    the round-4 spelling) vs adaptive single-window on inputs whose
  *    size estimate rules out a hot stratum.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound5 [laps]" }}}
  */
object AbRound5 {
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

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    def compOne(): DataFrame = Dedup.components(
      Dedup.ngramJaccardPairs(docs, 3, 0.8, 10), stepsPerJob = 1)
    def compTwo(): DataFrame = Dedup.components(
      Dedup.ngramJaccardPairs(docs, 3, 0.8, 10), stepsPerJob = 2)

    def capForced(): DataFrame = Sampling.stratifiedCap(docs, col("source"),
      col("doc_id"), 5, "s1", singlePhaseMaxBytes = 0L)
    def capAdaptive(): DataFrame = Sampling.stratifiedCap(docs, col("source"),
      col("doc_id"), 5, "s1")

    // The BENCH_r04-era capped pair pipeline, replicated inline:
    // STRING shingles, per-row window n_cap over the exploded index,
    // anti-join hot pruning, exact verify on the full string index.
    // "New" is the current Dedup.ngramJaccardPairs (64-bit gram
    // hashes + broadcast-hot flag + window hot counts).
    def pairsR4(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sh = Persistence.Local(docs.repartition(col("doc_id"))
        .select(col("doc_id"),
          array_distinct(graft.functions.word_shingles(col("text"), 3)).as("sh_arr"))
        .select(col("doc_id"), explode(col("sh_arr")).as("shingle"),
          size(col("sh_arr")).as("n_sh")))
      val hot = sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > 10)
        .select(col("shingle"))
      val candIdx = sh.join(hot, Seq("shingle"), "left_anti")
        .withColumn("n_cap", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      val scored = candIdx.as("x")
        .join(candIdx.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("cc"),
          first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"),
          first(col("x.n_cap")).as("ca"), first(col("y.n_cap")).as("cb"))
      val ubCommon = col("cc") +
        least(col("n_a") - col("ca"), col("n_b") - col("cb"))
      val cand = scored
        .filter(ubCommon.cast("double") /
          (col("n_a") + col("n_b") - ubCommon) >= 0.8)
        .select(col("id_a"), col("id_b"))
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
        .filter(col("jaccard") >= 0.8)
    }
    def pairsNow(): DataFrame = Dedup.ngramJaccardPairs(docs, 3, 0.8, 10)

    def lapSet(name: String, a: () => DataFrame, b: () => DataFrame): String = {
      time(a); time(b) // warm-up both spellings
      val as = Array.fill(laps)(0.0)
      val bs = Array.fill(laps)(0.0)
      for (i <- 0 until laps) { as(i) = time(a); bs(i) = time(b) }
      f""""$name":{"old_min":${as.min}%.3f,"new_min":${bs.min}%.3f,""" +
        f""""old":[${as.map(v => f"$v%.3f").mkString(",")}],""" +
        f""""new":[${bs.map(v => f"$v%.3f").mkString(",")}]}"""
    }

    val comp = lapSet("components_steps_1v2", compOne _, compTwo _)
    val cap = lapSet("cap_forced_v_adaptive", capForced _, capAdaptive _)
    val pairs = lapSet("ngram_pairs_r4_v_hashed", pairsR4 _, pairsNow _)
    println(s"""{"metric":"ab_round5",$comp,$cap,$pairs}""")
    spark.stop()
  }
}
