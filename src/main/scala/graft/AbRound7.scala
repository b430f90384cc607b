package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-7 A/Bs, alternating laps in ONE JVM (cross-run
  * absolutes are not comparable on this host — see verify skill
  * notes). Three design decisions in the new span-dedup /
  * decontamination operators are measured rather than asserted:
  *
  *  1. `span_persist` — [[Dedup.duplicatedSpans]] materializes its
  *     (doc_id, pos, gram) frame because BOTH the gram aggregate and
  *     the position join consume it; the B side re-derives the frame
  *     per consumer (tokenize+shingle the corpus twice), which is the
  *     plan Spark silently runs if nobody persists.
  *  2. `span_minmax` — the cross-doc gram test as the shipped
  *     min!=max two-long partial aggregate vs the obvious
  *     `countDistinct(doc_id) > 1` spelling (expands to a two-phase
  *     distinct aggregate: a (g, doc_id) exchange before the count).
  *  3. `decon_bloom` — big-eval decontamination (broadcastEval=false,
  *     the regime the Bloom variant exists for): plain shuffle
  *     equi-join of every corpus gram vs Bloom-prefilter + exact
  *     verify join ([[Decontamination.flagContaminatedBloom]]).
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound7 [laps]" }}}
  */
object AbRound7 {
  def main(args: Array[String]): Unit = {
    val laps = args.headOption.map(_.toInt).getOrElse(4)
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
    val n = 5

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // -- 1. persist vs recompute ------------------------------------------
    def spanPersist(): DataFrame = Dedup.duplicatedSpans(docs, n)

    def posFrame(): DataFrame = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(
        graft.functions.word_shingle_hashes(col("text"), n)).as(Seq("pos", "g")))
    def islands(joined: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos").asc)
      joined
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(w) <= n, 0).otherwise(1))
        .withColumn("grp", sum(col("brk")).over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + n).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start")).as("n_words"))
    }
    def spanRecompute(): DataFrame = {
      val pos = posFrame() // NOT persisted: both consumers re-shingle
      val dup = pos.groupBy(col("g"))
        .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
        .filter(col("d0") =!= col("d1")).select(col("g"))
      islands(pos.join(dup, "g"))
    }

    // -- 2. min/max vs countDistinct cross-doc test -----------------------
    def spanCountDistinct(): DataFrame = {
      val pos = Persistence.Local(posFrame())
      val dup = pos.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("g"))
      islands(pos.join(dup, "g"))
    }

    // -- 3. plain big-eval shuffle join vs bloom prefilter ----------------
    // The Bloom variant exists for the eval-set-too-big-to-broadcast
    // regime; simulate it by disabling auto-broadcast (otherwise
    // Spark broadcasts the toy eval set and "plain" measures the
    // broadcast path). Corpus volume is the other axis — the Bloom's
    // two fixed eval-side jobs amortize against corpus gram volume,
    // so measure at 1× and 8× corpus.
    def corpus(): DataFrame = docs.filter(col("doc_id") >= 10)
    def corpusNx(k: Int)(): DataFrame = corpus()
      .select(col("text"), explode(sequence(lit(0L), lit(k - 1L))).as("rep"),
        col("doc_id").as("orig_id"))
      .select((col("orig_id") * k + col("rep") + 10).as("doc_id"), col("text"))
    def eval(): DataFrame = docs.filter(col("doc_id") < 10)
    // Planning reads the conf at action time, so the -1 threshold must
    // wrap the LAPS (see main below), not these builders.
    def noBroadcast[T](body: => T): T = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    def deconPlain(c: () => DataFrame)(): DataFrame =
      Decontamination.flagContaminated(c(), eval(), n, broadcastEval = false)
    def deconBloom(c: () => DataFrame)(): DataFrame =
      Decontamination.flagContaminatedBloom(c(), eval(), n)

    def lapSet(name: String, a: () => DataFrame, b: () => DataFrame,
        aName: String, bName: String): String = {
      time(a); time(b)
      val as = Array.fill(laps)(0.0)
      val bs = Array.fill(laps)(0.0)
      for (i <- 0 until laps) { as(i) = time(a); bs(i) = time(b) }
      f""""$name":{"${aName}_min":${as.min}%.3f,"${bName}_min":${bs.min}%.3f,""" +
        f""""$aName":[${as.map(v => f"$v%.3f").mkString(",")}],""" +
        f""""$bName":[${bs.map(v => f"$v%.3f").mkString(",")}]}"""
    }

    Bench.calibLap(); Bench.calibLap()
    val c0 = Bench.calibLap()
    val persist = lapSet("span_persist", spanPersist _, spanRecompute _,
      "persist", "recompute")
    val minmax = lapSet("span_minmax", spanPersist _, spanCountDistinct _,
      "minmax", "countdistinct")
    val bloom1 = noBroadcast(lapSet("decon_bloom_1x",
      deconBloom(corpus _), deconPlain(corpus _), "bloom", "plain"))
    val bloom8 = noBroadcast(lapSet("decon_bloom_8x",
      deconBloom(corpusNx(8)), deconPlain(corpusNx(8)), "bloom", "plain"))
    val bloom64 = noBroadcast(lapSet("decon_bloom_64x",
      deconBloom(corpusNx(64)), deconPlain(corpusNx(64)), "bloom", "plain"))
    val c1 = Bench.calibLap()
    println(s"""{"metric":"ab_round7",$persist,$minmax,$bloom1,$bloom8,$bloom64,""" +
      s""""calib_ratio":${math.min(c0, c1) / Bench.CalibRefSec}}""")
    spark.stop()
  }
}
