package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-8 stage attribution + connected-component scale
  * evidence, alternating laps in ONE JVM (cross-run absolutes are not
  * comparable on this host — see verify skill notes).
  *
  *  1. `inc_append_stages` — `dedup_incremental_append` (7.28 s at
  *     sf0.1 in BENCH_r7, the most expensive row) split into its four
  *     jobs: index build / dedup batch A (incl. survivor anti-join) /
  *     APPEND survivors / dedup batch B against the grown index. The
  *     claim under test: the total is ~the sum of genuinely-necessary
  *     parts, and the append stage costs O(batch) — it re-scans
  *     nothing of the base index (plan-pinned in PlanShapeSpec; this
  *     measures it).
  *  2. `components_5m` — the distributed pointer-jumping path on a
  *     synthetic ~5M-edge graph (5× the 1M-edge driver dispatch
  *     threshold): 1.2M five-node stars plus 20 chains of 10k nodes
  *     (long diameters — the pathological case for label propagation;
  *     path halving must close them in O(log n) rounds). Reports wall
  *     time and the component count (correctness signal: exactly
  *     nStars + nChains components).
  *  3. `components_dispatch` — the SAME ~1M-edge graph through the
  *     driver union-find (the ≤1M dispatch default) vs the distributed
  *     loop (forced via maxDriverEdges = 0): the measured evidence
  *     behind the dispatch threshold.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound8 [laps]" }}}
  */
object AbRound8 {
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
      .select(col("doc_id"), col("text"))

    def rmrf(p: String): Unit = {
      import java.nio.file.{Files, Path, Paths}
      import java.util.Comparator
      if (Files.exists(Paths.get(p)))
        Files.walk(Paths.get(p)).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }

    // -- 1. stage-attributed incremental append ---------------------------
    // Mirrors SparkEntry's dedup_incremental_append workflow exactly,
    // with a timing fence (an action) after each stage. The one
    // difference from the gate plan: survivors are localCheckpointed so
    // stage boundaries are real fences — the gate's lazy plan would
    // blend batch-A dedup into the append write job.
    def stageLap(): (Double, Double, Double, Double) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ab8_idx").toString
      val all = docs
      val base = all.filter(col("doc_id") % 3 =!= 0)
      val t0 = System.nanoTime()
      Dedup.saveDedupIndex(base, dir, 3, 64, 16)
      val t1 = System.nanoTime()
      val batchA = all.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val matchedA = Dedup.dedupAgainstIndex(batchA, dir, 0.8, 3, 64, 16)
      val survivors = Persistence.Local(batchA.join(
        matchedA.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti"))
      val t2 = System.nanoTime()
      Dedup.appendToDedupIndex(survivors, dir, 3, 64, 16)
      val t3 = System.nanoTime()
      val batchB = all
        .filter(col("doc_id") % 3 === 1 || col("doc_id") % 6 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      Dedup.dedupAgainstIndex(batchB, dir, 0.8, 3, 64, 16)
        .queryExecution.toRdd.count()
      val t4 = System.nanoTime()
      rmrf(dir)
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, (t4 - t3) / 1e9)
    }
    def wholeLap(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("dedup_incremental_append")(spark, sfDir)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // -- 2/3. component graphs --------------------------------------------
    // Stars: nodes 0..n-1, edge i -> i - (i mod 5) for i not ≡ 0 (mod 5).
    def starEdges(nNodes: Long): DataFrame = spark.range(nNodes)
      .select(col("id").as("id_a"), (col("id") - (col("id") % 5)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // Chains: `chains` disjoint paths of `len` nodes above `base`.
    def chainEdges(chains: Int, len: Long, base: Long): DataFrame =
      spark.range(chains.toLong * len)
        .filter(col("id") % len =!= len - 1)
        .select((col("id") + base).as("id_a"), (col("id") + base + 1).as("id_b"))

    def fiveM(): DataFrame =
      starEdges(6000000L).union(chainEdges(20, 10000L, 10000000L))
    def oneM(): DataFrame = starEdges(1250000L)

    def timeComponents(mk: () => DataFrame, maxDriverEdges: Long,
        maxIters: Int = 30): (Double, Long) = {
      val t0 = System.nanoTime()
      val labels = Dedup.components(mk(), maxIters = maxIters,
        maxDriverEdges = maxDriverEdges)
      val nComp = labels.select(col("component_id")).distinct().count()
      ((System.nanoTime() - t0) / 1e9, nComp)
    }

    def fmtArr(xs: Seq[Double]): String =
      xs.map(v => f"$v%.3f").mkString("[", ",", "]")

    Bench.calibLap(); Bench.calibLap()
    val c0 = Bench.calibLap()

    // Warm-up, then interleaved laps.
    stageLap(); wholeLap()
    val builds, dedupAs, appends, dedupBs, wholes =
      scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until laps) {
      val (b, a, ap, bb) = stageLap()
      builds += b; dedupAs += a; appends += ap; dedupBs += bb
      wholes += wholeLap()
    }
    val stagesJson =
      f""""inc_append_stages":{"build_min":${builds.min}%.3f,""" +
        f""""dedup_a_min":${dedupAs.min}%.3f,"append_min":${appends.min}%.3f,""" +
        f""""dedup_b_min":${dedupBs.min}%.3f,""" +
        f""""sum_min":${builds.min + dedupAs.min + appends.min + dedupBs.min}%.3f,""" +
        f""""whole_min":${wholes.min}%.3f,""" +
        s""""build":${fmtArr(builds.toSeq)},"dedup_a":${fmtArr(dedupAs.toSeq)},""" +
        s""""append":${fmtArr(appends.toSeq)},"dedup_b":${fmtArr(dedupBs.toSeq)},""" +
        s""""whole":${fmtArr(wholes.toSeq)}}"""

    // 5M-edge distributed run (twice; min). Expected components:
    // 1.2M stars + 20 chains.
    val (t5a, n5a) = timeComponents(fiveM _, maxDriverEdges = 1L << 20)
    val (t5b, n5b) = timeComponents(fiveM _, maxDriverEdges = 1L << 20)
    val fiveJson =
      f""""components_5m":{"sec_min":${math.min(t5a, t5b)}%.3f,""" +
        f""""laps":${fmtArr(Seq(t5a, t5b))},"n_components":$n5a,""" +
        s""""expected":${1200000 + 20},"ok":${n5a == 1200020 && n5b == 1200020}}"""

    // Dispatch-threshold A/B on the 1M-edge graph.
    val drv = scala.collection.mutable.ArrayBuffer[Double]()
    val dst = scala.collection.mutable.ArrayBuffer[Double]()
    var nDrv = 0L; var nDst = 0L
    for (_ <- 0 until laps) {
      val (td, nd) = timeComponents(oneM _, maxDriverEdges = 1L << 20)
      val (tx, nx) = timeComponents(oneM _, maxDriverEdges = 0L)
      drv += td; dst += tx; nDrv = nd; nDst = nx
    }
    val dispatchJson =
      f""""components_dispatch":{"driver_min":${drv.min}%.3f,""" +
        f""""distributed_min":${dst.min}%.3f,"driver":${fmtArr(drv.toSeq)},""" +
        s""""distributed":${fmtArr(dst.toSeq)},""" +
        s""""agree":${nDrv == nDst}}"""

    val c1 = Bench.calibLap()
    println(s"""{"metric":"ab_round8",$stagesJson,$fiveJson,$dispatchJson,""" +
      f""""calib_ratio":${math.min(c0, c1) / Bench.CalibRefSec}%.3f}""")
    spark.stop()
  }
}
