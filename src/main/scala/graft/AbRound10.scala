package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-10 trainer-iteration A/B, one JVM, alternating
  * laps (cross-run absolutes are not comparable on this host — verify
  * skill notes).
  *
  * OLD (r9): per iteration, a broadcast weight-frame join + a
  * corpus-wide margins groupBy + a per-doc residual frame joined back
  * to a SECOND scan of the feature frame (broadcast under the
  * seed-set gate). Replicated inline below.
  * NEW (r10): the per-doc item arrays are grouped ONCE outside the
  * loop; each iteration is one narrow pipeline — HOF margin folds
  * against a weight array literal, per-row residual, item explode
  * into the dim-bounded gradient groupBy. No joins, no residual
  * frame, no corpus-wide aggregation inside the loop.
  *
  * The harness asserts the two spellings produce IDENTICAL weights
  * (exact fixed-point integers) before timing them.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound10 [laps]" }}}
  */
object AbRound10 {

  /** The r9 iteration spelling, verbatim (two feat scans + gated
    * residual broadcast), kept here as the A/B reference. */
  private def oldTrain(docs: DataFrame, labelCol: String, dim: Int,
      wordNgrams: Int, iters: Int, lrNum: Long, lrDen: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bucket = (g: Column) =>
      (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % dim).cast("int")
    def gramsOf(toks: Column, k: Int): Column =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    val bk0 = docs
      .withColumn("toks", graft.functions.word_tokens(col("text")))
      .withColumn("grams",
        concat((1 to wordNgrams).map(k => gramsOf(col("toks"), k)): _*))
      .select(col("doc_id"), col(labelCol).cast("long").as("y"),
        explode(col("grams")).as("g"))
      .select(col("doc_id"), col("y"), bucket(col("g")).as("bk"))
    val counts = bk0.groupBy("doc_id", "y", "bk").agg(count(lit(1)).as("cnt"))
    val content = counts.select(
      col("doc_id"), col("y"), col("bk"), lit(1L).as("c"), lit(1L).as("nd"))
    val intercept = docs.select(col("doc_id"),
      col(labelCol).cast("long").as("y"),
      lit(-1).as("bk"), lit(1L).as("c"), lit(1L).as("nd"))
    val feat = content.unionByName(intercept)
      .repartition(col("doc_id")).persist()
    val nDocs = docs.count()
    val buckets: Array[Int] =
      feat.select("bk").distinct().collect().map(_.getInt(0)).sorted
    val ws = scala.collection.mutable.HashMap(
      buckets.map(b => b -> 0L).toSeq: _*)
    def divHalf(a: BigInt, d: BigInt): BigInt =
      BigInt(a.signum) * ((a.abs * 2 + d) / (d * 2))
    var it = 0
    while (it < iters) {
      val wDf = broadcast(buckets.toSeq.map(b => (b, ws(b))).toDF("bk", "ws"))
      val margins = feat.join(wDf, Seq("bk"), "left")
        .withColumn("wc",
          coalesce(col("ws"), lit(0L)).cast("decimal(38,0)") * col("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("y")).as("y"),
          sum(when(col("bk") === -1, col("wc"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("i0"),
          sum(when(col("bk") =!= -1, col("wc"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("ms"),
          max(col("nd")).as("ndoc"))
      val md = (col("i0").cast("double") / lit(1e12)) +
        (col("ms").cast("double") / lit(1e12)) / col("ndoc").cast("double")
      val p = lit(0.5) + (lit(0.5) * md) / (lit(1.0) + abs(md))
      val resid = (col("y") * lit(1000000L)) -
        floor(p * lit(1000000.0) + lit(0.5)).cast("long")
      val residDf = margins.select(col("doc_id"), resid.as("resid"))
      val gradRows = feat.join(broadcast(residDf), "doc_id")
        .withColumn("rqNum", col("resid") * lit(1000000L))
        .withColumn("rq", when(col("rqNum") >= 0,
            expr("(2*rqNum + nd) div (2*nd)"))
          .otherwise(-expr("(2*(-rqNum) + nd) div (2*nd)")))
        .withColumn("term", (col("rq") * col("c")).cast("decimal(38,0)"))
        .groupBy(col("bk")).agg(sum(col("term")).as("grad"))
        .collect()
      val den = BigInt(lrDen) * BigInt(nDocs)
      gradRows.foreach { r =>
        val b = r.getInt(0)
        val g = BigInt(r.getDecimal(1).toBigInteger)
        ws(b) = ws(b) + divHalf(g * lrNum, den).toLong
      }
      it += 1
    }
    feat.unpersist()
    buckets.toSeq.map(b => (b.toLong, ws(b), ws(b).toDouble / 1e12))
      .toDF("bucket", "w_scaled", "weight")
  }

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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("label",
        array_contains(graft.functions.word_tokens(col("text")), "spark")
          .cast("int"))
      .localCheckpoint()
    docs.count()

    def wMap(df: DataFrame): Map[Long, Long] =
      df.select(col("bucket").cast("long"), col("w_scaled").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    def lapOld(): Double = {
      val t0 = System.nanoTime()
      oldTrain(docs, "label", dim = 256, wordNgrams = 2, iters = 12,
        lrNum = 1L, lrDen = 2L).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def lapNew(): Double = {
      val t0 = System.nanoTime()
      TextAnalysis.classifierTrain(docs, "label", dim = 256,
        wordNgrams = 2, iters = 12, lrNum = 1L, lrDen = 2L)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // Bit-identity first: the A/B is only meaningful if the spellings
    // agree exactly.
    val eq = wMap(oldTrain(docs, "label", 256, 2, 6, 1L, 2L)) ==
      wMap(TextAnalysis.classifierTrain(docs, "label", 256,
        wordNgrams = 2, iters = 6))
    require(eq, "old and new trainer spellings disagree — A/B aborted")

    Bench.calibLap(); Bench.calibLap()
    val c0 = Bench.calibLap()
    // Warm both paths.
    lapOld(); lapNew()
    val pairs = (0 until laps).map { _ => (lapOld(), lapNew()) }
    val c1 = Bench.calibLap()

    val oldMin = pairs.map(_._1).min
    val newMin = pairs.map(_._2).min
    println(f"""{"metric":"ab_r10_trainer_iteration","old_min_s":$oldMin%.3f,"new_min_s":$newMin%.3f,"ratio":${oldMin / newMin}%.3f,"weights_equal":$eq,"laps":$laps,"old_laps":[${pairs.map(p => f"${p._1}%.3f").mkString(",")}],"new_laps":[${pairs.map(p => f"${p._2}%.3f").mkString(",")}],"calib":{"before":$c0%.4f,"after":$c1%.4f},"sf":"$sfDir"}""")
    spark.stop()
  }
}
