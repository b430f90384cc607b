package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev harness: round-9 BPE-at-production-vocab evidence, one JVM
  * (cross-run absolutes are not comparable on this host — verify
  * skill notes).
  *
  * The sf0.1 corpus has only 31 distinct words — it cannot sustain a
  * production merge count (total possible merges ≈ Σ(len−1) over the
  * word vocabulary ≈ 200). So, following the SCALESLOPE_r8 precedent
  * (derive scale structure from the testdata rather than synthesize
  * an unrelated corpus), the harness builds a vocabulary-rich DERIVED
  * corpus: each token is salted with a deterministic per-(token,doc)
  * 3-LETTER hash suffix (base-26 digits of
  * pmod(xxhash64(tok, doc_id), 4096)), yielding ~127k distinct words
  * that share character substructure (base stems + letter tails BPE
  * merges learn across) while keeping document count, lengths, and
  * token positions from the real table. Letters, not digits: the
  * bpePattern pre-tokenizer splits letter runs from number runs, so a
  * numeric salt decomposes back into the 31 base words + ~4k numbers
  * (measured: a 4,158-word table that exhausts at 4,222 merges) — the
  * suffix must stay INSIDE one lexer word to actually widen the
  * vocabulary (75k+ distinct words, ~60k with freq ≥ 2).
  *
  * Measurements (VERDICT r8 next-round #2):
  *  1. `train` — bpeTrain wall time at numMerges ∈ {200, 2000, 32000}
  *     with the production vocab cap (65,536 words). The heap-based
  *     pair selection makes driver work O(merges · affected · log P);
  *     the numbers document the realistic 32k operating point, plus
  *     the driver word-table footprint (measured heap delta).
  *  2. `encode` — encoder throughput (docs/s, tokens/s) with the 32k
  *     merge table vs the 200-merge table over the derived corpus:
  *     the broadcast-table size and per-thread cache behavior at a
  *     zipfian word distribution.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbRound9 [laps]" }}}
  */
object AbRound9 {
  def main(args: Array[String]): Unit = {
    val laps = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Vocabulary-rich derived corpus (see scaladoc). localCheckpointed:
    // every lap must read identical data without re-deriving.
    val alpha = lit("abcdefghijklmnopqrstuvwxyz")
    def letter(h: org.apache.spark.sql.Column, div: Int) =
      substring(alpha, (pmod(floor(h / lit(div)).cast("long"), lit(26)) + 1)
        .cast("int"), lit(1))
    val rich = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), array_join(
        transform(graft.functions.word_tokens(col("text")), t => {
          val h = pmod(xxhash64(t, col("doc_id")), lit(4096))
          concat(t, letter(h, 1), letter(h, 26), letter(h, 676))
        }), " ").as("text"))
      .localCheckpoint()
    val nDocs = rich.count()

    def heapUsed(): Long = {
      val rt = Runtime.getRuntime
      System.gc()
      rt.totalMemory() - rt.freeMemory()
    }

    def trainLap(numMerges: Int): (Double, Int, Long) = {
      val h0 = heapUsed()
      val t0 = System.nanoTime()
      val merges = TextAnalysis.bpeTrain(rich, numMerges,
        maxVocabWords = 65536, minPairFreq = 2L)
      val dt = (System.nanoTime() - t0) / 1e9
      val h1 = heapUsed()
      (dt, merges.length, math.max(0L, h1 - h0))
    }

    def encodeLap(merges: Seq[(String, String)]): (Double, Long) = {
      val t0 = System.nanoTime()
      val toks = TextAnalysis.bpeStats(rich, merges)
        .agg(sum(col("n_tokens"))).collect().head.getLong(0)
      ((System.nanoTime() - t0) / 1e9, toks)
    }

    Bench.calibLap(); Bench.calibLap()
    val c0 = Bench.calibLap()

    // Warm-up: small train + encode to JIT both loops.
    val warmMerges = TextAnalysis.bpeTrain(rich, 50, maxVocabWords = 65536)
    encodeLap(warmMerges)

    val trainResults = Seq(200, 2000, 32000).map { m =>
      val lapsFor = if (m >= 32000) 1 else laps
      val rs = (0 until lapsFor).map(_ => trainLap(m))
      (m, rs.map(_._1).min, rs.head._2, rs.map(_._3).max)
    }
    val c1 = Bench.calibLap()

    // The 32k table for encode (re-trained above; reuse last result by
    // training once more at the final config — cheap relative to the
    // measurement value, and keeps the flow linear).
    val merges32k = TextAnalysis.bpeTrain(rich, 32000, maxVocabWords = 65536)
    val merges200 = TextAnalysis.bpeTrain(rich, 200, maxVocabWords = 65536)
    val enc32k = (0 until math.max(2, laps)).map(_ => encodeLap(merges32k))
    val enc200 = (0 until math.max(2, laps)).map(_ => encodeLap(merges200))
    val c2 = Bench.calibLap()

    // -- classifier training at fastText-scale dims -----------------------
    // The gate trains at dim 256; a production fastText-shape gate uses
    // 2^16..2^20 buckets. Same iteration structure — the dim-bounded
    // parts (broadcast weight frame, gradient shuffle, driver state)
    // are what grow, so the dim slope is the evidence the broadcast
    // path holds at real model sizes. 4 iterations, contains-'spark'
    // label on the UNMODIFIED sf0.1 corpus.
    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("label",
        array_contains(graft.functions.word_tokens(col("text")), "spark")
          .cast("int"))
      .localCheckpoint()
    def trainDimLap(dim: Int): Double = {
      val t0 = System.nanoTime()
      TextAnalysis.classifierTrain(docsRaw, "label", dim = dim, iters = 4)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    trainDimLap(256) // warm
    val dimResults = Seq(256, 65536).map { dim =>
      dim -> (0 until laps).map(_ => trainDimLap(dim)).min
    }
    val c3 = Bench.calibLap()

    // Approximate broadcast-table footprint: sum of merged-symbol
    // string chars (2 bytes each in-heap) + map entry overhead.
    def tableChars(ms: Seq[(String, String)]): Long =
      ms.map { case (l, r) => (l.length + r.length).toLong }.sum

    val trainJson = trainResults.map { case (m, sec, produced, heapB) =>
      f""""m$m":{"sec":$sec%.3f,"merges_produced":$produced,"heap_delta_mb":${heapB / 1048576.0}%.1f}"""
    }.mkString("{", ",", "}")
    def encJson(rs: Seq[(Double, Long)], ms: Seq[(String, String)]): String = {
      val sec = rs.map(_._1).min
      val toks = rs.head._2
      f"""{"sec":$sec%.3f,"docs_per_sec":${nDocs / sec}%.0f,""" +
        f""""tokens":$toks,"tokens_per_sec":${toks / sec}%.0f,""" +
        f""""table_chars":${tableChars(ms)}}"""
    }
    val dimJson = dimResults.map { case (dim, sec) =>
      f""""d$dim":$sec%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"ab_round9","n_docs":$nDocs,""" +
      s""""train":$trainJson,""" +
      s""""encode_32k":${encJson(enc32k, merges32k)},""" +
      s""""encode_200":${encJson(enc200, merges200)},""" +
      s""""classifier_train_4it_sec":$dimJson,""" +
      f""""calib":{"ref_sec":${Bench.CalibRefSec},"laps":[$c0%.4f,$c1%.4f,$c2%.4f,$c3%.4f]}}""")
    spark.stop()
  }
}
