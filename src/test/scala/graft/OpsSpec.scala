package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Specs for the LLM-pipeline operators whose scale paths are not
  * SQL-expressible (SimHash, MinHash+LSH, ANN) — each is checked
  * against its exact baseline on the real corpus — plus the multimodal
  * imperative/declarative twin equivalence. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exact dedup groups identical normalized texts under one keeper id") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash+LSH pairs equal the exact n-gram Jaccard pairs on the corpus (recall 1 at J>=0.8)") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // corpus has planted near-dups
    assert(lsh == exact)
  }

  test("simhash: identical docs collide at hamming 0; planted near-dups are found") {
    val df = Seq((1L, "spark window agg join"), (2L, "spark window agg join"))
      .toDF("doc_id", "text")
    val pair = Dedup.simhashPairs(df, 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pair.toSeq == Seq((1L, 2L, 0)))

    // On the real corpus, simhash at tight hamming should rediscover a
    // decent share of the exact J>=0.8 near-dup pairs.
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(docs, 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("ANN LSH top-k achieves >=0.6 recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, queries, 5, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ann recall $recall")
  }

  test("multimodal: imperative (mapPartitions+decoder) equals declarative twin") {
    val media = Multimodal.mediaFromDocuments(docs)
    val imp = Multimodal.extractFeatures(media, Multimodal.MediaDecoder.Fake)
      .toDF().orderBy("media_id").collect().toSeq
    val sql = Multimodal.extractFeaturesSql(media)
      .orderBy("media_id").collect().toSeq
    assert(imp == sql)
  }

  test("frame sampling emits n_frames rows per media item") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("media_id").count()
    val joined = Multimodal.extractFeaturesSql(media)
      .select(col("media_id"), col("n_frames").cast("long").as("n_frames"))
      .join(counts, "media_id")
      .filter(col("count") =!= col("n_frames"))
    assert(joined.count() == 0)
  }
}
