package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label lap$i: $n rows ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    // two-step: tokens materialized before the explode
    val sh2 = docs.select(col("doc_id"),
        graft.ops.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(graft.ops.TextOps.shingles(col("toks"), 3))).as("shingle"))
    sh2.explain("formatted")
    time("shingleIndex2step")(sh2.count())
    spark.stop()
  }
}
