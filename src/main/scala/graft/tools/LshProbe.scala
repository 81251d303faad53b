package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Dedup, Similarity}

/** LSH cost diagnosis: times the dedup/ANN scale paths on a documents/
  * embeddings table. Usage: LshProbe <sfDir>
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("minhash_w3")(Dedup.minhashLsh(docs, threshold = 0.5).count())
    time("minhash_w1")(Dedup.minhashLsh(docs, threshold = 0.5, shingleWidth = 1).count())
    time("simhash")(Dedup.simhash(docs, maxHamming = 3).count())
    time("embedding_neardup")(
      Similarity.embeddingNearDup(emb, threshold = 0.4, planes = 6, tables = 8).count())
    time("ann_lsh")(Similarity.lshCosine(emb, k = 5).count())
    spark.stop()
  }
}
