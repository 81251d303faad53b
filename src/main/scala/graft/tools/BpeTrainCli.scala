package graft.tools

import org.apache.spark.sql.SparkSession

/** Trains BPE merges on a documents table and writes the merges file
  * (one `left<TAB>right` per line, rank order) — the generator of
  * `src/main/resources/graft/bpe_merges.txt`.
  *
  * Usage: BpeTrainCli <sfDir> <numMerges> <outFile>
  */
object BpeTrainCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numMerges = args(1).toInt
    val out = args(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.pipeline.Bpe.train(docs, numMerges)
    val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
    try merges.foreach { case (l, r) => w.println(s"$l\t$r") }
    finally w.close()
    println(s"BPE_TRAIN merges=${merges.size} out=$out")
    spark.stop()
  }
}
