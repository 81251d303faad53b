package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** One-off check backing the q174-q176 oracles: over the planted
  * corpora, is the cross-format lane (3g, 3g+1) recovered for EVERY
  * uncorrupt group, and at what hamming?
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def crossLane(pairs: org.apache.spark.sql.DataFrame, withH: Boolean) = {
      val lane = pairs.where(pmod(col("a"), lit(3)) === 0 && col("b") === col("a") + 1)
      if (withH) lane.groupBy(col("hamming")).count().orderBy("hamming").collect().toSeq
      else Seq(("rows", lane.count()))
    }
    val img = Multimodal.phashNearDup(Multimodal.imagePhash(Multimodal.syntheticImageCorpus(spark, 1200)))
    println("image hamming hist: " + crossLane(img, withH = true).mkString(","))
    val aud = Multimodal.phashNearDup(Multimodal.audioFingerprint(Multimodal.syntheticAudioCorpus(spark, 1200)))
    println("audio hamming hist: " + crossLane(aud, withH = true).mkString(","))
    val vid = Multimodal.videoNearDup(Multimodal.syntheticVideoCorpus(spark, 1200))
    println("video hamming hist: " + crossLane(vid, withH = true).mkString(","))
    println("expected uncorrupt groups: " + (0 until 400).count(g => (3 * g) % 16 != 15 && (3 * g + 1) % 16 != 15))
    spark.stop()
  }
}
