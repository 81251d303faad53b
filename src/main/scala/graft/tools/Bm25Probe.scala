package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing for q47 bm25TopK — replicates the operator's
  * sub-frames in isolation on a warmed session (the StageProbe
  * discipline) so optimization targets the measured bottleneck.
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bm25-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    sink(graft.pipeline.CorpusOps.bm25TopK(docs)) // warm-up
    time("full_q47")(sink(graft.pipeline.CorpusOps.bm25TopK(docs)))

    val wordsExpr = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    val corpus = docs.where(col("doc_id") % 41 =!= 0)
    val queries = docs.where(col("doc_id") % 41 === 0)
    val tf = corpus.select(col("doc_id"), explode(wordsExpr).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf")(sink(tf))
    val tfc = tf.localCheckpoint(true)
    println(s"COUNT tf=${tfc.count()}")
    val withStats = tfc
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    time("windows")(sink(withStats))
    val ws = withStats.localCheckpoint(true)
    val scalars = tfc.agg(countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("total_tokens"))
    val qterms = queries.select(col("doc_id").as("qid"), explode(wordsExpr).as("term")).distinct()
    time("qterms")(sink(qterms))
    val contrib = expr(
      """(2 * (n_docs - df) + 1) * 10000 div (2 * df + 1)
        | * tf * 22 * total_tokens
        | div (10 * total_tokens * tf + 3 * total_tokens + 9 * dl * n_docs)""".stripMargin)
    val perDocTerm = ws.crossJoin(broadcast(scalars))
      .select(col("term"), col("doc_id"), contrib.as("contrib"))
    val scored = perDocTerm
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("score"))
    time("scored")(sink(scored))
    val sc = scored.localCheckpoint(true)
    println(s"COUNT scored=${sc.count()}")
    val byQ = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id").asc)
    time("topk")(sink(sc.withColumn("rank", row_number().over(byQ)).where(col("rank") <= 5)))
    spark.stop()
  }
}
