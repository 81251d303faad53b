package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Ad-hoc stage-level timing for the MinHash-LSH family: times each
  * sub-frame of [[Dedup.minhashLshMd5]] in isolation on a warmed
  * session, so optimization work targets the measured bottleneck
  * instead of the guessed one.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stage-probe")
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

    // warm-up
    sink(Dedup.minhashLshMd5(docs, threshold = 0.5))

    time("full_q17")(sink(Dedup.minhashLshMd5(docs, threshold = 0.5)))

    // stage 1: shingle explode + distinct (the expl checkpoint input)
    val explPlan = Dedup.shingleRows(docs, 3).distinct()
    time("expl_distinct")(sink(explPlan))
    val expl = explPlan.localCheckpoint(true)
    time("expl_checkpoint_only") {
      Dedup.shingleRows(docs, 3).distinct().localCheckpoint(true).count()
    }

    // stage 2: 12-way md5 minima groupBy from the checkpoint
    val sigCols = (0 until 12).map(j => min(md5(concat(lit(s"$j|"), col("s")))).as(s"m$j"))
    time("sig_groupby")(sink(expl.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)))

    // stage 2b: banded (sig + bucket md5 + posexplode), no checkpoint
    val sig = expl.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bucketCols = (0 until 4).map(b =>
      md5(concat(col(s"m${3 * b}"), col(s"m${3 * b + 1}"), col(s"m${3 * b + 2}"))))
    val bandedPlan = sig.select(col("doc_id"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
    time("banded_no_ckpt")(sink(bandedPlan))
    val banded0 = bandedPlan.localCheckpoint(true)

    // stage 3: census + anti-join + self-join + distinct
    val hot = banded0.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).where(col("n") > 200)
      .select(col("band"), col("bucket"))
    val banded = banded0.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val candIds = banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("b")), Seq("band", "bucket"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    time("cand_ids")(sink(candIds))
    val cand = candIds.localCheckpoint(true)

    // stage 4: verify joins
    val sizes = expl.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(expl.select(col("doc_id").as("a"), col("s")), Seq("a"))
      .join(expl.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("ic"))
    val jaccard = col("ic").cast("double") / (col("sza") + col("szb") - col("ic"))
    val verified = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .where(jaccard >= 0.5)
      .select(col("a"), col("b"), round(jaccard, 4).as("jaccard"))
    time("verify")(sink(verified))

    // repeat full for warm stability
    time("full_q17_again")(sink(Dedup.minhashLshMd5(docs, threshold = 0.5)))

    spark.stop()
  }
}
