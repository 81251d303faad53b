package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Ad-hoc stage-level timing for the PPJoin-family prefix joins
  * (q59 jaccardPrefixJoin / q81 containmentPrefixJoin): times each
  * sub-frame in isolation on a warmed session so optimization targets
  * the measured bottleneck (the StageProbe discipline applied to the
  * other expensive self-join family).
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prefix-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up
    sink(Dedup.jaccardPrefixJoin(docs))

    time("full_q59")(sink(Dedup.jaccardPrefixJoin(docs)))
    time("full_q81")(sink(Dedup.containmentPrefixJoin(docs)))

    // --- q59 stages, replicated from jaccardPrefixJoin
    val explPlan = Dedup.shingleRows(docs, 3).distinct()
    time("expl_ckpt") { explPlan.localCheckpoint(true).count() }
    val expl = explPlan.localCheckpoint(true)
    val dfreq = expl.groupBy(col("s")).agg(count(lit(1)).as("c"))
    time("dfreq")(sink(dfreq))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = expl.join(dfreq, Seq("s"))
      .select(col("doc_id"), col("s"),
        row_number().over(byDoc.orderBy(col("c"), col("s"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    time("ranked")(sink(ranked))
    val tNum = 1; val tDen = 2
    val minOv = (lit(tNum) * col("sz") + lit(tDen - 1)).divide(lit(tDen)).cast("long")
    val prefix = ranked
      .where(col("pos") <= col("sz") - minOv + lit(1))
      .select(col("doc_id"), col("s"), col("sz"))
    time("prefix_ckpt") { prefix.localCheckpoint(true).count() }
    val pfx = prefix.localCheckpoint(true)
    println(s"COUNT prefix=${pfx.count()} expl=${expl.count()}")
    val candIds = pfx.select(col("s"), col("doc_id").as("a"), col("sz").as("sza"))
      .join(pfx.select(col("s"), col("doc_id").as("b"), col("sz").as("szb")), Seq("s"))
      .where(col("a") < col("b") &&
        lit(tDen) * col("szb") >= lit(tNum) * col("sza") &&
        lit(tDen) * col("sza") >= lit(tNum) * col("szb"))
      .select(col("a"), col("b"))
      .distinct()
    time("cand_ckpt") { candIds.localCheckpoint(true).count() }
    val cand = candIds.localCheckpoint(true)
    println(s"COUNT cand=${cand.count()}")
    val sizes = expl.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(expl.select(col("doc_id").as("a"), col("s")), Seq("a"))
      .join(expl.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("ic"))
    time("verify_inter")(sink(inter))
    val out = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .where(lit(tDen) * col("ic") >= lit(tNum) * (col("sza") + col("szb") - col("ic")))
    time("verify_full")(sink(out))
    spark.stop()
  }
}
