package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{KgPipeline, SyntheticPages}

/** Run the full KG-construction pipeline to a directory.
  * Usage: PipelineCli <outRoot> [copies] [--snapshots [--refresh]] —
  * rerunning with the same outRoot resumes from completed stage
  * checkpoints (plain parquet `_SUCCESS` markers by default; with
  * `--snapshots`, a SnapTable warehouse with atomic versioned commits,
  * where `--refresh` recomputes new snapshots and prior versions stay
  * readable).
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val snapshots = args.contains("--snapshots")
    val refresh = args.contains("--refresh")
    val copies = if (args.length > 1 && !args(1).startsWith("--")) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val pages = SyntheticPages.pages(spark, copies, 8)
    val tables =
      if (snapshots) KgPipeline.runVersioned(spark, pages, outRoot, refresh)
      else KgPipeline.run(spark, pages, outRoot)
    val sec = (System.nanoTime() - t0) / 1e9
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      val v = if (snapshots) s" v=${graft.pipeline.SnapTable.currentVersion(outRoot, name)}" else ""
      println(f"STAGE $name%-14s rows=${df.count()}$v")
    }
    println(f"PIPELINE_DONE sec=$sec%.2f outRoot=$outRoot snapshots=$snapshots")
    spark.stop()
  }
}
