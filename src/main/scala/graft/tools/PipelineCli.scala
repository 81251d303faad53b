package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{KgPipeline, SyntheticPages}

/** Run the full KG-construction pipeline to a directory.
  * Usage: PipelineCli <outRoot> [copies] — rerunning with the same
  * outRoot resumes from completed stage checkpoints.
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val copies = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val tables = KgPipeline.run(spark, SyntheticPages.pages(spark, copies, 8), outRoot)
    val sec = (System.nanoTime() - t0) / 1e9
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(f"STAGE $name%-14s rows=${df.count()}")
    }
    println(f"PIPELINE_DONE sec=$sec%.2f outRoot=$outRoot")
    spark.stop()
  }
}
