package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{StreamingExtract, SyntheticPages}

/** Streaming ingestion CLI: watches a directory of page parquet files
  * and appends extracted triples to a parquet sink, exactly-once via
  * the checkpoint dir. Usage: StreamCli <pagesDir> <outDir> <checkpointDir>
  */
object StreamCli {
  def main(args: Array[String]): Unit = {
    val Array(pagesDir, outDir, checkpointDir) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = org.apache.spark.sql.Encoders.product[graft.pipeline.Page].schema
    val pages = spark.readStream.schema(schema).parquet(pagesDir)
    val q = StreamingExtract.start(pages, outDir, checkpointDir)
    q.awaitTermination()
    val n = spark.read.parquet(outDir).count()
    println(s"STREAM_DONE triples=$n out=$outDir")
    spark.stop()
  }
}
