package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Extract, Page, SyntheticPages}

/** Scaling diagnosis probe: times scan-only vs full extraction on a
  * materialized page table at a given parallelism.
  * Usage: BenchProbe <copies> <cpus> [pagesPath]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val copies = args(0).toInt
    val cpus = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pagesPath = if (args.length > 2) args(2) else {
      val p = java.nio.file.Files.createTempDirectory("graft_probe").toString + "/pages"
      SyntheticPages.pages(spark, copies, 256).write.parquet(p)
      p
    }
    println(s"PAGES_PATH $pagesPath")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (round <- 1 to 2) {
      time(s"scan_len_$round") {
        spark.read.parquet(pagesPath).selectExpr("sum(length(html))").as[Long].head()
      }
      time(s"scan_bytes_$round") {
        spark.read.parquet(pagesPath).select("url", "html").as[(String, Array[Byte])]
          .mapPartitions(it => Iterator.single(it.map(_._2.length.toLong).sum)).reduce(_ + _)
      }
      time(s"extract_$round") {
        Extract.run(spark.read.parquet(pagesPath).as[Page]).flatMap(_.lineage).map(_.tripleCount).reduce(_ + _)
      }
    }
    spark.stop()
  }
}
