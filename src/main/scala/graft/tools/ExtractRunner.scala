package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Extract, Page}

/** Isolated extraction-throughput measurement: fresh JVM per parallelism
  * level (spawned by graft.Bench) so JIT state, GC history and heap
  * shape are symmetric across configs. One warm pass, two timed passes,
  * min reported. Prints: EXTRACT_RESULT <cpus> <pages> <triples> <sec>
  */
object ExtractRunner {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pagesPath = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-extract-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def pass(): (Long, Long, Double) = {
      val pages = spark.read.parquet(pagesPath).as[Page]
      val t0 = System.nanoTime()
      val out = Extract.run(pages).flatMap(_.lineage)
        .map(l => (l.pages, l.tripleCount))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      (out._1, out._2, (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm: JIT, parquet footers, page cache
    val best = pass() // one timed pass; cross-JVM min happens in Bench
    println(f"EXTRACT_RESULT $cpus ${best._1} ${best._2} ${best._3}%.3f")
    spark.stop()
  }
}
