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
    /** envelope-free kernel: pages -> TripleRow, for overhead comparison */
    def passRaw(): (Long, Long, Double) = {
      val pages = spark.read.parquet(pagesPath).as[Page]
      val t0 = System.nanoTime()
      val slim = pages.select(org.apache.spark.sql.functions.col("url"), org.apache.spark.sql.functions.col("html"))
        .as[(String, Array[Byte])]
      val n = slim.mapPartitions { it =>
        var triples = 0L
        it.foreach { case (url, html) =>
          Extract.triplesOf(url, html) match {
            case Right(ts) => triples += ts.size
            case Left(_) =>
          }
        }
        Iterator.single(triples)
      }.reduce(_ + _)
      (0L, n, (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm: JIT, parquet footers, page cache
    val a = pass()
    val b = pass()
    val best = if (a._3 <= b._3) a else b
    println(f"EXTRACT_RESULT $cpus ${best._1} ${best._2} ${best._3}%.3f")
    val r1 = passRaw(); val r2 = passRaw()
    println(f"EXTRACT_RAW $cpus ${r1._2} ${math.min(r1._3, r2._3)}%.3f")
    spark.stop()
  }
}
