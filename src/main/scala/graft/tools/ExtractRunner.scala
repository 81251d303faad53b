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
    val pagesPath = args(1) // may be a comma-separated list of shard dirs
    // optional barrier: <dir> <id> <parties> — after warming, touch
    // ready-<id> and spin until all parties are ready, so concurrent
    // children start their TIMED pass together (models executors all
    // busy at once; unsynchronized children understate contention)
    val barrier = if (args.length >= 5) Some((args(2), args(3), args(4).toInt)) else None
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
      val pages = spark.read.parquet(pagesPath.split(","): _*).as[Page]
      val t0 = System.nanoTime()
      val out = Extract.run(pages).flatMap(_.lineage)
        .map(l => (l.pages, l.tripleCount))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      (out._1, out._2, (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm: JIT, parquet footers, page cache
    barrier.foreach { case (dir, id, parties) =>
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve(s"ready-$id"), "1")
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (java.nio.file.Files.list(d).filter(p => p.getFileName.toString.startsWith("ready-")).count() < parties
        && System.nanoTime() < deadline) Thread.sleep(20)
    }
    val best = pass() // one timed pass; cross-JVM min happens in Bench
    println(f"EXTRACT_RESULT $cpus ${best._1} ${best._2} ${best._3}%.3f")
    spark.stop()
  }
}
