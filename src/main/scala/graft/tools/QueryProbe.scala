package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual registered queries with the same pruning-proof noop
  * sink the bench uses. Usage: QueryProbe <sfDir> [query ...]
  * (no query names → all registered queries, sorted)
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"PROBE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      } catch { case e: Throwable => println(s"PROBE $name FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
