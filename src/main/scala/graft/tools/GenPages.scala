package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.SyntheticPages
/** Write a synthetic page-table batch: GenPages <outDir> <copies> */
object GenPages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SyntheticPages.pages(spark, args(1).toInt, 4).write.mode("append").parquet(args(0))
    spark.stop()
  }
}
