package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion: the pipeline's Structured Streaming face
  * (the cluster-scale analogue of the reference's chunked
  * `decode_from_stream`, decoder.ex:50-53 — there a lazy enumerable,
  * here an unbounded page table).
  *
  *   pages (stream) ─flatMap extract→ triples ─watermark+window→
  *   per-window crawl metrics; triples appended to a parquet sink.
  *
  * The extraction core is the same row-local state machine as batch —
  * streaming only changes the source/sink contract, not the operator.
  */
object StreamingExtract {

  /** Streaming pages → streaming triples (append mode, stateless). */
  def triples(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(col("url"), col("warc_ts"), col("html"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (url, ts, html) =>
        Extract.triplesOf(url, html) match {
          case Right(ts2) => ts2.iterator.map(t => (t.url, ts, t.subj, t.pred, t.obj, t.objKind, t.lang, t.datatype))
          case Left(_) => Iterator.empty
        }
      }
      .toDF("url", "warc_ts", "subj", "pred", "obj", "objKind", "lang", "datatype")
  }

  /** Event-time windowed crawl metrics with a watermark: triples/pages
    * per 1-minute window of crawl time — late pages beyond 2 minutes
    * are dropped, keeping state bounded on an unbounded crawl.
    */
  def windowedCounts(pages: DataFrame): DataFrame = {
    val t = triples(pages)
    t.withWatermark("warc_ts", "2 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"), col("objKind"))
      .agg(count(lit(1)).as("triples"), approx_count_distinct(col("url")).as("pages"))
  }

  /** Wire a streaming page source to a parquet triple sink. */
  def start(pages: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    triples(pages).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
