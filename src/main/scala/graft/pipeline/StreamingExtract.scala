package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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

  /** Online exact dedup over an unbounded document stream — custom
    * state via flatMapGroupsWithState: the stream is keyed by content
    * fingerprint, per-key state records whether the fingerprint was
    * already seen, and only the FIRST document per fingerprint is
    * emitted downstream (training pipelines dedup at ingest so
    * duplicates never reach storage). State per key is one boolean +
    * the keeper's id; event-time timeout bounds state on streams where
    * re-crawls stop recurring after `stateTtl`.
    *
    * Input columns: (doc_id bigint, text string, event_ts timestamp).
    * Output: (fp, keep_id, first emission only).
    */
  def streamingExactDedup(docs: DataFrame,
                          stateTtl: scala.concurrent.duration.FiniteDuration =
                            scala.concurrent.duration.Duration(1, "hour")): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE ttl drives both the watermark and the state timeout — two
    // independent knobs could silently disagree (state living 12x the
    // requested window, or early re-emission)
    val ttlMs = stateTtl.toMillis
    docs
      .select(col("doc_id"), col("text"), col("event_ts"))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("event_ts", s"${stateTtl.toSeconds} seconds")
      .as[(Long, String, java.sql.Timestamp, String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (fp, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // per-fingerprint batch is bounded by same-content docs in
            // one micro-batch — safe to materialize
            val batch = rows.toArray
            if (batch.isEmpty) Iterator.empty
            else {
              // TTL slides from the latest sighting's EVENT time (a
              // watermark-relative timeout would expire dormant state
              // as soon as the watermark advances past one batch)
              val maxTs = batch.iterator.map(_._3.getTime).max
              val timeoutAt = math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1)
              if (state.exists) {
                state.setTimeoutTimestamp(timeoutAt)
                Iterator.empty // fingerprint already emitted earlier
              } else {
                // deterministic keeper within the batch: smallest doc_id
                val keeper = batch.iterator.map(_._1).min
                state.update(keeper)
                state.setTimeoutTimestamp(timeoutAt)
                Iterator.single((fp, keeper))
              }
            }
          }
      }
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
