package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the 100 TB table: Z-order clustering and
  * zone-map pruning audits — the OPTIMIZE/CLUSTER-BY side of the
  * engine. At cluster scale a fact table is laid out in files; a scan
  * with a selective predicate reads only the files whose min/max zone
  * maps overlap it. Laying the table out along a space-filling curve
  * makes BOTH dimensions of a two-column predicate prune, where a
  * row-id (ingest-order) layout prunes neither. Everything here is
  * integer bit arithmetic — the curve position, the bucket identity,
  * and the audit counts all replay exactly in ANSI SQL.
  */
object Layout {

  /** Interleave the low 16 bits of `x` into the even bit positions of
    * a 32-bit value (Morton spread) — the classic mask ladder; every
    * step is BIGINT shift/AND, identical in Spark and DuckDB.
    */
  def spreadBits(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton Z-value of two 16-bit coordinates: x on even bits, y on
    * odd — nearby (x, y) points land near each other on the curve, so
    * fixed-width z ranges are spatial tiles.
    */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Zone-map pruning audit of one layout: bucket the rows by
    * `bucket`, build the per-bucket (min, max) zone maps of both
    * predicate columns, and report — for the query box
    * `x ∈ [x0, x1] ∧ y ∈ [y0, y1]` — how many buckets survive zone-map
    * pruning and how many rows a scan of the surviving buckets reads,
    * beside the exact match count (which no layout changes).
    *
    * Scale shape: ONE map-side-combinable groupBy on the bucket id
    * builds the zone maps (this is exactly the per-file statistics
    * pass of a table format); the audit fold is a second aggregate
    * over the bucket-sized frame. No window, no join, no collect —
    * the exact-match count rides the same per-bucket aggregate and
    * sums in the fold.
    */
  def zoneMapAudit(rows: DataFrame, xCol: String, yCol: String,
                   bucket: Column, layout: String,
                   x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    require(x0 <= x1 && y0 <= y1, "query box must be non-empty")
    val x = col(xCol)
    val y = col(yCol)
    val zm = rows
      .select(bucket.cast("bigint").as("b"), x.cast("bigint").as("x"), y.cast("bigint").as("y"))
      .groupBy(col("b"))
      .agg(
        min(col("x")).as("xmin"), max(col("x")).as("xmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"),
        count(lit(1)).as("n_rows"),
        sum(when(col("x").between(x0, x1) && col("y").between(y0, y1), 1L)
          .otherwise(0L)).as("n_match"))
    val touched = col("xmin") <= x1 && col("xmax") >= x0 &&
      col("ymin") <= y1 && col("ymax") >= y0
    zm.agg(
      count(lit(1)).cast("bigint").as("n_buckets"),
      sum(when(touched, 1L).otherwise(0L)).cast("bigint").as("buckets_touched"),
      sum(when(touched, col("n_rows")).otherwise(0L)).cast("bigint").as("rows_scanned"),
      sum(col("n_match")).cast("bigint").as("rows_matched"))
      .select(lit(layout).as("layout"), col("n_buckets"), col("buckets_touched"),
        col("rows_scanned"), col("rows_matched"))
  }
}
