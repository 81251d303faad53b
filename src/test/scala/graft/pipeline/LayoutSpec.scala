package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton interleave bit-exactness, tile locality, and
  * the zone-map pruning audit — including the layout comparison the
  * operator exists for (a Z-order layout prunes a two-dimensional box,
  * an ingest-order layout does not).
  */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def z(x: Long, y: Long): Long = {
    val s = spark
    import s.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().head.getLong(0)
  }

  test("zValue: bit interleave is exact — x on even bits, y on odd") {
    assert(z(0L, 0L) == 0L)
    assert(z(3L, 1L) == 7L)              // 0b101 | (0b1 << 1)
    assert(z(0xFFFFL, 0L) == 0x55555555L)
    assert(z(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // reference interleave on an arbitrary point
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    assert(z(12345L, 54321L) == ref(12345L, 54321L))
  }

  test("zValue: a 16x16 tile shares its z div 256 prefix — curve locality is real") {
    val s = spark
    import s.implicits._
    val pts = for (dx <- 0L until 16L; dy <- 0L until 16L) yield (32L + dx, 48L + dy)
    val prefixes = pts.toDF("x", "y")
      .select((Layout.zValue(col("x"), col("y")) / 256).cast("bigint").as("p"))
      .distinct().collect().map(_.getLong(0))
    assert(prefixes.length == 1, prefixes.toSeq.toString)
  }

  test("zoneMapAudit: touched/scanned/matched on a hand grid; zorder prunes the box, rowid cannot") {
    val s = spark
    import s.implicits._
    // 32x32 grid of points, id in ingest order (row-major: id = y*32+x)
    val pts = (0L until 1024L).map(i => (i, i % 32, i / 32)).toDF("id", "x", "y")
    // box: x in [0,7], y in [0,7] -> exactly 64 matching points
    // zorder layout: 16 buckets of z div 64 = the 8x8 tiles; the box IS
    // one tile -> 1 bucket touched, 64 rows scanned
    val zRow = pts.withColumn("zv", Layout.zValue(col("x"), col("y")))
      .transform(d => Layout.zoneMapAudit(d, "x", "y",
        expr("CAST(zv div 64 AS BIGINT)"), "zorder", 0, 7, 0, 7))
      .collect().head
    assert(zRow.getAs[Long]("n_buckets") == 16L)
    assert(zRow.getAs[Long]("buckets_touched") == 1L)
    assert(zRow.getAs[Long]("rows_scanned") == 64L)
    assert(zRow.getAs[Long]("rows_matched") == 64L)
    // rowid layout: 16 buckets of 64 consecutive ids = 2 full grid rows
    // each -> every bucket spans x in [0,31]; only y prunes: buckets
    // covering y in [0,7] -> 4 touched, 256 rows scanned, same matches
    val rRow = Layout.zoneMapAudit(pts, "x", "y",
      expr("CAST(id div 64 AS BIGINT)"), "rowid", 0, 7, 0, 7)
      .collect().head
    assert(rRow.getAs[Long]("n_buckets") == 16L)
    assert(rRow.getAs[Long]("buckets_touched") == 4L)
    assert(rRow.getAs[Long]("rows_scanned") == 256L)
    assert(rRow.getAs[Long]("rows_matched") == 64L)
  }
}
