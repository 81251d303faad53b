package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * The actual codec work (JPEG decode, audio resample, video frame
  * sampling) is STUBBED behind [[AssetDecoder]] — the media libraries
  * are not in this container — with a deterministic fake implementation
  * so the Spark-side plumbing (schema, partitioning, batch shape,
  * feature extraction contract) is real and testable. Swap
  * [[FakeDecoder]] for a JNI/FFI-backed decoder in production.
  */
object Multimodal {

  trait AssetDecoder extends Serializable {
    /** Decode payload → fixed-width feature vector; None = corrupt. */
    def decode(kind: String, payload: Array[Byte], width: Int, height: Int): Option[Array[Float]]
    /** Frame sampling for video: how many frames would be extracted. */
    def frameCount(kind: String, durationMs: Int): Int
  }

  /** Deterministic fake: features derived from payload bytes only —
    * stable across retries/partitionings, which is exactly the contract
    * a real decoder must also satisfy.
    */
  object FakeDecoder extends AssetDecoder {
    def decode(kind: String, payload: Array[Byte], width: Int, height: Int): Option[Array[Float]] = {
      if (payload.isEmpty) return None // corrupt asset path
      val out = new Array[Float](8)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < out.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      Some(out)
    }
    def frameCount(kind: String, durationMs: Int): Int =
      if (kind == "video") math.max(1, durationMs / 1000) else 1
  }

  /** Deterministic synthetic asset table (payload bytes are a pure
    * function of asset_id; ~1/16 assets are corrupt/empty).
    */
  def syntheticAssets(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[AssetRow] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, n, 1, partitions).map { id =>
      val kind = kinds((id % 3).toInt)
      val len = if (id % 16 == 15) 0 else 64 + (id % 192).toInt
      val payload = new Array[Byte](len)
      var h = id
      var i = 0
      while (i < len) { h = h * 6364136223846793005L + 1442695040888963407L; payload(i) = (h >>> 56).toByte; i += 1 }
      AssetRow(id, s"http://test.example/asset/$id", kind, payload,
        width = 64 + (id % 512).toInt, height = 64 + (id % 256).toInt,
        durationMs = if (kind == "video") (1000 + id % 30000).toInt else 0)
    }
  }

  /** Decode + feature-extract stage: mapPartitions over the binary
    * column (the Scala-engine equivalent of a mapInPandas batch UDF) —
    * bounded memory per task, corrupt assets flagged not fatal.
    */
  def extractFeatures(assets: Dataset[AssetRow], decoder: AssetDecoder = FakeDecoder): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decoder.decode(a.kind, a.payload, a.width, a.height) match {
          case Some(f) => AssetFeatures(a.asset_id, a.kind, ok = true, f, decoder.frameCount(a.kind, a.durationMs))
          case None => AssetFeatures(a.asset_id, a.kind, ok = false, Array.empty, 0)
        }
      }
    }
  }

  /** Relational summary over extracted features (joins the asset and
    * feature tables; demonstrates the downstream-consumption shape).
    */
  def featureSummary(assets: Dataset[AssetRow], decoder: AssetDecoder = FakeDecoder) = {
    val feats = extractFeatures(assets, decoder)
    feats.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_decoded"),
        sum(col("frames").cast("long")).as("total_frames"))
      .orderBy(col("kind"))
  }
}
