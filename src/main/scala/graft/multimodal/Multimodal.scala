package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw multimodal asset: opaque bytes + typed metadata (north star:
  * multimodal columns for a training-data pipeline). */
case class RawAsset(path: String, modality: String, length: Long,
                    content: Array[Byte])

/** Decoded asset: STUB-decoded metadata + feature vector. */
case class DecodedAsset(path: String, modality: String, length: Long,
                        width: Int, height: Int, channels: Int,
                        brightness: Double, features: Array[Float])

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-level batches.
  *
  * ==STUB BOUNDARY==
  * This container has no image/audio codecs, so `decodeBatch` is a
  * **clearly-marked deterministic fake**: metadata and features are
  * derived purely from the bytes (hashes / byte statistics), standing in
  * for a real JNI/FFI decoder. Everything AROUND the stub — the
  * binaryFile source, the schema, the partition-batched Dataset
  * transform, the feature-vector column shape feeding
  * [[graft.ops.Similarity]] — is real, tested Spark plumbing; swapping
  * in a real decoder changes only the body of [[decodeOne]].
  *
  * Scale: `binaryFile` splits by file; batch size is bounded per
  * partition (mapPartitions streams, never materializing a partition);
  * decoded features are fixed-dim `Array[Float]` ready for the ANN
  * operators. Partition balance for skewed file sizes: repartition on
  * `ceil(length / targetBytes)` salt before decode.
  */
object Multimodal {

  /** Ingest a directory of binary assets via Spark's binaryFile source.
    * Modality is derived from the file extension (the typed-metadata
    * pattern: never sniff bytes in the plan). */
  def readAssets(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.*")
      .load(path)
      .select(
        col("path"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("ext"),
        col("length"), col("content"))
      .withColumn("modality",
        when(col("ext").isin("jpg", "jpeg", "png", "bmp"), "image")
          .when(col("ext").isin("wav", "mp3", "flac"), "audio")
          .when(col("ext").isin("mp4", "mkv", "avi"), "video")
          .otherwise("binary"))
      .drop("ext")

  /** STUB decoder for one asset — deterministic fake standing in for a
    * real codec. Real plumbing boundary: replace this body only. */
  private[multimodal] def decodeOne(a: RawAsset, featureDim: Int): DecodedAsset = {
    val h = a.content.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    // fake-but-stable "dimensions" and byte-statistics "brightness"
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val channels = if (a.modality == "image") 3 else 1
    val brightness =
      if (a.content.isEmpty) 0.0
      else a.content.map(b => (b & 0xff).toDouble).sum / a.content.length
    // one pass over the bytes updating featureDim accumulators — same
    // value as the per-feature filtered folds (byte j only ever touches
    // accumulator j % featureDim, in index order) at 1/featureDim the
    // scans and zero per-feature index allocations
    val acc = Array.tabulate(featureDim)(i => h + i)
    var j = 0
    while (j < a.content.length) {
      val i = j % featureDim
      acc(i) = 31 * acc(i) + a.content(j)
      j += 1
    }
    val features = acc.map(c => (math.floorMod(c, 2048).toFloat / 1024.0f) - 1.0f)
    DecodedAsset(a.path, a.modality, a.length, width, height, channels,
      brightness, features)
  }

  /** Partition-batched decode: the Scala analogue of a vectorized
    * (batch-at-a-time) decode UDF — streams each partition's iterator
    * through the stub decoder without collecting it. */
  def decodeBatch(assets: Dataset[RawAsset], featureDim: Int = 16): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne(_, featureDim)))
  }

  /** "Resize" = typed-metadata transform (a real resize would re-encode
    * bytes inside the stub boundary): clamps decoded dims to a max edge,
    * preserving aspect ratio. Pure expression — no UDF. */
  def resizeMeta(decoded: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxEdge) / greatest(col("width"), col("height")).cast("double"))
    // both dims scaled in ONE projection — sequential withColumn would
    // re-evaluate `scale` against the already-resized width
    decoded.withColumns(Map(
      "width" -> floor(col("width") * scale).cast("int"),
      "height" -> floor(col("height") * scale).cast("int")))
  }

  /** Frame sampling for video-like assets: evenly spaced sample offsets
    * (ms) from typed metadata — pure `sequence` expression, exploded
    * downstream into per-frame work units. */
  def frameSampleOffsets(durationMs: org.apache.spark.sql.Column,
                         everyMs: Long): org.apache.spark.sql.Column =
    sequence(lit(0L), greatest(durationMs - 1, lit(0L)), lit(everyMs))
}
