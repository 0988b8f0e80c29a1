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
  * ==CODEC BOUNDARY==
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — zero added dependencies):
  * width/height/channels/brightness come from actual pixels. Audio and
  * video decode, image FEATURE extraction, and any byte payload the
  * magic-byte sniff rejects fall back to a **clearly-marked
  * deterministic fake** (hashes / byte statistics) standing in for a
  * real JNI/FFI decoder. Everything AROUND the boundary — the
  * binaryFile source, the schema, the partition-batched Dataset
  * transform, the feature-vector column shape feeding
  * [[graft.ops.Similarity]] — is real, tested Spark plumbing; widening
  * the real side changes only the body of [[decodeOne]].
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

  /** Magic-byte sniff for the formats `javax.imageio` can decode — the
    * cheap gate that keeps non-image payloads (and the synthetic
    * byte-blob assets the verification queries build from text) off the
    * ImageIO attempt entirely. Extension metadata can lie; 8 bytes
    * can't. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

  /** Mean per-pixel luminance ((r+g+b)/3, 0..255) over the decoded
    * raster — one sequential pass, no per-pixel allocation. */
  private def meanLuminance(img: java.awt.image.BufferedImage): Double = {
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    sum / (img.getWidth.toLong * img.getHeight)
  }

  /** Decode one asset. Image payloads that pass the magic-byte sniff are
    * REALLY decoded with the JDK's ImageIO (PNG/BMP/GIF/JPEG) —
    * width/height/channels/brightness are pixel truth. Everything else
    * (audio/video, undecodable bytes, and the feature vector — still a
    * declared stub) is the deterministic byte-statistics fake. */
  private[multimodal] def decodeOne(a: RawAsset, featureDim: Int): DecodedAsset = {
    val h = a.content.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    val real: Option[(Int, Int, Int, Double)] =
      if (a.modality == "image" && looksLikeImage(a.content)) {
        try {
          Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.content)))
            .map(img => (img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, meanLuminance(img)))
        } catch { case _: java.io.IOException => None }
      } else None
    // fake-but-stable "dimensions" and byte-statistics "brightness"
    val width = real.fold(64 + math.floorMod(h, 1024).toInt)(_._1)
    val height = real.fold(64 + math.floorMod(h >> 10, 1024).toInt)(_._2)
    val channels = real.fold(if (a.modality == "image") 3 else 1)(_._3)
    val brightness = real.fold(
      if (a.content.isEmpty) 0.0
      else a.content.map(b => (b & 0xff).toDouble).sum / a.content.length)(_._4)
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
