package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw multimodal asset: opaque bytes + typed metadata (north star:
  * multimodal columns for a training-data pipeline). */
case class RawAsset(path: String, modality: String, length: Long,
                    content: Array[Byte])

/** Decoded asset: metadata + feature vector. For images width/height
  * are pixels; for PCM WAV audio `sampleRateHz`/`durationMs` are real
  * (0 elsewhere) and `brightness` is the mean |amplitude| in [0, 1]. */
case class DecodedAsset(path: String, modality: String, length: Long,
                        width: Int, height: Int, channels: Int,
                        sampleRateHz: Int, durationMs: Long,
                        brightness: Double, features: Array[Float])

/** A really-resized thumbnail: `ok = true` iff the payload decoded
  * through the real codec path; `png` then holds the re-encoded
  * downscaled raster. */
case class Thumbnail(path: String, modality: String, ok: Boolean,
                     width: Int, height: Int, png: Array[Byte])

/** Content-level asset fingerprint: perceptual dHash for really-decoded
  * images (`fp_kind = "dhash"`), byte-exact md5 otherwise (`"md5"`).
  * `fp_bits` is the 64-bit form for Hamming banding. */
case class AssetFingerprint(path: String, modality: String, length: Long,
                            fp_kind: String, fingerprint: String,
                            fp_bits: Long)

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-level batches.
  *
  * ==CODEC BOUNDARY==
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — zero added dependencies):
  * width/height/channels/brightness come from actual pixels. Audio
  * decode is REAL for PCM RIFF/WAVE (a ~44-byte header parse + a pass
  * over the 8/16-bit samples — no codec needed): channels, sample
  * rate, duration and mean |amplitude| come from the actual samples.
  * Image FEATURE vectors are REAL too: [[lumaGridQ]] computes a
  * centered spatial-luminance grid embedding from the decoded raster
  * (16-dim 4×4 at the default featureDim) — ANN-feedable pixel truth.
  * Compressed audio (mp3/flac), video samples, and any byte payload
  * the magic-byte sniffs reject fall back to deterministic CONTENT
  * statistics ([[byteMomentsQ]] residue-class byte means — a real,
  * cross-engine-reproducible byte signature; hash-stable fake
  * dimensions only) standing in for a real JNI/FFI decoder.
  * Everything AROUND the boundary — the binaryFile source, the schema,
  * the partition-batched Dataset transform, the feature-vector column
  * shape feeding [[graft.ops.Similarity]] — is real, tested Spark
  * plumbing; widening the real side changes only the body of
  * [[decodeOne]].
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

  /** Parsed PCM WAV facts: (channels, sampleRateHz, durationMs,
    * mean |amplitude| normalized to [0, 1]). */
  private case class WavFacts(channels: Int, sampleRateHz: Int,
                              durationMs: Long, meanAmp: Double)

  /** Minimal RIFF/WAVE reader for UNCOMPRESSED PCM (format tag 1, 8 or
    * 16 bits): walks the chunk list to `fmt ` and `data` (tolerating
    * extra chunks like LIST), then one pass over the samples. Returns
    * None for compressed/malformed payloads — those stay on the fake
    * path. Pure byte arithmetic: deterministic on any JVM. */
  private def parseWav(b: Array[Byte]): Option[WavFacts] = {
    def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int) = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (pos + 8 <= b.length) {
      val id = tag(pos); val sz = u32(pos + 4).toInt
      // untrusted bytes: a chunk size with the high bit set wraps to a
      // negative Int and would walk `pos` BACKWARDS — an infinite loop,
      // not just a bad parse. Bail to the fake path instead.
      if (sz < 0) return None
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        if (u16(pos + 8) != 1) return None // not uncompressed PCM
        fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22)))
      } else if (id == "data") {
        val (ch, rate, bits) = fmt.getOrElse(return None)
        if (ch <= 0 || rate <= 0 || (bits != 8 && bits != 16)) return None
        val n = math.min(sz, b.length - pos - 8) // sample bytes present
        val bytesPerFrame = ch * bits / 8
        val frames = if (bytesPerFrame == 0) 0L else n.toLong / bytesPerFrame
        var sum = 0.0
        var i = pos + 8
        val end = pos + 8 + n
        if (bits == 8) { // unsigned, midpoint 128
          while (i < end) { sum += math.abs((b(i) & 0xff) - 128) / 128.0; i += 1 }
        } else {
          while (i + 1 < end) {
            val s = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort
            sum += math.abs(s.toDouble) / 32768.0
            i += 2
          }
        }
        val nSamples = if (bits == 8) n else n / 2
        return Some(WavFacts(ch, rate, frames * 1000L / rate,
          if (nSamples == 0) 0.0 else sum / nSamples))
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    None
  }

  /** Parsed MP4 facts: presentation width/height in pixels (from the
    * first video `tkhd`) and movie duration in ms (from `mvhd`). */
  private case class Mp4Facts(width: Int, height: Int, durationMs: Long)

  /** Minimal ISO-BMFF (MP4) box walk: top level → `moov` → `mvhd`
    * (timescale + duration) and `trak`/`tkhd` (16.16 fixed-point
    * presentation dims; first track with nonzero dims wins). Samples
    * are NOT decoded — this is container metadata only, which is the
    * honest boundary without a video codec. 64-bit extended box sizes
    * abort to the fake path. */
  private def parseMp4(b: Array[Byte]): Option[Mp4Facts] = {
    def u32(i: Int) = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def findBox(from: Int, to: Int, name: String): Option[(Int, Int)] = {
      var pos = from
      while (pos + 8 <= to) {
        val sz = u32(pos)
        if (sz < 8 || pos + sz > to) return None // size 0/1 (to-end, 64-bit) unhandled
        if (tag(pos + 4) == name) return Some((pos + 8, pos + sz.toInt))
        pos += sz.toInt
      }
      None
    }
    if (b.length < 12 || tag(4) != "ftyp") return None
    for {
      (moovS, moovE) <- findBox(0, b.length, "moov")
      (mvhdS, _) <- findBox(moovS, moovE, "mvhd")
    } yield {
      val v = b(mvhdS) & 0xff
      val (timescale, duration) =
        if (v == 1) (u32(mvhdS + 20), (u32(mvhdS + 24) << 32) | u32(mvhdS + 28))
        else (u32(mvhdS + 12), u32(mvhdS + 16))
      val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
      // first trak whose tkhd has nonzero presentation dims
      var dims = (0, 0)
      var pos = moovS
      while (dims == ((0, 0)) && pos + 8 <= moovE) {
        val sz = u32(pos)
        if (sz < 8 || pos + sz > moovE) { pos = moovE } else {
          if (tag(pos + 4) == "trak") {
            findBox(pos + 8, pos + sz.toInt, "tkhd").foreach { case (tk, tkE) =>
              val tv = b(tk) & 0xff
              // version/flags + creation + modification + trackID +
              // reserved + duration (fields are 8-byte in v1 where noted)
              val base = if (tv == 1) tk + 4 + 8 + 8 + 4 + 4 + 8
                         else tk + 4 + 4 + 4 + 4 + 4 + 4
              val dimOff = base + 8 + 2 + 2 + 2 + 2 + 36
              if (dimOff + 8 <= tkE) {
                val w = (u32(dimOff) >> 16).toInt
                val h = (u32(dimOff + 4) >> 16).toInt
                if (w > 0 && h > 0) dims = (w, h)
              }
            }
          }
          pos += sz.toInt
        }
      }
      Mp4Facts(dims._1, dims._2, durMs)
    }
  }

  /** Content-derived image feature vector: centered quantized mean
    * luminance per cell of a g×g box grid (g = √dim when dim is a
    * perfect square, else a 1-row dim-column strip grid) — the 16-dim
    * spatial-luma embedding a 4×4 grid gives at the default featureDim.
    * Same integer-cell discipline as [[dHash64]]: cell bounds by
    * integer index arithmetic (never an interpolation kernel), one
    * Long sum of (r+g+b) per cell, then ×10⁴ integer division —
    * m_i = sum_i·10⁴ DIV (3·pixels_i) is the cell's mean luminance in
    * ×10⁴ units of the 0..255 scale — and the per-image mean is
    * subtracted in the SAME quantized domain, so the vector is
    * illumination-centered (a globally brightened copy moves every
    * component together and the direction survives). Components are
    * exact integers < 2.55·10⁶ — exactly representable as Float, so
    * downstream dot products stay integer-exact in double. */
  private[multimodal] def lumaGridQ(img: java.awt.image.BufferedImage,
                                    dim: Int): Array[Float] = {
    val s = math.sqrt(dim.toDouble).toInt
    val (gw, gh) = if (s * s == dim) (s, s) else (dim, 1)
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](dim)
    val cnts = new Array[Long](dim)
    var total = 0L
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.min(h, math.max((cy + 1) * h / gh, y0 + 1))
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.min(w, math.max((cx + 1) * w / gw, x0 + 1))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val i = cy * gw + cx
        sums(i) = sum
        cnts(i) = (x1 - x0).toLong * (y1 - y0) * 3
        cx += 1
      }
      cy += 1
    }
    var t = 0L; var tc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        t += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    tc = w.toLong * h * 3
    val dm = t * 10000L / tc
    Array.tabulate(dim)(i => (sums(i) * 10000L / cnts(i) - dm).toFloat)
  }

  /** Content-derived byte embedding for payloads outside the real
    * codec boundary: centered quantized mean byte value per residue
    * class (dimension i aggregates bytes at positions ≡ i mod dim) —
    * a real byte statistic, not a hash fake, and deliberately
    * reproducible by ANY engine that can read the payload's hex (the
    * q123 md5 discipline applied to the embedding surface — q204's
    * DuckDB oracle rebuilds these exact integers from
    * `hex(encode(text))`). m_i = sum_i·10⁴ DIV cnt_i, centered on
    * dm = total·10⁴ DIV length; residue classes with no bytes (length
    * < dim) emit 0 = "no deviation". Exact integers end to end;
    * identical bytes ⇒ identical vectors (the dedup hook). */
  private[multimodal] def byteMomentsQ(content: Array[Byte],
                                       dim: Int): Array[Float] = {
    if (content.isEmpty) return new Array[Float](dim)
    val sums = new Array[Long](dim)
    val cnts = new Array[Long](dim)
    var total = 0L
    var j = 0
    while (j < content.length) {
      val i = j % dim
      val v = (content(j) & 0xff).toLong
      sums(i) += v; cnts(i) += 1; total += v
      j += 1
    }
    val dm = total * 10000L / content.length
    Array.tabulate(dim)(i =>
      if (cnts(i) == 0L) 0f else (sums(i) * 10000L / cnts(i) - dm).toFloat)
  }

  /** Decode one asset. Image payloads that pass the magic-byte sniff
    * are REALLY decoded with the JDK's ImageIO (PNG/BMP/GIF/JPEG) —
    * width/height/channels/brightness are pixel truth, and the feature
    * vector is the real [[lumaGridQ]] spatial-luminance embedding
    * (closing the former feature-vector stub for every format the JDK
    * decodes). Audio payloads that parse as PCM RIFF/WAVE get REAL
    * channels/sample-rate/duration and mean-|amplitude| brightness.
    * Video payloads that parse as ISO-BMFF (MP4) get REAL presentation
    * width/height and duration (container metadata; samples stay
    * undecoded). Feature vectors outside the image-decode path are the
    * [[byteMomentsQ]] byte-statistics embedding — content-derived and
    * cross-engine reproducible, standing in for a real JNI/FFI
    * audio/video feature extractor; width/height for undecodable
    * payloads remain the hash-stable fake. */
  private[multimodal] def decodeOne(a: RawAsset, featureDim: Int): DecodedAsset = {
    val h = a.content.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    val img: Option[java.awt.image.BufferedImage] =
      if (a.modality == "image" && looksLikeImage(a.content)) {
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.content)))
        catch { case _: java.io.IOException => None }
      } else None
    val real: Option[(Int, Int, Int, Double)] =
      img.map(i => (i.getWidth, i.getHeight,
        i.getColorModel.getNumComponents, meanLuminance(i)))
    val wav: Option[WavFacts] =
      if (a.modality == "audio") parseWav(a.content) else None
    val mp4: Option[Mp4Facts] =
      if (a.modality == "video") parseMp4(a.content) else None
    // fake-but-stable "dimensions" and byte-statistics "brightness"
    val width = mp4.filter(_.width > 0).map(_.width)
      .orElse(real.map(_._1)).getOrElse(64 + math.floorMod(h, 1024).toInt)
    val height = mp4.filter(_.height > 0).map(_.height)
      .orElse(real.map(_._2)).getOrElse(64 + math.floorMod(h >> 10, 1024).toInt)
    val channels = wav.map(_.channels).orElse(real.map(_._3))
      .getOrElse(if (a.modality == "image") 3 else 1)
    val brightness = wav.map(_.meanAmp).orElse(real.map(_._4)).getOrElse(
      if (a.content.isEmpty) 0.0
      else a.content.map(b => (b & 0xff).toDouble).sum / a.content.length)
    val features = img.map(lumaGridQ(_, featureDim))
      .getOrElse(byteMomentsQ(a.content, featureDim))
    DecodedAsset(a.path, a.modality, a.length, width, height, channels,
      wav.map(_.sampleRateHz).getOrElse(0),
      wav.map(_.durationMs).orElse(mp4.map(_.durationMs)).getOrElse(0L),
      brightness, features)
  }

  /** Partition-batched decode: the Scala analogue of a vectorized
    * (batch-at-a-time) decode UDF — streams each partition's iterator
    * through the stub decoder without collecting it. */
  def decodeBatch(assets: Dataset[RawAsset], featureDim: Int = 16): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne(_, featureDim)))
  }

  /** Asset → ANN-ready embedding rows (path, modality, features):
    * [[decodeBatch]]'s feature column ([[lumaGridQ]] for really-decoded
    * images, [[byteMomentsQ]] otherwise) with zero-norm vectors DROPPED
    * — an all-zero centered vector (uniform content) has no direction,
    * and letting it reach a cosine join would divide by zero on both
    * engines. The output feeds every embedding operator in
    * [[graft.ops.Similarity]] unchanged: exact pairs, the LSH-bucketed
    * near-dup scale path, IVF indexes. Bytes are dropped in the SAME
    * projection, so only (path, modality, dim floats) ever rides an
    * Exchange — the asset-payload pruning discipline the pipeline
    * queries pin. */
  def assetEmbeddings(assets: Dataset[RawAsset],
                      featureDim: Int = 16): DataFrame =
    decodeBatch(assets, featureDim).toDF()
      .select(col("path"), col("modality"), col("features"))
      .filter(expr("exists(features, x -> x != 0)"))

  /** 64-bit difference hash (dHash) over a decoded raster: grayscale
    * box-downsample to a 9×8 grid, bit (y·8 + x) set iff cell (x+1, y)
    * is brighter than cell (x, y). The CONTENT-level image fingerprint:
    * stable across re-encoding (PNG vs BMP vs JPEG quality — md5 differs,
    * the pixels' gradient structure doesn't) and monotone brightness
    * shifts, so near-identical images land within a small Hamming
    * radius. Deterministic: integer pixel sums per cell, one double
    * division per cell, no resampling-kernel dependence (the 9×8 cells
    * partition the raster by integer index arithmetic — no interpolation
    * library whose rounding could differ across platforms). */
  private[multimodal] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val cell = Array.ofDim[Double](gh, gw)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.min(h, math.max((cy + 1) * h / gh, y0 + 1))
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.min(w, math.max((cx + 1) * w / gw, x0 + 1))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        cell(cy)(cx) = sum.toDouble / ((x1 - x0).toLong * (y1 - y0) * 3)
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var by = 0
    while (by < gh) {
      var bx = 0
      while (bx < 8) {
        if (cell(by)(bx + 1) > cell(by)(bx)) bits |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    bits
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** Fingerprint one asset for content-level dedup. Image payloads that
    * really decode get the perceptual [[dHash64]] (`fp_kind = "dhash"`);
    * everything else gets the byte-exact md5 (`fp_kind = "md5"` — the
    * same value any SQL engine's `md5()` computes, which is what lets
    * q123 carry a full DuckDB oracle over synthesized non-image
    * payloads). `fp_bits` carries the dHash (or the md5's first 64 bits)
    * as a long so Hamming distance is one `bit_count(a XOR b)`. */
  private[multimodal] def fingerprintOne(a: RawAsset): AssetFingerprint = {
    val img: Option[java.awt.image.BufferedImage] =
      if (a.modality == "image" && looksLikeImage(a.content)) {
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.content)))
        catch { case _: java.io.IOException => None }
      } else None
    img match {
      case Some(i) =>
        val d = dHash64(i)
        AssetFingerprint(a.path, a.modality, a.length, "dhash", f"$d%016x", d)
      case None =>
        val m = java.security.MessageDigest.getInstance("MD5").digest(a.content)
        AssetFingerprint(a.path, a.modality, a.length, "md5", hex(m),
          java.lang.Long.parseUnsignedLong(hex(m).substring(0, 16), 16))
    }
  }

  /** Partition-batched fingerprinting — same streaming shape as
    * [[decodeBatch]]. */
  def fingerprintAssets(assets: Dataset[RawAsset]): Dataset[AssetFingerprint] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(fingerprintOne))
  }

  /** Duplicate-asset pairs over [[fingerprintAssets]] output: dhash
    * fingerprints pair within `maxHamming` bits; md5 fingerprints pair
    * only on full byte-exact equality. The candidate join is the
    * SimHash 4×16-bit banding (pigeonhole: Hamming ≤ 3 ⇒ at least one
    * of 4 bands equal), so candidate generation is complete for
    * maxHamming ≤ 3 and NEVER all-pairs — each asset meets only assets
    * sharing a band bucket, the same inverted-index discipline as the
    * text dedup family. Output: (path_a, path_b, fp_kind, hamming),
    * path_a < path_b. */
  def assetDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding is complete only for Hamming <= 3, got $maxHamming")
    val bands = array((0 until 4).map(i =>
      shiftrightunsigned(col("fp_bits"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    val banded = fps.select(col("path"), col("fp_kind"), col("fingerprint"),
        col("fp_bits"), posexplode(bands).as(Seq("band", "band_bits")))
    banded.as("a").join(banded.as("b"),
        col("a.fp_kind") === col("b.fp_kind") &&
          col("a.band") === col("b.band") &&
          col("a.band_bits") === col("b.band_bits") &&
          col("a.path") < col("b.path"))
      .filter( // verify: bit radius for dhash, byte-exact for md5
        (col("a.fp_kind") === "dhash" &&
          bit_count(col("a.fp_bits").bitwiseXOR(col("b.fp_bits"))) <= maxHamming) ||
        (col("a.fp_kind") === "md5" &&
          col("a.fingerprint") === col("b.fingerprint")))
      .select(col("a.path").as("path_a"), col("b.path").as("path_b"),
        col("a.fp_kind").as("fp_kind"),
        bit_count(col("a.fp_bits").bitwiseXOR(col("b.fp_bits")))
          .cast("int").as("hamming"))
      .distinct() // a pair may collide in several bands
  }

  /** "Resize" = typed-metadata transform (a real resize would re-encode
    * bytes inside the stub boundary): clamps decoded dims to a max edge,
    * preserving aspect ratio. Pure expression — no UDF. */
  /** REAL pixel thumbnail for the formats the JDK decodes (same codec
    * boundary as [[decodeOne]]): decode, nearest-neighbor downscale to
    * fit (maxW, maxH) preserving aspect, re-encode PNG. Nearest
    * neighbor by exact integer index mapping (src = out·srcDim div
    * outDim) — no interpolation kernel whose platform rounding could
    * differ, the dHash discipline applied to resampling. Payloads the
    * sniff rejects (or non-images) emit `ok = false` with empty bytes:
    * a resize of a fake would be fake — [[resizeMeta]] is the
    * metadata-level planner for those. */
  private[multimodal] def thumbnailOne(a: RawAsset, maxW: Int, maxH: Int)
      : Thumbnail = {
    val img =
      if (a.modality == "image" && looksLikeImage(a.content)) {
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.content)))
        catch { case _: java.io.IOException => None }
      } else None
    img match {
      case Some(i) =>
        val w = i.getWidth; val h = i.getHeight
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val tw = math.max(1, math.round(w * scale).toInt)
        val th = math.max(1, math.round(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < th) {
          val sy = (y.toLong * h / th).toInt
          var x = 0
          while (x < tw) {
            out.setRGB(x, y, i.getRGB((x.toLong * w / tw).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Thumbnail(a.path, a.modality, ok = true, tw, th, bos.toByteArray)
      case None =>
        Thumbnail(a.path, a.modality, ok = false, 0, 0, Array.emptyByteArray)
    }
  }

  /** Partition-batched real thumbnails — the derived-asset leg of the
    * pipeline ([[decodeBatch]] extracts features, this materializes the
    * downscaled binary for preview/training-resolution use). */
  def thumbnailBatch(assets: Dataset[RawAsset],
                     maxW: Int = 256, maxH: Int = 256): Dataset[Thumbnail] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(thumbnailOne(_, maxW, maxH)))
  }

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
