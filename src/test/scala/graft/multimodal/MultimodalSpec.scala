package graft.multimodal

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("assets")
    Files.write(d.resolve("a.jpg"), Array.tabulate(300)(i => (i % 251).toByte))
    Files.write(d.resolve("b.jpg"), Array.tabulate(300)(i => (i % 251).toByte)) // dup of a
    Files.write(d.resolve("c.wav"), Array.tabulate(500)(i => ((i * 7) % 256).toByte))
    Files.write(d.resolve("d.bin"), Array[Byte](1, 2, 3))
    d
  }

  test("real image decode: committed PNG fixture yields pixel-truth metadata") {
    // fixtures/assets/tiny.png: 3x2 RGB — row0 (255,0,0)(0,255,0)(0,0,255),
    // row1 (255,255,255)(0,0,0)(128,128,128); mean luminance = 638/6
    val assets = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec = Multimodal.decodeBatch(assets, featureDim = 8).collect()
      .find(_.path.endsWith("tiny.png")).get
    assert(dec.modality === "image")
    assert(dec.width === 3 && dec.height === 2 && dec.channels === 3)
    assert(math.abs(dec.brightness - 638.0 / 6.0) < 1e-9, dec.brightness)
    // REAL feature vector: lumaGridQ at dim 8 = a 1x8 strip grid. On a
    // 3px-wide image the integer cell bounds map strips {0,1,2}->col0,
    // {3,4,5}->col1, {6,7}->col2. Column luma sums: col0 = 255+765,
    // col1 = 255+0, col2 = 255+384 over 2px*3ch; overall mean
    // 1914*10^4/18 = 1063333. Centered quantized means, by hand:
    assert(dec.features.toSeq === Seq(636667f, 636667f, 636667f,
      -638333f, -638333f, -638333f, 1667f, 1667f))
  }

  test("real PCM WAV parse: committed fixture yields sample-truth audio metadata") {
    // fixtures/assets/tone.wav: 16-bit stereo 8 kHz, 4000 frames of the
    // repeating samples (16384,-16384)(0,32767)(-32768,8192)(4096,-4096)
    val assets = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec = Multimodal.decodeBatch(assets, featureDim = 8).collect()
      .find(_.path.endsWith("tone.wav")).get
    assert(dec.modality === "audio")
    assert(dec.channels === 2)
    assert(dec.sampleRateHz === 8000)
    assert(dec.durationMs === 500L)
    assert(math.abs(dec.brightness - 0.4374961853027344) < 1e-12, dec.brightness)
  }

  test("real MP4 container parse: committed fixture yields mvhd/tkhd truth") {
    // fixtures/assets/clip.mp4: ftyp + moov(mvhd timescale 1000,
    // duration 7500; trak/tkhd 640x360 as 16.16 fixed) + empty mdat
    val assets = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec = Multimodal.decodeBatch(assets, featureDim = 8).collect()
      .find(_.path.endsWith("clip.mp4")).get
    assert(dec.modality === "video")
    assert(dec.width === 640 && dec.height === 360)
    assert(dec.durationMs === 7500L)
    assert(dec.sampleRateHz === 0)
  }

  test("non-RIFF audio bytes fall back to the deterministic fake (c.wav ramp)") {
    val assets = Multimodal.readAssets(spark, dir.toString)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec = Multimodal.decodeBatch(assets, featureDim = 8).collect()
      .find(_.path.endsWith("c.wav")).get
    assert(dec.modality === "audio")
    assert(dec.sampleRateHz === 0 && dec.durationMs === 0L)
    val expected = Array.tabulate(500)(i => ((i * 7) % 256) & 0xff)
      .map(_.toDouble).sum / 500
    assert(math.abs(dec.brightness - expected) < 1e-9)
  }

  test("malformed containers terminate and fall back (adversarial chunk sizes)") {
    def decode(name: String, bytes: Array[Byte]): DecodedAsset = {
      val modality = if (name.endsWith(".wav")) "audio" else "video"
      Multimodal.decodeBatch(
        Seq(RawAsset(name, modality, bytes.length.toLong, bytes)).toDS(),
        featureDim = 8).collect().head
    }
    // RIFF/WAVE whose first chunk claims size 0xFFFFFFFF (negative as
    // Int): the walk must bail, not loop or scan backwards
    val evilWav = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++
      "WAVE".getBytes ++ "JUNK".getBytes ++
      Array[Byte](-1, -1, -1, -1) ++ Array.fill[Byte](32)(7)
    val w = decode("evil.wav", evilWav)
    assert(w.sampleRateHz === 0 && w.durationMs === 0L) // fake path
    // truncated WAV header (RIFF magic only)
    val t = decode("trunc.wav", "RIFF1234WAVE".getBytes)
    assert(t.sampleRateHz === 0)
    // MP4 ftyp followed by a box claiming a huge size
    val evilMp4 = Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes ++
      "isom".getBytes ++ Array[Byte](0, 0, 2, 0) ++
      Array[Byte](-1, -1, -1, -1) ++ "moov".getBytes ++ Array.fill[Byte](16)(3)
    val v = decode("evil.mp4", evilMp4)
    assert(v.durationMs === 0L) // fake path, bounded walk
  }

  test("non-image bytes with an image extension fall back to the deterministic fake") {
    // a.jpg's payload is a byte ramp, not a JPEG: the magic-byte sniff
    // must route it to the stub, not an ImageIO error
    val assets = Multimodal.readAssets(spark, dir.toString)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec = Multimodal.decodeBatch(assets, featureDim = 8).collect()
      .find(_.path.endsWith("a.jpg")).get
    assert(dec.modality === "image")
    val expected = Array.tabulate(300)(i => (i % 251) & 0xff)
      .map(_.toDouble).sum / 300
    assert(math.abs(dec.brightness - expected) < 1e-9)
  }

  test("binaryFile ingest: modality from extension, opaque bytes + length") {
    val df = Multimodal.readAssets(spark, dir.toString)
    val m = df.select("modality").as[String].collect().sorted.toSeq
    assert(m === Seq("audio", "binary", "image", "image"))
    assert(df.filter(col("modality") === "audio").select("length").as[Long].head() === 500)
  }

  test("byte-statistics decode: deterministic, batch-shaped, fixed-dim features") {
    val assets = Multimodal.readAssets(spark, dir.toString)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val dec1 = Multimodal.decodeBatch(assets, featureDim = 8).collect().sortBy(_.path)
    val dec2 = Multimodal.decodeBatch(assets, featureDim = 8).collect().sortBy(_.path)
    assert(dec1.map(_.features.toSeq).toSeq === dec2.map(_.features.toSeq).toSeq)
    assert(dec1.forall(_.features.length === 8))
    // identical bytes → identical decode (the dedup hook)
    val img = dec1.filter(_.modality == "image")
    assert(img(0).features.toSeq === img(1).features.toSeq)
    assert(img(0).brightness === img(1).brightness)
    // image fallback reports 3 channels, audio 1
    assert(img.forall(_.channels === 3))
    assert(dec1.find(_.modality == "audio").get.channels === 1)
  }

  test("decoded features feed the ANN operators (embedding-column shape)") {
    val assets = Multimodal.readAssets(spark, dir.toString)
      .select(col("path"), col("modality"), col("length"), col("content")).as[RawAsset]
    val emb = Multimodal.decodeBatch(assets, featureDim = 8)
      .select(xxhash64(col("path")).as("vec_id"), col("features").as("embedding"))
    val dupes = Similarity.cosineNearDupPairs(emb.toDF(), "vec_id", "embedding",
      threshold = 0.9999, nBits = 2)
    assert(dupes.count() >= 1) // the two identical jpgs collide at cosine 1
  }

  test("resizeMeta clamps to max edge preserving aspect; frame sampling spacing") {
    val meta = Seq((1000, 500), (100, 50)).toDF("width", "height")
    val out = Multimodal.resizeMeta(meta, 200)
      .as[(Int, Int)].collect().toSeq
    assert(out === Seq((200, 100), (100, 50)))
    val frames = Seq(10000L).toDF("dur")
      .select(Multimodal.frameSampleOffsets(col("dur"), 2500L).as("f"))
      .as[Seq[Long]].head()
    assert(frames === Seq(0L, 2500L, 5000L, 7500L))
  }

  // ---- real image feature vectors (lumaGridQ) ----

  private def fixtureAssets = Multimodal.readAssets(spark,
      new java.io.File("fixtures/assets").getAbsolutePath)
    .select(col("path"), col("modality"), col("length"), col("content"))
    .as[RawAsset]

  private def cosOf(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = a.map(x => x.toDouble * x).sum
    val nb = b.map(x => x.toDouble * x).sum
    if (na == 0.0 || nb == 0.0) Double.NaN else dot / math.sqrt(na * nb)
  }

  test("real image features: lumaGridQ is raster truth — PNG ≡ BMP, exact-scaled copy keeps direction") {
    val feats = Multimodal.decodeBatch(fixtureAssets, featureDim = 16)
      .collect().map(d => d.path.split('/').last -> d.features).toMap
    // same raster, different container: identical 16-dim vectors
    assert(feats("grad.png").toSeq === feats("grad.bmp").toSeq)
    // every component is an exact integer riding the Float exactly
    assert(feats("grad.png").forall(f => f == math.rint(f) && math.abs(f) < (1 << 24)))
    // grad_dim = grad x 4/5 exactly: centering removes the scale, the
    // direction survives quantization
    assert(cosOf(feats("grad.png"), feats("grad_dim.png")) > 0.999)
    // a structurally different image does not ride the same direction
    val cChecker = cosOf(feats("grad.png"), feats("checker.png"))
    if (cChecker.isNaN) {
      // degenerate uniform cell means → zero vector → assetEmbeddings drops it
      assert(Multimodal.assetEmbeddings(
        fixtureAssets.filter(_.path.endsWith("checker.png")), 16).count() === 0L)
    } else assert(cChecker < 0.999, s"checker cosine $cChecker")
  }

  test("byteMomentsQ: exact centered residue-class means; zero-norm vectors dropped by assetEmbeddings") {
    assert(Multimodal.byteMomentsQ(Array[Byte](1, 2, 3), 8).toSeq ===
      Seq(-10000f, 0f, 10000f, 0f, 0f, 0f, 0f, 0f))
    // plain-Scala reference equivalence on seeded random payloads
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val bytes = Array.fill(rnd.nextInt(200) + 1)(rnd.nextInt(256).toByte)
      val got = Multimodal.byteMomentsQ(bytes, 16)
      val L = bytes.length
      val dm = bytes.map(b => (b & 0xff).toLong).sum * 10000L / L
      val want = (0 until 16).map { i =>
        val cls = bytes.indices.filter(_ % 16 == i).map(j => (bytes(j) & 0xff).toLong)
        if (cls.isEmpty) 0f else (cls.sum * 10000L / cls.size - dm).toFloat
      }
      assert(got.toSeq === want, s"seed=$seed")
    }
    // a uniform payload centers to the zero vector and must not reach
    // a cosine join (division by zero on both engines)
    val uni = Seq(RawAsset("u", "binary", 4L, Array[Byte](65, 65, 65, 65)),
      RawAsset("v", "binary", 3L, Array[Byte](1, 2, 3))).toDS()
    val kept = Multimodal.assetEmbeddings(uni, 8)
      .select("path").as[String].collect()
    assert(kept.toSeq === Seq("v"))
  }

  test("asset embeddings feed the LSH near-dup scale path: sound vs exact, complete on identical vectors") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog", // byte-identical dup
      "completely different payload with other bytes 123456",
      "zzz yyy xxx www vvv uuu ttt sss qqq ppp ooo").zipWithIndex
      .map { case (t, i) =>
        RawAsset(i.toString, "binary", t.length.toLong, t.getBytes("UTF-8")) }
    val emb = Multimodal.assetEmbeddings(docs.toDS(), 16)
      .select(col("path").cast("long").as("vec_id"),
        col("features").as("embedding"))
    val (lsh, vecs) = graft.ops.Staged.withStaged {
      (Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
         threshold = 0.9, nBits = 4, nTables = 2)
         .as[(Long, Long, Double)].collect().toSet,
       emb.as[(Long, Array[Float])].collect().toSeq)
    }
    val exact = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      c = cosOf(va, vb) if !c.isNaN && math.rint(c * 10000) / 10000 >= 0.9
    } yield (ia, ib)).toSet
    // sound: the exact verify filter makes every LSH pair a true pair
    assert(lsh.map(p => (p._1, p._2)).subsetOf(exact))
    // complete on identical vectors: angle 0 always shares every bucket
    assert(lsh.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
  }

  // ---- perceptual fingerprints (dHash) over the REAL decode path ----

  private def fixtureFingerprints: Map[String, AssetFingerprint] = {
    val assets = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    Multimodal.fingerprintAssets(assets).collect()
      .map(f => f.path.substring(f.path.lastIndexOf('/') + 1) -> f).toMap
  }

  test("dHash: same raster under PNG and BMP encodings collides; md5 differs") {
    val fp = fixtureFingerprints
    val png = fp("grad.png"); val bmp = fp("grad.bmp")
    assert(png.fp_kind === "dhash" && bmp.fp_kind === "dhash")
    assert(png.fingerprint === bmp.fingerprint) // content-identical
    // the BYTES differ — md5 dedup (q22/q123's md5 branch) can't see this pair
    val md5 = (b: Array[Byte]) =>
      java.security.MessageDigest.getInstance("MD5").digest(b).toSeq
    val bytes = Files.readAllBytes _
    assert(md5(bytes(java.nio.file.Paths.get("fixtures/assets/grad.png"))) !==
           md5(bytes(java.nio.file.Paths.get("fixtures/assets/grad.bmp"))))
  }

  test("dHash: exact 0.8x brightness scaling preserves every gradient sign") {
    // grad_dim.png's pixels are grad.png's times 4/5 EXACTLY (all values
    // are multiples of 5), so each 9x8 cell mean scales exactly and no
    // comparison flips: hashes are bit-identical, not merely close
    val fp = fixtureFingerprints
    assert(fp("grad_dim.png").fingerprint === fp("grad.png").fingerprint)
  }

  test("dHash: a structurally different image is far in Hamming distance") {
    val fp = fixtureFingerprints
    val d = java.lang.Long.bitCount(fp("grad.png").fp_bits ^ fp("checker.png").fp_bits)
    assert(d > 3, s"hamming=$d")
  }

  test("assetDupPairs: banded Hamming join pairs the re-encodes, not the checkerboard") {
    val fp = fixtureFingerprints
    val fps = fp.values.toSeq.toDS().toDF()
    val pairs = Multimodal.assetDupPairs(fps, maxHamming = 3)
      .collect()
      .map(r => (r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1),
                 r.getString(1).substring(r.getString(1).lastIndexOf('/') + 1)))
      .toSet
    val grads = Set("grad.png", "grad.bmp", "grad_dim.png")
    val gradPairs = pairs.filter(p => grads(p._1) || grads(p._2))
    assert(gradPairs.size === 3) // all three mutual pairs, ordered path_a < path_b
    assert(gradPairs.forall(p => grads(p._1) && grads(p._2)))
    assert(!pairs.exists(p => p._1.contains("checker") || p._2.contains("checker")))
  }

  test("fingerprint fallback: non-decodable payloads get the byte-exact md5 kind") {
    val a = RawAsset("x", "binary", 3L, Array[Byte](1, 2, 3))
    val f = Multimodal.fingerprintOne(a)
    assert(f.fp_kind === "md5")
    assert(f.fingerprint === "5289df737df57326fcdd22597afb1fac") // md5(0x010203)
    assert(f.fp_bits === java.lang.Long.parseUnsignedLong("5289df737df57326", 16))
    // an image-extension payload that fails the sniff also falls back
    val fake = RawAsset("y.png", "image", 4L, Array[Byte](9, 9, 9, 9))
    assert(Multimodal.fingerprintOne(fake).fp_kind === "md5")
  }

  test("real thumbnails: exact nearest-neighbor pixels, aspect-preserving fit, identity, and honest non-image refusal") {
    def rgb(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      img.getRGB(x, y) & 0xffffff
    val assets = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset]
    val thumbs = Multimodal.thumbnailBatch(assets, maxW = 2, maxH = 2)
      .collect().map(t => t.path.split('/').last -> t).toMap
    // tiny.png 3x2 → scale 2/3 → 2x1; nearest picks source (0,0) and (1,0)
    val tiny = thumbs("tiny.png")
    assert(tiny.ok && tiny.width === 2 && tiny.height === 1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(tiny.png))
    assert(img.getWidth === 2 && img.getHeight === 1)
    assert(rgb(img, 0, 0) === 0xff0000 && rgb(img, 1, 0) === 0x00ff00)
    // non-images refuse honestly instead of faking pixels
    assert(!thumbs("tone.wav").ok && thumbs("tone.wav").png.isEmpty)
    assert(!thumbs("clip.mp4").ok)
    // identity fit: bounds larger than the raster keep dims and pixels
    val one = Multimodal.readAssets(spark,
        new java.io.File("fixtures/assets").getAbsolutePath)
      .select(col("path"), col("modality"), col("length"), col("content"))
      .as[RawAsset].filter(_.path.endsWith("tiny.png"))
    val full = Multimodal.thumbnailBatch(one, maxW = 10, maxH = 10).collect().head
    assert(full.width === 3 && full.height === 2)
    val fimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(full.png))
    assert(rgb(fimg, 2, 1) === 0x808080)
    // thumbnails are themselves decodable assets: the pipeline composes
    val reDecoded = Multimodal.decodeBatch(
      Multimodal.thumbnailBatch(one, 2, 2)
        .map(t => RawAsset(t.path, "image", t.png.length.toLong, t.png)),
      featureDim = 4).collect().head
    assert(reDecoded.width === 2 && reDecoded.height === 1)
  }
}
