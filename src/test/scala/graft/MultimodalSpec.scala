package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (0L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
    (1L, "audio", "fake-wav-bytes-bbbbbb".getBytes("UTF-8")),
    (2L, "video", "fake-mp4-bytes-cccccccc".getBytes("UTF-8")))
    .toDF("media_id", "media_type", "content")

  test("decode stub: deterministic, batched, 16-dim features") {
    val a = Multimodal.decodeStub(media).orderBy("media_id").collect()
    val b = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 3)
    val feat = a.head.getAs[scala.collection.Seq[Float]]("feature")
    assert(feat.length == 16)
    assert(math.abs(feat.sum - 1.0f) < 1e-5) // L1-normalized histogram
    assert(a(2).getAs[Int]("n_frames") >= 1)  // video gets frames
  }

  test("decode: real JDK codecs for PNG and WAV, stub fallback for the rest") {
    // real 20x10 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 10 until 20) img.setRGB(x, y, 0xFFFFFF)
    val pngOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngOut))
    // real WAV: 8000 Hz mono PCM, 4000 frames = 500 ms
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](4000 * 2)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4000),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)

    val mixed = Seq(
      (0L, "image", pngOut.toByteArray),
      (1L, "audio", wavOut.toByteArray),
      (2L, "image", "not an image at all".getBytes("UTF-8")), // corrupt
      (3L, "video", "fake-mp4".getBytes("UTF-8")))            // no JDK codec
      .toDF("media_id", "media_type", "content")
    val rows = Multimodal.decode(mixed).orderBy("media_id").collect()

    val png = rows(0)
    assert(png.getAs[Boolean]("decoded"))
    assert(png.getAs[Int]("width") == 20 && png.getAs[Int]("height") == 10)
    // half black, half white pixels -> mass at both histogram ends
    val hist = png.getAs[scala.collection.Seq[Float]]("feature")
    assert(math.abs(hist.head - 0.5f) < 0.1f && math.abs(hist.last - 0.5f) < 0.1f)

    val wav = rows(1)
    assert(wav.getAs[Boolean]("decoded"))
    assert(wav.getAs[Int]("sample_rate") == 8000)
    assert(wav.getAs[Long]("duration_ms") == 500L)

    // corrupt image and video fall back to the stub, never fail the task
    assert(!rows(2).getAs[Boolean]("decoded"))
    assert(!rows(3).getAs[Boolean]("decoded"))
    assert(rows(3).getAs[Int]("n_frames") >= 1)
  }

  test("media features feed the similarity-search path end to end") {
    // decode -> 16-dim feature column -> exact top-k: media similarity
    // search runs on the SAME operators as text embeddings (no special
    // media path needed; the feature is just another vector column).
    val feats = Multimodal.decodeStub(media)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val near = graft.operators.Knn.cosineTopK(feats,
      graft.operators.Knn.queryVector(feats, 0L), k = 2)
      .as[(Long, Double)].collect()
    assert(near.length == 2)
    // cosine self-similarity = 1.0 ranks first
    assert(near.head._1 == 0L && math.abs(near.head._2 - 1.0) < 1e-6)
    assert(near.head._2 >= near(1)._2)
  }

  test("byte stats are pure column expressions") {
    val out = media.select(
      Multimodal.sizeBytes(col("content")).as("sz"),
      Multimodal.contentDigest(col("content")).as("d"))
      .as[(Int, String)].collect()
    assert(out(0)._1 == 19)
    assert(out.map(_._2).distinct.length == 3)
  }

  test("resize preserves aspect ratio and never upscales") {
    val df = Seq((1024, 512), (100, 50)).toDF("w", "h")
    val (nw, nh) = Multimodal.resizeMeta(col("w"), col("h"), 256)
    val r = df.select(nw.as("nw"), nh.as("nh")).as[(Int, Int)].collect()
    assert(r(0) == ((256, 128)))
    assert(r(1) == ((100, 50)))
  }

  test("frame sampling indices") {
    val df = Seq(10, 1, 0).toDF("n")
    val r = df.select(Multimodal.frameSampleIndices(col("n"), 4).as("idx"))
      .as[Seq[Int]].collect()
    assert(r(0) == Seq(0, 4, 8))
    assert(r(1) == Seq(0))
    assert(r(2) == Seq.empty)
  }

  // ---- perceptual hash (dHash) near-dup tier --------------------------

  /** Independent dHash reference: a straight re-derivation of the spec
    * ("bit r*8+c set iff grid[r][c+1] > grid[r][c]") so the expression
    * is checked against the definition, not against itself. */
  private def refDhash(grid: Seq[Int]): Long =
    (for (r <- 0 until 8; c <- 0 until 8
          if grid(r * 9 + c + 1) > grid(r * 9 + c))
      yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)

  /** Deterministic pseudo-random pixels (values 0..255). */
  private def pix(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => math.floorMod(seed * 2654435761L.toInt + i * 40503, 256))

  test("phash64: PNG round-trip of a 9x8 image hashes to the reference dHash") {
    val grids = Seq(pix(1, 72), pix(2, 72), pix(3, 72))
    val df = grids.zipWithIndex
      .map { case (g, i) => (i.toLong, Multimodal.grayPng(g, 9, 8)) }
      .toDF("id", "content")
    val got = df.select(col("id"), Multimodal.phash64(col("content")).as("ph"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == grids.map(g => refDhash(g.toSeq)))
  }

  test("phash64: block-averaged upscale hashes identically to the 9x8 original") {
    // 36x32 with constant 4x4 blocks == the 9x8 block values: the
    // integer block-average must reduce it to exactly the same grid.
    val grid = pix(7, 72)
    val big = Array.tabulate(36 * 32) { i =>
      val (x, y) = (i % 36, i / 36)
      grid((y / 4) * 9 + (x / 4))
    }
    val df = Seq(
      (0L, Multimodal.grayPng(grid, 9, 8)),
      (1L, Multimodal.grayPng(big, 36, 32))).toDF("id", "content")
    val hs = df.select(Multimodal.phash64(col("content"))).as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) == refDhash(grid))
  }

  test("phash64: corrupt bytes and sub-grid images are absent, not errors") {
    val df = Seq(
      (0L, "definitely not a png".getBytes("UTF-8")),
      (1L, Multimodal.grayPng(pix(4, 16), 4, 4)), // smaller than the 9x8 grid
      (2L, Multimodal.grayPng(pix(5, 72), 9, 8)))
      .toDF("id", "content")
    val ok = df.select(col("id"), Multimodal.phash64(col("content")).as("ph"))
      .filter(col("ph").isNotNull).as[(Long, Long)].collect()
    assert(ok.map(_._1).toSeq == Seq(2L))
  }

  test("phashPairs: near-identical images pair, distinct images don't") {
    val base = pix(11, 72)
    // one-block edit: +25 luminance on a single cell flips at most 2
    // dHash bits (its two adjacent comparisons)
    val variant = base.updated(31, math.min(base(31) + 25, 255))
    val distinct = pix(99, 72)
    // render at different sizes: near-dup detection must survive resize
    def up(g: Array[Int], fx: Int, fy: Int): Array[Int] =
      Array.tabulate(9 * fx * 8 * fy) { i =>
        val (x, y) = (i % (9 * fx), i / (9 * fx))
        g((y / fy) * 9 + x / fx)
      }
    val df = Seq(
      (0L, Multimodal.grayPng(base, 9, 8)),
      (1L, Multimodal.grayPng(up(variant, 4, 4), 36, 32)),
      (2L, Multimodal.grayPng(distinct, 9, 8)),
      (3L, "corrupt".getBytes("UTF-8")))
      .toDF("id", "content")
    val pairs = Multimodal.phashPairs(df, "id", "content", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(pairs.head._3 <= 2)
  }

  test("phash64 is callable from SQL via GraftExtensions") {
    GraftExtensions.install(spark)
    val df = Seq((0L, Multimodal.grayPng(pix(6, 72), 9, 8))).toDF("id", "content")
    df.createOrReplaceTempView("phash_media")
    val viaSql = spark.sql("SELECT phash64(content) AS ph FROM phash_media")
      .as[Long].head()
    assert(viaSql == refDhash(pix(6, 72)))
  }

  test("resizeImages: exact block-average downscale, PNG round-trip, absent arms") {
    val grid = pix(21, 72) // 9x8
    val df = Seq(
      (0L, Multimodal.grayPng(grid, 9, 8)),
      (1L, "not an image".getBytes("UTF-8")),
      (2L, Multimodal.grayPng(pix(22, 4), 2, 2))) // smaller than target
      .toDF("id", "content")
    val out = Multimodal.resizeImages(df, "id", "content", targetW = 3, targetH = 4)
      .orderBy("id").collect()
    assert(out(1).isNullAt(1) && out(2).isNullAt(1)) // corrupt + too-small absent
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]]("resized")))
    assert(img.getWidth == 3 && img.getHeight == 4)
    // reference block-average: target (c, r) = floor(sum of 3x2 block / 6)
    for (r <- 0 until 4; c <- 0 until 3) {
      val want = (for (y <- r * 2 until r * 2 + 2; x <- c * 3 until c * 3 + 3)
        yield grid(y * 9 + x)).sum / 6
      assert((img.getRGB(c, r) & 0xff) == want, s"block ($c,$r)")
    }
  }

  test("resizeImages: id column is generic, not Long-only (path-keyed media works)") {
    val byPath = Seq(("a/img.png", Multimodal.grayPng(pix(23, 72), 9, 8)))
      .toDF("path", "content")
    val out = Multimodal.resizeImages(byPath, "path", "content", targetW = 3, targetH = 4)
      .collect()
    assert(out.head.getString(0) == "a/img.png" && !out.head.isNullAt(1))
  }

  // ---- audio fingerprint near-dup tier --------------------------------

  /** Independent fingerprint reference: a straight re-derivation of
    * the spec (block (f,b) covers [(f*9+b)*n/81, (f*9+b+1)*n/81),
    * E = sum of squares, bit (f-1)*8+b set iff the band-delta grew vs
    * the previous frame) so the expression is checked against the
    * definition, not against itself. */
  private def refAudioFp(s: Seq[Int]): Long = {
    val n = s.length
    val e = Array.tabulate(81) { k =>
      ((k.toLong * n / 81).toInt until ((k + 1).toLong * n / 81).toInt)
        .map(i => s(i).toLong * s(i)).sum
    }
    (for (f <- 1 until 9; b <- 0 until 8
          if (e(f * 9 + b) - e(f * 9 + b + 1)) >
            (e((f - 1) * 9 + b) - e((f - 1) * 9 + b + 1)))
      yield 1L << ((f - 1) * 8 + b)).foldLeft(0L)(_ | _)
  }

  /** Deterministic pseudo-random samples in [-2000, 2000]. */
  private def aud(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => math.floorMod(seed * 2654435761L.toInt + i * 40503, 4001) - 2000)

  test("audio_fp64: WAV round-trip fingerprints to the reference derivation") {
    // 1296 (divisible by 81) and 1000 (ragged block boundaries)
    val signals = Seq(aud(1, 1296), aud(2, 1296), aud(3, 1000))
    val df = signals.zipWithIndex
      .map { case (s, i) => (i.toLong, Multimodal.pcmWav(s)) }
      .toDF("id", "content")
    val got = df.select(col("id"), Multimodal.audioFp64(col("content")).as("fp"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == signals.map(s => refAudioFp(s.toSeq)))
  }

  test("audio_fp64: corrupt, non-mono, 8-bit and too-short inputs are absent") {
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val out8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](200)), fmt8, 200),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out8)
    val fmtStereo = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val outSt = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](800)), fmtStereo, 200),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, outSt)
    val df = Seq(
      (0L, "definitely not a wav".getBytes("UTF-8")),
      (1L, out8.toByteArray),                       // 8-bit
      (2L, outSt.toByteArray),                      // stereo
      (3L, Multimodal.pcmWav(aud(4, 80))),          // < 81 samples
      (4L, Multimodal.pcmWav(aud(5, 81))))          // exactly the minimum
      .toDF("id", "content")
    val ok = df.select(col("id"), Multimodal.audioFp64(col("content")).as("fp"))
      .filter(col("fp").isNotNull).as[(Long, Long)].collect()
    assert(ok.map(_._1).toSeq == Seq(4L))
    assert(ok.head._2 == refAudioFp(aud(5, 81).toSeq))
  }

  test("audioFpPairs: near-identical audio pairs, distinct audio doesn't") {
    val base = aud(11, 1296)
    // one-sample edit inside block (frame 0, band 8): that energy only
    // feeds bit (1,7) through the previous-frame term, so the variant
    // is within Hamming distance 1 of the original
    val variant = base.updated(130, math.min(base(130) + 900, 2000))
    val distinct = aud(99, 1296)
    val df = Seq(
      (0L, Multimodal.pcmWav(base)),
      (1L, Multimodal.pcmWav(variant)),
      (2L, Multimodal.pcmWav(distinct)),
      (3L, "corrupt".getBytes("UTF-8")))
      .toDF("id", "content")
    val pairs = Multimodal.audioFpPairs(df, "id", "content", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(pairs.head._3 <= 1)
  }

  test("property: WAV round-trip fingerprint == reference at arbitrary lengths") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val params = for {
      seed <- Gen.chooseNum(1, 1000000)
      n <- Gen.chooseNum(81, 3000) // incl. many non-divisible-by-81 lengths
    } yield (seed, n)
    val prop = Prop.forAll(params) { case (seed, n) =>
      val s = aud(seed, n)
      // direct function call: the Spark plumbing is covered above, the
      // property targets the decode + block-boundary + bit-fold math
      graft.functions.expressions.AudioFp64.hash(Multimodal.pcmWav(s))
        .contains(refAudioFp(s.toSeq))
    }
    val r = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("audio_fp64 is callable from SQL via GraftExtensions") {
    GraftExtensions.install(spark)
    val df = Seq((0L, Multimodal.pcmWav(aud(6, 1296)))).toDF("id", "content")
    df.createOrReplaceTempView("audio_media")
    val viaSql = spark.sql("SELECT audio_fp64(content) AS fp FROM audio_media")
      .as[Long].head()
    assert(viaSql == refAudioFp(aud(6, 1296).toSeq))
  }

  test("phash fixture: every cluster's diameter stays < 8 (clusters-oracle invariant)") {
    // The dedup_phash_clusters DuckDB oracle runs exactly 8 rounds of
    // plain min-label propagation, which computes true components only
    // while the fixture's pair graph has no component of diameter >= 8.
    // Pin that to the generator so a future fixture change can't make
    // the oracle silently wrong (it would stay green on Spark's side —
    // hammingClusters converges regardless — while the oracle truncates).
    val media = EntryFixtures.phashFixtureMedia(spark, "/root/testdata/sf0.001")
    val pairs = Multimodal.phashPairs(media, "id", "content", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def eccentricity(start: Long): Int = {
      var frontier = Set(start); var seen = Set(start); var d = 0
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- seen
        if (next.nonEmpty) d += 1
        seen ++= next; frontier = next
      }
      d
    }
    assert(pairs.nonEmpty, "fixture must produce near-dup pairs")
    val maxEcc = adj.keys.map(eccentricity).max
    assert(maxEcc < 8,
      s"fixture pair-graph diameter $maxEcc >= 8 would break the 8-round clusters oracle")
  }
}
