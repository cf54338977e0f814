package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mp4Meta, Multimodal}

class Mp4MetaSpec extends SparkSpec {
  import spark.implicits._

  // ---- box-building helpers (independent of the fixture writer) -------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def box(kind: String, body: Array[Byte]*): Array[Byte] = {
    val len = 8 + body.map(_.length).sum
    be32(len) ++ kind.getBytes("US-ASCII") ++ body.flatten
  }

  test("minimalMp4 round-trips exactly through parse") {
    val b = Mp4Meta.minimalMp4(timescale = 1500L, duration = 4500L,
      width = 320, height = 180, videoSamples = 90L, withAudio = true)
    val info = Mp4Meta.parse(b).get
    assert(info.brand == "isom")
    assert(info.timescale == 1500L)
    assert(info.durationMs == 3000L) // 4500 * 1000 / 1500
    assert(info.width == 320)
    assert(info.height == 180)
    assert(info.videoSamples == 90L)
    assert(info.hasVideo)
    assert(info.hasAudio)

    val noAudio = Mp4Meta.parse(Mp4Meta.minimalMp4(1000L, 999L, 64, 48, 10L)).get
    assert(!noAudio.hasAudio)
    assert(noAudio.hasVideo)
    assert(noAudio.durationMs == 999L)
  }

  test("version-1 (64-bit) mvhd and tkhd parse") {
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0),     // version 1
      be64(0), be64(0),            // creation, modification (64-bit)
      be32(600), be64(1234),       // timescale, duration (64-bit)
      be32(0x00010000L), Array[Byte](0, 0), new Array[Byte](10),
      new Array[Byte](36), new Array[Byte](24), be32(2))
    val tkhd1 = box("tkhd",
      Array[Byte](1, 0, 0, 0),
      be64(0), be64(0),            // creation, modification
      be32(1), be32(0), be64(1234), // track_id, reserved, duration (64-bit)
      new Array[Byte](8), new Array[Byte](8), new Array[Byte](36),
      be32(640L << 16), be32(480L << 16))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII"),
      new Array[Byte](12), Array[Byte](0))
    val mp4 = box("ftyp", "mp42".getBytes("US-ASCII"), be32(0)) ++
      box("moov", mvhd1, box("trak", tkhd1, box("mdia", hdlr)))
    val info = Mp4Meta.parse(mp4).get
    assert(info.brand == "mp42")
    assert(info.timescale == 600L)
    assert(info.durationMs == 1234L * 1000 / 600)
    assert(info.width == 640)
    assert(info.height == 480)
    assert(info.videoSamples == 0L) // no stsz present
  }

  test("largesize (size==1) boxes parse") {
    val inner = Mp4Meta.minimalMp4(1000L, 500L, 100, 80, 5L)
    // re-wrap the moov with a 16-byte largesize header
    val ftypSize = ((inner(0) & 0xff) << 24) | ((inner(1) & 0xff) << 16) |
      ((inner(2) & 0xff) << 8) | (inner(3) & 0xff)
    val ftyp = inner.take(ftypSize)
    val moovBody = inner.drop(ftypSize + 8)
    val large = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moovBody.length) ++ moovBody
    val info = Mp4Meta.parse(ftyp ++ large).get
    assert(info.width == 100 && info.height == 80 && info.videoSamples == 5L)
  }

  test("corrupt, truncated and hostile structures are None, never a throw") {
    val good = Mp4Meta.minimalMp4(1000L, 500L, 100, 80, 5L)
    assert(Mp4Meta.parse("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(Mp4Meta.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4Meta.parse(good.dropRight(7)).isEmpty)       // truncated mid-box
    val tiny = good.clone; tiny(0) = 0; tiny(1) = 0; tiny(2) = 0; tiny(3) = 3
    assert(Mp4Meta.parse(tiny).isEmpty)                    // size < header
    val huge = good.clone; huge(0) = 0x7f.toByte
    assert(Mp4Meta.parse(huge).isEmpty)                    // size > buffer
    // no moov/mvhd: structurally walkable but metadata-less
    assert(Mp4Meta.parse(box("ftyp", "isom".getBytes("US-ASCII"), be32(0))).isEmpty)
    // byte-flip fuzz: parse must never throw
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val m = good.clone
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Mp4Meta.parse(m) // any Option is fine; throwing fails the test
    }
  }

  test("property: minimalMp4 -> parse round-trips arbitrary parameters") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val params = for {
      ts <- Gen.chooseNum(1L, 1000000L)
      dur <- Gen.chooseNum(0L, 1000000000L)
      w <- Gen.chooseNum(0, 65535)
      h <- Gen.chooseNum(0, 65535)
      n <- Gen.chooseNum(0L, 4000000000L)
      audio <- Gen.oneOf(true, false)
    } yield (ts, dur, w, h, n, audio)
    val prop = Prop.forAll(params) { case (ts, dur, w, h, n, audio) =>
      val info = Mp4Meta.parse(Mp4Meta.minimalMp4(ts, dur, w, h, n, audio)).get
      info.timescale == ts && info.durationMs == dur * 1000L / ts &&
        info.width == w && info.height == h && info.videoSamples == n &&
        info.hasVideo && info.hasAudio == audio && info.brand == "isom"
    }
    val r = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("decode: real MP4 metadata on the video arm, stub for non-BMFF bytes") {
    val df = Seq(
      (0L, "video", Mp4Meta.minimalMp4(1000L, 2500L, 640, 360, 75L, withAudio = true)),
      (1L, "video", "fake-mp4-bytes-cccccccc".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decode(df).orderBy("media_id").collect()
    val real = out(0)
    assert(real.getAs[Boolean]("decoded"))
    assert(real.getAs[Int]("width") == 640)
    assert(real.getAs[Int]("height") == 360)
    assert(real.getAs[Int]("n_frames") == 75)
    assert(real.getAs[Long]("duration_ms") == 2500L)
    assert(!out(1).getAs[Boolean]("decoded")) // stub arm
  }
}
