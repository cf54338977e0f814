package graft.operators

/** Dependency-free ISO base-media-file-format (MP4/MOV, ISO 14496-12)
  * container metadata parser — the video analog of the dependency-free
  * PDF text extractor: no codec, no native library, just the public
  * box structure. Upgrades `Multimodal.decode`'s video arm from the
  * deterministic stub to REAL container metadata (movie duration,
  * video track dimensions, sample count, track kinds) without touching
  * a single encoded frame — which is exactly the split a 100 TB media
  * pipeline wants: metadata profiling/filtering/dedup-keying over
  * boxes (cheap, JVM-only, this parser), frame decode deferred to the
  * batched decode stage with a real codec worker.
  *
  * Parsed boxes: `ftyp` (major brand), `moov/mvhd` (timescale +
  * duration, versions 0 and 1), `moov/trak/tkhd` (16.16 fixed-point
  * width/height, versions 0 and 1), `moov/trak/mdia/hdlr` (handler:
  * `vide`/`soun`), `moov/trak/mdia/minf/stbl/stsz` (sample count of
  * the first video track). Everything else is skipped by size —
  * unknown boxes cost one length read.
  *
  * Robustness: `size==1` 64-bit largesize and `size==0` to-end boxes
  * are handled; truncated, overflowing, cyclic (non-advancing) or
  * otherwise malformed structures return None — never a throw, so the
  * decode arm can fall back to the stub exactly like the corrupt-PNG
  * path.
  */
object Mp4Meta {

  final case class Mp4Info(
      brand: String,
      timescale: Long,
      durationMs: Long,
      width: Int,
      height: Int,
      videoSamples: Long,
      hasVideo: Boolean,
      hasAudio: Boolean)

  private final val ContainerKinds = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Parse container metadata; None unless the bytes hold a
    * structurally valid ftyp + moov/mvhd. */
  def parse(bytes: Array[Byte]): Option[Mp4Info] =
    try {
      var brand: String = null
      var timescale = 0L
      var duration = -1L
      var width = 0
      var height = 0
      var videoSamples = 0L
      var hasVideo = false
      var hasAudio = false

      def u32(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
      def kind(off: Int): String =
        new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

      // Per-trak accumulator: tkhd sits directly under trak, but
      // hdlr/stsz live two and three containers deeper (mdia, minf/
      // stbl), so the state must ride through the recursion.
      final class TrakState {
        var kind: String = null
        var w = 0
        var h = 0
        var samples = 0L
      }

      // Walk one box level in [start, end); recurse into containers.
      // Returns false on structural damage (abort the whole parse).
      def walk(start: Int, end: Int, trak: TrakState): Boolean = {
        var off = start
        while (off < end) {
          if (off + 8 > end) return false
          var size = u32(off)
          var hdr = 8
          if (size == 1L) {
            if (off + 16 > end) return false
            size = u64(off + 8)
            hdr = 16
          } else if (size == 0L) size = (end - off).toLong
          if (size < hdr || size > end - off) return false
          val k = kind(off)
          val body = off + hdr
          val bodyLen = (size - hdr).toInt
          k match {
            case "ftyp" if brand == null =>
              if (bodyLen < 4) return false
              brand = new String(bytes, body, 4,
                java.nio.charset.StandardCharsets.US_ASCII).trim
            case "mvhd" =>
              if (bodyLen < 4) return false
              val version = bytes(body) & 0xff
              if (version == 1) {
                if (bodyLen < 32) return false
                timescale = u32(body + 20)
                duration = u64(body + 24)
              } else {
                if (bodyLen < 20) return false
                timescale = u32(body + 12)
                duration = u32(body + 16)
              }
            case "tkhd" if trak != null =>
              if (bodyLen < 4) return false
              val version = bytes(body) & 0xff
              // v0: fullbox(4) cre(4) mod(4) id(4) res(4) dur(4) res(8)
              //     layer(2) alt(2) vol(2) res(2) matrix(36) w(4) h(4)
              // v1: cre/mod/dur are 8 bytes
              val dimOff = if (version == 1) 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                           else 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
              if (bodyLen >= dimOff + 8) {
                trak.w = (u32(body + dimOff) >> 16).toInt
                trak.h = (u32(body + dimOff + 4) >> 16).toInt
              }
            case "hdlr" if trak != null =>
              // fullbox(4) predefined(4) handler(4)
              if (bodyLen >= 12) {
                trak.kind = new String(bytes, body + 8, 4,
                  java.nio.charset.StandardCharsets.US_ASCII)
              }
            case "stsz" if trak != null =>
              // fullbox(4) sample_size(4) sample_count(4)
              if (bodyLen >= 12) trak.samples = u32(body + 8)
            case "trak" =>
              val ts = new TrakState
              if (!walk(body, body + bodyLen, ts)) return false
              if (ts.kind == "vide") {
                if (!hasVideo) { // first video track wins
                  width = ts.w
                  height = ts.h
                  videoSamples = ts.samples
                }
                hasVideo = true
              } else if (ts.kind == "soun") hasAudio = true
            case c if ContainerKinds.contains(c) =>
              if (!walk(body, body + bodyLen, trak)) return false
            case _ => () // skip by size
          }
          off += size.toInt
        }
        true
      }

      if (bytes.length < 16 || kind(0) != "ftyp") None
      else if (!walk(0, bytes.length, trak = null)) None
      else if (brand == null || timescale <= 0L || duration < 0L ||
        duration > Long.MaxValue / 1000L) None
      else Some(Mp4Info(brand, timescale, duration * 1000L / timescale,
        width, height, videoSamples, hasVideo, hasAudio))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  // ---- fixture writer (the grayPng/pcmWav analog) ----------------------

  /** Deterministic minimal MP4: ftyp + moov(mvhd + one video trak with
    * tkhd/hdlr/stsz [+ one audio trak]) — structurally valid ISO BMFF
    * whose metadata round-trips exactly through [[parse]], so metadata
    * expressed in fixture arithmetic can be replayed by any SQL engine
    * and compared against the full encode -> parse path. */
  def minimalMp4(timescale: Long, duration: Long, width: Int, height: Int,
                 videoSamples: Long, withAudio: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(kind: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      val b = new java.io.ByteArrayOutputStream(len)
      b.write(be32(len))
      b.write(kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      body.foreach(b.write)
      b.toByteArray
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mvhd = box("mvhd",
      be32(0),                    // version+flags
      be32(0), be32(0),           // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000L), Array[Byte](0, 0), new Array[Byte](10), // rate, volume, reserved
      new Array[Byte](36),        // matrix
      new Array[Byte](24),        // pre_defined
      be32(2))                    // next_track_id
    def tkhd(w: Int, h: Int) = box("tkhd",
      be32(0), be32(0), be32(0),  // version+flags, creation, modification
      be32(1), be32(0), be32(duration), // track_id, reserved, duration
      new Array[Byte](8),         // reserved
      new Array[Byte](8),         // layer, alt_group, volume, reserved
      new Array[Byte](36),        // matrix
      be32(w.toLong << 16), be32(h.toLong << 16))
    def hdlr(handler: String) = box("hdlr",
      be32(0), be32(0), handler.getBytes, new Array[Byte](12), Array[Byte](0))
    def stsz(n: Long) = box("stsz", be32(0), be32(0), be32(n))
    def trak(handler: String, w: Int, h: Int, n: Long) =
      box("trak", tkhd(w, h),
        box("mdia", hdlr(handler),
          box("minf", box("stbl", stsz(n)))))
    val traks = Seq(trak("vide", width, height, videoSamples)) ++
      (if (withAudio) Seq(trak("soun", 0, 0, 0L)) else Nil)
    out.write(ftyp)
    out.write(box("moov", (Seq(mvhd) ++ traks): _*))
    out.toByteArray
  }
}
