package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit audio fingerprint over an encoded-WAV column — the audio
  * analog of [[PHash64]] for the multimodal near-dup tier. The bit
  * rule is the published Philips robust-hash derivation (Haitsma &
  * Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR 2002):
  * a bit is the sign of the time- AND band-difference of block
  * energies. We apply it to time-domain block energies instead of FFT
  * band energies so the whole pipeline stays in exact integer
  * arithmetic (an FFT would put floats — and platform-dependent
  * rounding — between the fixture and the oracle); the robustness
  * character is the same: amplitude-preserving edits that touch a few
  * samples flip at most a few bits, unrelated signals differ in ~32.
  *
  * Per row: decode via `javax.sound.sampled` (the same JDK codec arm
  * as `Multimodal.decode`), require 16-bit signed PCM mono (both
  * endiannesses), split the n samples into a 9x9 grid of blocks —
  * frame f, band b covers samples `[(f*9+b)*n/81, (f*9+b+1)*n/81)`
  * (integer division, the [[PHash64]] block-boundary rule) — with
  * block energy `E(f,b) = sum(s_i^2)` as an exact Long. Then one bit
  * per (frame, band-delta): bit `(f-1)*8+b` (f in 1..8, b in 0..7) is
  * set iff
  *
  *   E(f,b) - E(f,b+1)  >  E(f-1,b) - E(f-1,b+1)
  *
  * As a scalar expression the fingerprint is a pure map — 100 TB of
  * audio hashes with ZERO shuffle; the banded Hamming pair join over
  * the resulting longs (`Dedup.hammingBandedPairs`) is the only
  * exchange in the dedup plan, and it carries 8-byte signatures, never
  * PCM.
  *
  * Determinism contract (what the DuckDB oracle replays): 16-bit PCM
  * WAV round-trips losslessly, energies are integer sums of integer
  * squares, and the bit rule is an integer comparison — no floating
  * point anywhere, so a fixture whose samples are known analytically
  * fingerprints to an exactly predictable value. Overflow-safe by
  * construction: s^2 <= 2^30 and a block holds < 2^31 samples, so
  * E < 2^61.
  *
  * NULL for: undecodable/corrupt bytes, non-PCM / non-16-bit /
  * non-mono streams, and signals shorter than 81 samples (blocks would
  * be empty) — the dedup analog of SimHash64's token-less docs
  * (absent, never a hot sentinel key).
  *
  * `CodegenFallback`: the body is a per-row codec call + sample loop
  * with local state — nothing whole-stage codegen could fuse.
  */
case class AudioFp64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_fp64 expects BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    AudioFp64.hash(input.asInstanceOf[Array[Byte]])
      .map(java.lang.Long.valueOf).orNull

  override protected def withNewChildInternal(newChild: Expression): AudioFp64 =
    copy(child = newChild)

  override def prettyName: String = "audio_fp64"
}

object AudioFp64 {
  val Frames = 9 // energy frames; Frames-1 = 8 bit-frames
  val Bands = 9  // energy bands per frame; Bands-1 = 8 delta bits
  val MinSamples: Int = Frames * Bands // every block must be non-empty

  /** Decode + fingerprint; None when the bytes aren't a decodable
    * 16-bit signed PCM mono WAV of at least 81 samples. */
  def hash(bytes: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!ok) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          if (n < MinSamples) None
          else Some(fingerprint(decodePcm16(data, n, fmt.isBigEndian)))
        }
      } finally ais.close()
    } catch {
      // Corrupt/hostile containers throw runtime exceptions from the
      // sound plugins (same failure family as Multimodal.decodeOne):
      // absent, never a task failure.
      case scala.util.control.NonFatal(_) => None
    }

  private def decodePcm16(data: Array[Byte], n: Int, bigEndian: Boolean): Array[Int] = {
    val s = new Array[Int](n)
    var i = 0
    if (bigEndian) {
      while (i < n) {
        s(i) = ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt
        i += 1
      }
    } else {
      while (i < n) {
        s(i) = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt
        i += 1
      }
    }
    s
  }

  /** Energy-delta bit fold over a 9x9 block grid of `samples`
    * (exact integer arithmetic throughout). */
  private[graft] def fingerprint(samples: Array[Int]): Long = {
    val n = samples.length
    val nBlocks = Frames * Bands
    val e = new Array[Long](nBlocks)
    var k = 0
    while (k < nBlocks) {
      val start = (k.toLong * n / nBlocks).toInt
      val end = ((k + 1).toLong * n / nBlocks).toInt
      var sum = 0L
      var i = start
      while (i < end) {
        sum += samples(i).toLong * samples(i)
        i += 1
      }
      e(k) = sum
      k += 1
    }
    var fp = 0L
    var f = 1
    while (f < Frames) {
      var b = 0
      while (b < Bands - 1) {
        val d = e(f * Bands + b) - e(f * Bands + b + 1)
        val dPrev = e((f - 1) * Bands + b) - e((f - 1) * Bands + b + 1)
        if (d > dPrev) fp |= 1L << ((f - 1) * (Bands - 1) + b)
        b += 1
      }
      f += 1
    }
    fp
  }
}
