package graft.plans

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the AUDIO decode path — the same
  * honest-decode promotion [[ImageOps]] gave images: `javax.sound
  * .sampled` ships in the JDK (WAV/RIFF PCM parsing, zero added
  * dependencies), so the audio half of the multimodal decode no longer
  * needs a stub either; since r11 the GIF frame-sequence path
  * ([[graft.plans.DecodeVideo]]) covers video for real, so NO modality
  * is stubbed.
  *
  * [[GenWav]] synthesizes a genuine 16-bit PCM mono WAV per row, sample
  * t of clip `id` carrying the deterministic value
  * `((id·31 + t·7919) mod 2048) − 1024` — real codec bytes generated
  * distributively (no fixture table). All decoded statistics are then
  * predictable arithmetic over (id, t): integer sample sums are EXACT,
  * and mean/RMS are one IEEE division (plus one sqrt) away, so a DuckDB
  * oracle reproduces them bit-for-bit and the decode path is
  * hash-verified end-to-end at any corpus size.
  *
  * [[DecodeAudio]] reads the payload through `AudioSystem` (format
  * sniffed from the container bytes), decodes PCM frames, and reduces
  * each clip to (sample_rate, channels, n_samples, mean_amp, rms_amp,
  * zero_cross) — null for undecodable bytes, the same skip-don't-poison
  * rule as image decode. Both run as static helpers called from
  * generated code, staying inside whole-stage codegen. */
case class GenWav(child: Expression, nSamples: Int, sampleRate: Int)
    extends UnaryExpression {
  require(nSamples >= 1 && nSamples <= (1 << 20) && sampleRate >= 1,
          s"gen_wav parameters out of range: n=$nSamples rate=$sampleRate")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gen_wav requires an integral id, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gen_wav"

  private def idOf(input: Any): Long = input match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    GenWav.wav(idOf(input), nSamples, sampleRate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GenWav.wav((long) $c, $nSamples, $sampleRate)")

  override protected def withNewChildInternal(newChild: Expression): GenWav =
    copy(child = newChild)
}

object GenWav {
  /** Static helper invoked from generated code: canonical RIFF/WAVE
    * container, one `fmt ` chunk (PCM, mono, 16-bit little-endian) and
    * one `data` chunk of the deterministic samples. */
  def wav(id: Long, n: Int, rate: Int): Array[Byte] = {
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte
      out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte
      out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte
      out(off + 1) = (v >>> 8).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataSize); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1)            // PCM
    le16(22, 1)            // mono
    le32(24, rate)
    le32(28, rate * 2)     // byte rate
    le16(32, 2)            // block align
    le16(34, 16)           // bits per sample
    ascii(36, "data"); le32(40, dataSize)
    var t = 0
    while (t < n) {
      val v = (java.lang.Math.floorMod(id * 31 + t.toLong * 7919, 2048L) - 1024L).toInt
      le16(44 + t * 2, v & 0xffff)
      t += 1
    }
    out
  }
}

case class DecodeAudio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_audio requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DecodeAudio.schema
  // null for undecodable payloads even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "decode_audio"

  override protected def nullSafeEval(input: Any): Any =
    DecodeAudio.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): the helper may return null
    // for garbage bytes, so the result must flow through isNull
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.DecodeAudio.decode($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeAudio =
    copy(child = newChild)
}

object DecodeAudio {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("rms_amp", DoubleType, nullable = false),
    StructField("zero_cross", LongType, nullable = false)))

  /** Static helper invoked from generated code: decode via the JDK
    * audio registry, reduce the PCM stream to per-clip statistics.
    * Supports signed 8/16-bit PCM (what `javax.sound.sampled` serves
    * for WAV); anything it can't decode returns null. mean/RMS are over
    * ALL samples (channel-agnostic by definition): integer sums
    * (exact), one division for the mean, one sqrt for the RMS.
    * `zero_cross` counts strict sign-boundary changes
    * (prev < 0) != (cur < 0) PER CHANNEL (consecutive samples of the
    * SAME channel, stride = channel count), summed across channels —
    * comparing interleaved samples of different channels would count a
    * physically meaningless statistic on stereo input. All
    * integer-exact, so any engine reproduces them; for mono the stride
    * is 1 and the count equals the plain sequential form (what the q71
    * oracle predicts). */
  def decode(bytes: Array[Byte]): InternalRow = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val f = in.getFormat
      val bits = f.getSampleSizeInBits
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 8 && bits != 16)) return null
      val nCh = f.getChannels
      if (nCh < 1) return null
      val data = in.readAllBytes()
      val bytesPer = bits / 8
      val n = data.length / bytesPer
      var sum = 0L; var sumSq = 0L; var crossings = 0L
      val prevNeg = new Array[Boolean](nCh)
      var i = 0
      while (i < n) {
        val v =
          if (bits == 8) data(i).toInt
          else {
            val off = i * 2
            if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        sum += v
        sumSq += v.toLong * v
        val ch = i % nCh
        val neg = v < 0
        if (i >= nCh && neg != prevNeg(ch)) crossings += 1
        prevNeg(ch) = neg
        i += 1
      }
      if (n == 0) return null
      new GenericInternalRow(Array[Any](
        f.getSampleRate.toInt, f.getChannels, n.toLong,
        sum.toDouble / n, math.sqrt(sumSq.toDouble / n), crossings))
    } catch { case _: Exception => null }
    finally in.close()
  }
}

/** Energy-contour audio fingerprint: decode the PCM payload, take the
  * integer ENERGY (Σ v²) of consecutive `frameSamples`-sample frames
  * over the interleaved stream, and pack the frame-to-frame energy
  * DELTA SIGNS into a long (bit k set iff E_{k+1} > E_k) — the
  * landmark-free core of the published audio-fingerprint recipes
  * (energy-difference sign bits survive volume scaling and re-encoding
  * where byte hashes see distinct files; a strict > keeps the compare
  * division-free and integer-exact, so a SQL oracle replays every bit
  * from the sample formula). The tail partial frame is dropped; null
  * for undecodable payloads and for clips whose contour exceeds 63
  * delta bits (the hash must fit a signed long — longer clips are
  * fingerprinted per-window upstream). */
case class AudioEnergyFp(child: Expression, frameSamples: Int)
    extends UnaryExpression {
  require(frameSamples >= 1, "frameSamples must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_energy_fp requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_energy_fp"

  override protected def nullSafeEval(input: Any): Any =
    AudioEnergyFp.fp(input.asInstanceOf[Array[Byte]], frameSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("afp")
      s"""
      java.lang.Long $boxed = graft.plans.AudioEnergyFp.fp($c, $frameSamples);
      ${ev.isNull} = ($boxed == null);
      ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AudioEnergyFp =
    copy(child = newChild)
}

object AudioEnergyFp {
  /** Static helper invoked from generated code (same PCM prelude as
    * [[DecodeAudio.decode]]). */
  def fp(bytes: Array[Byte], frameSamples: Int): java.lang.Long = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val f = in.getFormat
      val bits = f.getSampleSizeInBits
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 8 && bits != 16)) return null
      val data = in.readAllBytes()
      val bytesPer = bits / 8
      val n = data.length / bytesPer
      val nFrames = n / frameSamples
      if (nFrames < 2 || nFrames - 1 > 63) return null
      val energy = new Array[Long](nFrames)
      var i = 0
      while (i < nFrames * frameSamples) {
        val v =
          if (bits == 8) data(i).toInt
          else {
            val off = i * 2
            if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        energy(i / frameSamples) += v.toLong * v
        i += 1
      }
      var bitsOut = 0L
      var k = 0
      while (k < nFrames - 1) {
        if (energy(k + 1) > energy(k)) bitsOut |= 1L << k
        k += 1
      }
      java.lang.Long.valueOf(bitsOut)
    } catch { case _: Exception => null }
    finally in.close()
  }
}

/** Per-frame integer energies of a PCM clip as an array — the raw
  * series behind both the contour fingerprint ([[AudioEnergyFp]]) and
  * activity segmentation (energy-gated VAD): Σ v² over consecutive
  * `frameSamples`-sample frames, tail partial frame dropped, null for
  * undecodable payloads. Integer-exact, so a SQL oracle replays every
  * element. */
case class AudioFrameEnergy(child: Expression, frameSamples: Int)
    extends UnaryExpression {
  require(frameSamples >= 1, "frameSamples must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_frame_energy requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "audio_frame_energy"

  override protected def nullSafeEval(input: Any): Any =
    AudioFrameEnergy.energies(input.asInstanceOf[Array[Byte]], frameSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.AudioFrameEnergy.energies($c, $frameSamples);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioFrameEnergy =
    copy(child = newChild)
}

object AudioFrameEnergy {
  /** Static helper invoked from generated code (the PCM prelude of
    * [[DecodeAudio.decode]]). */
  def energies(bytes: Array[Byte],
               frameSamples: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val f = in.getFormat
      val bits = f.getSampleSizeInBits
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 8 && bits != 16)) return null
      val data = in.readAllBytes()
      val bytesPer = bits / 8
      val n = data.length / bytesPer
      val nFrames = n / frameSamples
      if (nFrames < 1) return null
      val energy = new Array[Any](nFrames)
      java.util.Arrays.fill(energy.asInstanceOf[Array[AnyRef]], java.lang.Long.valueOf(0L))
      var i = 0
      val acc = new Array[Long](nFrames)
      while (i < nFrames * frameSamples) {
        val v =
          if (bits == 8) data(i).toInt
          else {
            val off = i * 2
            if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        acc(i / frameSamples) += v.toLong * v
        i += 1
      }
      var k = 0
      while (k < nFrames) { energy(k) = acc(k); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(energy)
    } catch { case _: Exception => null }
    finally in.close()
  }
}
