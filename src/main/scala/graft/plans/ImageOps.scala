package graft.plans

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the multimodal decode path.
  *
  * [[DecodeImage]] is a REAL pixel decoder over the JDK's built-in
  * `javax.imageio` readers (PNG/BMP/GIF/JPEG — zero added
  * dependencies), replacing round 3-5's declared stub: it decodes the
  * binary payload and emits (width, height, per-channel pixel means),
  * or null for undecodable bytes — the skip-don't-poison choice for a
  * corpus whose media column mixes formats and corruption.
  *
  * [[GenBmp]] synthesizes a deterministic 24-bit BMP per row so the
  * decoder has real codec bytes to chew on at any scale WITHOUT a
  * binary fixture table: pixel (x, y) of image `id` carries
  * blue = (id·31 + 7x + 13y) mod 256, green = blue+85 mod 256,
  * red = blue+170 mod 256. Because per-channel MEANS are invariant to
  * pixel order, a SQL oracle can verify the decoded stats purely
  * arithmetically (DuckDB: avg over the (x, y) grid of the same
  * formula) — the decode loop closes the loop from synthesized codec
  * bytes back to predicted numbers.
  *
  * Both run as static helpers called from generated code (same pattern
  * as [[ByteSum]]/[[IvfAssign]]): the expression stays inside
  * whole-stage codegen; the helper does the per-row work.
  */
case class GenBmp(child: Expression, imgW: Int, imgH: Int)
    extends UnaryExpression {
  require(imgW >= 1 && imgH >= 1 && imgW * imgH <= (1 << 20),
          s"gen_bmp dimensions out of range: ${imgW}x$imgH")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gen_bmp requires an integral id, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gen_bmp"

  private def idOf(input: Any): Long = input match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    GenBmp.bmp(idOf(input), imgW, imgH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GenBmp.bmp((long) $c, $imgW, $imgH)")

  override protected def withNewChildInternal(newChild: Expression): GenBmp =
    copy(child = newChild)
}

object GenBmp {
  /** Static helper invoked from generated code: a minimal
    * BITMAPINFOHEADER 24bpp BMP (bottom-up rows, BGR byte order,
    * 4-byte row padding). Channel means are pixel-order invariant, so
    * the bottom-up storage never surfaces in the verified stats. */
  def bmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte
      out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte
      out(off + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize) // file size
    le32(10, 54)           // pixel data offset
    le32(14, 40)           // BITMAPINFOHEADER size
    le32(18, w)
    le32(22, h)            // positive: bottom-up
    out(26) = 1            // planes
    out(28) = 24           // bpp
    le32(34, dataSize)
    var y = 0
    while (y < h) {
      var x = 0
      val base = 54 + y * rowSize
      while (x < w) {
        val v = java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y, 256L).toInt
        out(base + x * 3) = v.toByte               // B
        out(base + x * 3 + 1) = ((v + 85) % 256).toByte  // G
        out(base + x * 3 + 2) = ((v + 170) % 256).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }
}

case class DecodeImage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_image requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DecodeImage.schema
  // null for undecodable payloads even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "decode_image"

  override protected def nullSafeEval(input: Any): Any =
    DecodeImage.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): the helper may return null
    // for garbage bytes, so the result must flow through isNull
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.DecodeImage.decode($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeImage =
    copy(child = newChild)
}

object DecodeImage {
  ImageIO.setUseCache(false) // no temp-file cache on executor disks

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Static helper invoked from generated code: decode via the JDK
    * registry (format sniffed from the bytes), return null when no
    * reader claims the payload — undecodable rows are skipped, not
    * fabricated. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >>> 16) & 0xff
        sg += (rgb >>> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    new GenericInternalRow(Array[Any](w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }
}

/** Average-hash (aHash) perceptual fingerprint: decode the payload,
  * threshold each pixel's integer luminance (r+g+b) against the image
  * mean, pack the bits into a long (bit i = x + y·width, decoded
  * orientation). The integer-only compare `lum·n > total` avoids the
  * division a float mean would need, so a SQL oracle replays the hash
  * exactly from the pixel formula. Null for undecodable payloads and
  * for images with more than 63 pixels (the hash must fit a signed
  * long — production-size images first pass [[ImageResize]] down to
  * the aHash grid; q128 verifies that chain end to end). */
case class ImageAhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_ahash requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_ahash"

  override protected def nullSafeEval(input: Any): Any =
    ImageAhash.ahash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("ahash")
      s"""
      java.lang.Long $boxed = graft.plans.ImageAhash.ahash($c);
      ${ev.isNull} = ($boxed == null);
      ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImageAhash =
    copy(child = newChild)
}

object ImageAhash {
  /** Static helper invoked from generated code. */
  def ahash(bytes: Array[Byte]): java.lang.Long = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w.toLong * h > 63) return null
    val n = w * h
    val lums = new Array[Long](n)
    var tot = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = (((rgb >>> 16) & 0xff) + ((rgb >>> 8) & 0xff) + (rgb & 0xff)).toLong
        lums(y * w + x) = l
        tot += l
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    while (i < n) {
      if (lums(i) * n > tot) bits |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bits)
  }
}

/** Box-filter image downsample: decode the payload, partition the
  * input grid into per-output-pixel boxes, take the INTEGER mean of
  * each channel (sum div count — exact, division-free-rounding, so a
  * SQL oracle replays every output pixel), and re-encode as a 24-bit
  * BMP so the result composes with [[DecodeImage]] and [[ImageAhash]]
  * (the resize-then-ahash chain production perceptual dedup runs on
  * full-size images). Downscale only: null for undecodable payloads
  * and when either output dimension exceeds the input. */
case class ImageResize(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  require(outW >= 1 && outH >= 1 && outW * outH <= (1 << 20),
          s"image_resize dimensions out of range: ${outW}x$outH")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_resize requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_resize"

  override protected def nullSafeEval(input: Any): Any =
    ImageResize.resize(input.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ImageResize.resize($c, $outW, $outH);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageResize =
    copy(child = newChild)
}

object ImageResize {
  /** Static helper invoked from generated code. Output box for pixel
    * (ox, oy) covers input columns [ox·inW/outW, (ox+1)·inW/outW) and
    * rows likewise — the exact integer partition, every input pixel in
    * exactly one box. */
  def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val inW = img.getWidth
    val inH = img.getHeight
    if (inW < outW || inH < outH) return null
    val rgb = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * inH / outH
      val y1 = (oy + 1) * inH / outH
      var ox = 0
      while (ox < outW) {
        val x0 = ox * inW / outW
        val x1 = (ox + 1) * inW / outW
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sr += (p >>> 16) & 0xff
            sg += (p >>> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        rgb(oy * outW + ox) =
          (((sr / n).toInt & 0xff) << 16) | (((sg / n).toInt & 0xff) << 8) |
            ((sb / n).toInt & 0xff)
        ox += 1
      }
      oy += 1
    }
    writeBmp(outW, outH, rgb)
  }

  /** Minimal 24bpp BMP writer for arbitrary pixels (the GenBmp header
    * layout); rows stored bottom-up, so storage row s carries image
    * row h−1−s and a round-trip through the decoder is orientation-
    * exact. */
  def writeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte
      out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte
      out(off + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize)
    le32(10, 54)
    le32(14, 40)
    le32(18, w)
    le32(22, h)
    out(26) = 1
    out(28) = 24
    le32(34, dataSize)
    var s = 0
    while (s < h) {
      val imgRow = h - 1 - s
      val base = 54 + s * rowSize
      var x = 0
      while (x < w) {
        val p = rgb(imgRow * w + x)
        out(base + x * 3) = (p & 0xff).toByte
        out(base + x * 3 + 1) = ((p >>> 8) & 0xff).toByte
        out(base + x * 3 + 2) = ((p >>> 16) & 0xff).toByte
        x += 1
      }
      s += 1
    }
    out
  }
}
