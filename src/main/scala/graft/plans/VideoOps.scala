package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL video decode, replacing the modality's declared stub: a video
  * here is a multi-frame animated GIF — the one frame-sequence
  * container the JDK can both WRITE and READ (`javax.imageio`'s GIF
  * plugin, zero added dependencies). [[GenGif]] synthesizes genuine
  * multi-frame GIF bytes per row; because every frame is written
  * through an EXPLICIT exact-palette `IndexColorModel` (≤ w·h ≤ 256
  * distinct colors), the LZW encoding is LOSSLESS and every decoded
  * pixel is predictable arithmetic — the same closed loop the BMP and
  * WAV paths established, now over a frame SEQUENCE. [[DecodeVideo]]
  * reads the container back frame by frame and reduces each to
  * per-channel means.
  *
  * Frame f, pixel (x, y) of video `id`:
  * blue = (id·31 + 7x + 13y + 17f) mod 256, green/red offset 85/170 —
  * the GenBmp formula extended along the time axis, so temporal ops
  * (frame deltas, scene-change detection) have a predictable signal.
  */
case class GenGif(child: Expression, imgW: Int, imgH: Int, nFrames: Int)
    extends UnaryExpression {
  require(imgW >= 1 && imgH >= 1 && imgW * imgH <= 256,
          s"gen_gif frames must fit an exact 256-color palette: ${imgW}x$imgH")
  require(nFrames >= 1 && nFrames <= 1024, s"gen_gif frame count out of range: $nFrames")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gen_gif requires an integral id, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gen_gif"

  private def idOf(input: Any): Long = input match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    GenGif.gif(idOf(input), imgW, imgH, nFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.GenGif.gif((long) $c, $imgW, $imgH, $nFrames)")

  override protected def withNewChildInternal(newChild: Expression): GenGif =
    copy(child = newChild)
}

object GenGif {
  /** Static helper invoked from generated code: an animated GIF whose
    * every frame carries an exact palette of its own pixel colors —
    * indexed write + LZW is lossless, so decode returns the formula
    * bit-for-bit. */
  def gif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    // interlace OFF: the JDK writer defaults to interlaced GIF, and at
    // small heights its row reordering does not round-trip — sequential
    // row storage is what makes the encoding provably lossless here
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val rgb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y + 17L * f, 256L).toInt
          rgb(y * w + x) = (((b + 170) % 256) << 16) | (((b + 85) % 256) << 8) | b
          x += 1
        }
        y += 1
      }
      val palette = rgb.distinct
      val rs = palette.map(p => ((p >>> 16) & 0xff).toByte)
      val gs = palette.map(p => ((p >>> 8) & 0xff).toByte)
      val bs = palette.map(p => (p & 0xff).toByte)
      val cm = new java.awt.image.IndexColorModel(8, palette.length, rs, gs, bs)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      var i = 0
      while (i < w * h) {
        img.setRGB(i % w, i / w, rgb(i))
        i += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }
}

/** Per-frame decode of a frame-sequence container: one struct per
  * stored frame (frame_idx, width, height, per-channel means), null
  * for payloads no installed reader claims. Pairs with `explode` for
  * the per-frame row form. */
case class DecodeVideo(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_video requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DecodeVideo.frameSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "decode_video"

  override protected def nullSafeEval(input: Any): Any =
    DecodeVideo.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.DecodeVideo.decode($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodeVideo =
    copy(child = newChild)
}

object DecodeVideo {
  ImageIO.setUseCache(false)

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Static helper invoked from generated code: sniff a reader from
    * the bytes, walk every stored frame. */
  def decode(bytes: Array[Byte]): GenericArrayData = {
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    // reader sniffing happens INSIDE the try: the undecodable-bytes
    // path (common input under the gate contract) must still reach the
    // finally that closes iis — an early return here leaked one
    // MemoryCacheImageInputStream per garbage row
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      reader = readers.next()
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n < 1) return null
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >>> 16) & 0xff
            sg += (p >>> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        out(i) = new GenericInternalRow(Array[Any](
          i, w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
        i += 1
      }
      new GenericArrayData(out)
    } catch { case _: Exception => null }
    finally { if (reader != null) reader.dispose(); iis.close() }
  }
}
