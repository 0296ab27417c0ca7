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

/** A REAL AVI (RIFF) container per row — the industry video container
  * the GIF path is not: 'RIFF/AVI ' with the standard header chain
  * (avih → strl: strh 'vids' + strf BITMAPINFOHEADER) and one
  * uncompressed-DIB '00db' chunk per frame (biCompression = BI_RGB,
  * 24-bit bottom-up BGR rows padded to 4 bytes — the padding is part
  * of the format and deliberately exercised by non-multiple-of-4
  * widths), closed by a spec-conformant 'idx1' index. Uncompressed
  * DIB frames are bit-exact by construction, so the decoded pixels
  * are the [[GenGif]] time-extended formula verbatim and a DuckDB
  * oracle replays every channel mean — the gen_bmp/gen_wav
  * synthesized-bytes discipline on a genuine video container.
  * [[GenAvi.aviMjpeg]] wraps pre-encoded JPEG frames into the same
  * container as MJPEG '00dc' chunks (the compressed flavor;
  * spec-pinned against decoding the same JPEGs directly). */
case class GenAvi(child: Expression, imgW: Int, imgH: Int, nFrames: Int)
    extends UnaryExpression {
  require(imgW >= 1 && imgH >= 1 && imgW * imgH <= 4096,
          s"gen_avi frame size out of range: ${imgW}x$imgH")
  require(nFrames >= 1 && nFrames <= 1024, s"gen_avi frame count out of range: $nFrames")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gen_avi requires an integral id, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gen_avi"

  private def idOf(input: Any): Long = input match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    GenAvi.avi(idOf(input), imgW, imgH, nFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.GenAvi.avi((long) $c, $imgW, $imgH, $nFrames)")

  override protected def withNewChildInternal(newChild: Expression): GenAvi =
    copy(child = newChild)
}

object GenAvi {
  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def fcc(o: ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes("US-ASCII"))

  /** One frame's DIB pixel data: bottom-up BGR rows, 4-byte-aligned
    * stride, pixel (x, y) of frame f carrying the [[GenGif]] formula. */
  private def dibFrame(id: Long, w: Int, h: Int, f: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val data = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        val b = java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y + 17L * f, 256L).toInt
        data(row + x * 3) = b.toByte
        data(row + x * 3 + 1) = ((b + 85) % 256).toByte
        data(row + x * 3 + 2) = ((b + 170) % 256).toByte
        x += 1
      }
      y += 1
    }
    data
  }

  /** Static helper invoked from generated code. */
  def avi(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    buildAvi(w, h, "DIB ", biCompressionRgb = true,
      (0 until nFrames).map(f => dibFrame(id, w, h, f)))

  /** MJPEG flavor: each element of `frames` is a complete JPEG file's
    * bytes, stored verbatim as an '00dc' chunk. */
  def aviMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] =
    buildAvi(w, h, "MJPG", biCompressionRgb = false, frames)

  private def buildAvi(w: Int, h: Int, handler: String,
                       biCompressionRgb: Boolean,
                       frames: Seq[Array[Byte]]): Array[Byte] = {
    val n = frames.size
    val maxFrame = frames.map(_.length).max
    // strl = 'strl' + strh(8+56) + strf(8+40); hdrl = 'hdrl' + avih(8+56) + LIST strl
    val strlSize = 4 + 64 + 48
    val hdrlSize = 4 + 64 + 8 + strlSize
    val moviSize = 4 + frames.map(fr => 8 + fr.length + (fr.length & 1)).sum
    val idx1Size = n * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val o = new ByteArrayOutputStream(8 + riffSize)
    fcc(o, "RIFF"); le32(o, riffSize); fcc(o, "AVI ")
    fcc(o, "LIST"); le32(o, hdrlSize); fcc(o, "hdrl")
    // avih — MainAVIHeader
    fcc(o, "avih"); le32(o, 56)
    le32(o, 40000)          // usPerFrame (25 fps)
    le32(o, maxFrame * 25)  // maxBytesPerSec
    le32(o, 0)              // padding granularity
    le32(o, 0x10)           // AVIF_HASINDEX
    le32(o, n); le32(o, 0)  // totalFrames, initialFrames
    le32(o, 1)              // streams
    le32(o, maxFrame)       // suggestedBufferSize
    le32(o, w); le32(o, h)
    le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0) // reserved
    fcc(o, "LIST"); le32(o, strlSize); fcc(o, "strl")
    // strh — AVIStreamHeader
    fcc(o, "strh"); le32(o, 56)
    fcc(o, "vids"); fcc(o, handler)
    le32(o, 0); le16(o, 0); le16(o, 0) // flags, priority, language
    le32(o, 0)              // initialFrames
    le32(o, 1); le32(o, 25) // scale, rate → 25 fps
    le32(o, 0); le32(o, n)  // start, length
    le32(o, maxFrame)       // suggestedBufferSize
    le32(o, -1)             // quality (default)
    le32(o, 0)              // sampleSize (varies per frame)
    le16(o, 0); le16(o, 0); le16(o, w); le16(o, h) // rcFrame
    // strf — BITMAPINFOHEADER
    fcc(o, "strf"); le32(o, 40)
    le32(o, 40); le32(o, w); le32(o, h)
    le16(o, 1); le16(o, 24) // planes, bitCount
    if (biCompressionRgb) le32(o, 0) else fcc(o, "MJPG")
    le32(o, ((w * 3 + 3) & ~3) * h) // biSizeImage
    le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0) // ppm, clrUsed/Important
    fcc(o, "LIST"); le32(o, moviSize); fcc(o, "movi")
    val chunkId = if (biCompressionRgb) "00db" else "00dc"
    val offsets = new Array[Int](n)
    var rel = 4 // idx1 offsets are relative to the 'movi' fourcc
    frames.zipWithIndex.foreach { case (fr, i) =>
      offsets(i) = rel
      fcc(o, chunkId); le32(o, fr.length); o.write(fr, 0, fr.length)
      if ((fr.length & 1) == 1) o.write(0) // RIFF chunks are even-padded
      rel += 8 + fr.length + (fr.length & 1)
    }
    fcc(o, "idx1"); le32(o, idx1Size)
    frames.zipWithIndex.foreach { case (fr, i) =>
      fcc(o, chunkId); le32(o, 0x10) // AVIIF_KEYFRAME
      le32(o, offsets(i)); le32(o, fr.length)
    }
    o.toByteArray
  }
}

/** Per-frame decode of a frame-sequence container: one struct per
  * stored frame (frame_idx, width, height, per-channel means), null
  * for payloads no installed reader claims. AVI/RIFF containers are
  * parsed by the hand-written walker below (uncompressed-DIB '00db'
  * and MJPEG '00dc' frames — the JPEGs ride `javax.imageio`); other
  * containers go through ImageIO reader sniffing (GIF frame
  * sequences). Pairs with `explode` for the per-frame row form. */
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

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fccIs(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + 4 && b(o) == s.charAt(0).toByte &&
      b(o + 1) == s.charAt(1).toByte && b(o + 2) == s.charAt(2).toByte &&
      b(o + 3) == s.charAt(3).toByte

  private def meansRow(idx: Int, img: java.awt.image.BufferedImage)
      : GenericInternalRow = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val np = w.toLong * h
    new GenericInternalRow(Array[Any](
      idx, w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
  }

  /** Hand-written RIFF/AVI walk (the container has no ImageIO
    * reader): BITMAPINFOHEADER from 'strf' (width, height, 24-bit
    * BI_RGB for the DIB path), then every '..db' (uncompressed DIB:
    * bottom-up BGR rows, 4-byte-aligned stride — means read straight
    * off the bytes, skipping the pad) or '..dc' (MJPEG: the chunk IS
    * a JPEG file, decoded via ImageIO) chunk inside LIST 'movi', in
    * storage order. RIFF even-padding honored on every walk. A
    * malformed chunk stops the walk (frames decoded before it are
    * kept — skipped, not fabricated); nothing decodable → null, the
    * undecodable contract. */
  private def decodeAvi(b: Array[Byte]): GenericArrayData = {
    try {
      var w = 0; var h = 0; var bits = 0; var comp = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      // locate 'strf' inside LIST hdrl/strl, then walk LIST movi
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val size = le32(b, off + 4)
          if (size < 0 || off + 8 + size > to) return
          if (fccIs(b, off, "LIST")) {
            // recurse into hdrl/strl/movi lists
            walk(off + 12, off + 8 + size)
          } else if (fccIs(b, off, "strf") && size >= 40) {
            w = le32(b, off + 8 + 4)
            h = le32(b, off + 8 + 8)
            bits = le16(b, off + 8 + 14)
            comp = le32(b, off + 8 + 16)
          } else if (b(off + 2) == 'd'.toByte && b(off + 3) == 'b'.toByte
                     && size > 0) {
            // uncompressed DIB frame: exact integer channel sums
            if (w <= 0 || h <= 0 || bits != 24 || comp != 0) return
            val stride = (w * 3 + 3) & ~3
            if (size < stride * h) return
            val base = off + 8
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              val row = base + y * stride
              var x = 0
              while (x < w) {
                sb += b(row + x * 3) & 0xff
                sg += b(row + x * 3 + 1) & 0xff
                sr += b(row + x * 3 + 2) & 0xff
                x += 1
              }
              y += 1
            }
            val np = w.toLong * h
            out += new GenericInternalRow(Array[Any](
              out.size, w, h,
              sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
          } else if (b(off + 2) == 'd'.toByte && b(off + 3) == 'c'.toByte
                     && size > 0) {
            // MJPEG frame: the chunk is a complete JPEG file
            val img = ImageIO.read(
              new ByteArrayInputStream(b, off + 8, size))
            if (img == null) return
            out += meansRow(out.size, img)
          }
          off += 8 + size + (size & 1)
        }
      }
      walk(12, 8 + le32(b, 4))
      if (out.isEmpty) null else new GenericArrayData(out.toArray)
    } catch { case _: Exception => null }
  }

  /** Static helper invoked from generated code: sniff a reader from
    * the bytes, walk every stored frame. */
  def decode(bytes: Array[Byte]): GenericArrayData = {
    if (bytes.length >= 12 && fccIs(bytes, 0, "RIFF") &&
        fccIs(bytes, 8, "AVI "))
      return decodeAvi(bytes)
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
