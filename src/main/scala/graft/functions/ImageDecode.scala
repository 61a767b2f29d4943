package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** REAL pixel decode for JPEG/PNG/GIF/BMP via the JDK's `javax.imageio`
  * (zero new dependencies) — the optional production path behind the
  * byte-grid seam every perceptual operator in [[Multimodal]] already
  * consumes ([[Multimodal.dhash60]], resize, scene cuts, audio-style
  * stats all read "a byte array"; the stub grids exist so oracles stay
  * deterministic without codec bytes in the corpus).
  *
  * The contract here is the classic perceptual-hash front end: decode →
  * Rec.601 luma → area-average downsample to a WxH grid of unsigned
  * bytes. Feed the grid straight into the EXISTING kernels — e.g.
  * `dhash60(lumaGridCol(col("payload"), 8, 8))` is a real dHash over real
  * pixels, joinable with [[graft.operators.Dedup.hammingPairs60]] exactly
  * like the stub-grid rows.
  *
  * Scale notes: decode is per-row CPU behind a UDF (codec calls cannot be
  * codegen'd) — at 100 TB run it through [[Multimodal.decodePartitions]]
  * so codec init amortizes per partition, keep the grid tiny (64 bytes
  * out per image), and let the narrow pass pipeline with the scan; there
  * is no shuffle anywhere in decode → hash. ImageIO is thread-safe per
  * call (each call constructs its own reader), so `local[32]` and
  * multi-executor clusters behave identically.
  */
object ImageDecode {

  /** Decode + luma + area-average to a `gridW`×`gridH` unsigned-byte grid
    * (row-major). Returns null when the payload is not a decodable image
    * — callers treat null exactly like the too-short stub-grid case.
    */
  def lumaGrid(bytes: Array[Byte], gridW: Int, gridH: Int): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // truncated/corrupt codec stream
    gridOf(img, gridW, gridH)
  }

  /** Luma-grid of an already-decoded image — the shared back half of
    * [[lumaGrid]] and the per-frame path in [[gifFrameGrids]]. */
  private def gridOf(img: java.awt.image.BufferedImage,
      gridW: Int, gridH: Int): Array[Byte] = {
    if (img == null || img.getWidth < 1 || img.getHeight < 1) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](gridW * gridH)
    val counts = new Array[Long](gridW * gridH)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * gridH / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * gridW / w).toInt
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luma (JPEG's own YCbCr weights), full precision
        // kept until the final divide so the grid is decode-deterministic
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        val i = gy * gridW + gx
        sums(i) += luma
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate[Byte](gridW * gridH) { i =>
      (if (counts(i) == 0) 0 else (sums(i) / counts(i)).toInt).toByte
    }
  }

  /** REAL multi-frame decode (animated GIF — and any other multi-image
    * stream `javax.imageio` can iterate): each frame composes onto the
    * logical-screen canvas at its descriptor offset (draw-over; the rare
    * restore-to-background disposal renders as draw-over too — a
    * documented approximation that only affects transparent-patch
    * animations), then area-averages to the same `gridW`×`gridH` luma
    * grid as [[lumaGrid]]. The output is exactly the
    * [[Multimodal.frameWindows]] contract — an array of fixed-size byte
    * grids — so the EXISTING scene-cut / dHash pipeline runs on real
    * pixels end-to-end: `posexplode(gifFrameGridsCol(payload, 8, 8))` →
    * `dhash60` → the `m_scene_cuts` cut test, unchanged.
    *
    * Returns null when the payload is not a decodable image stream;
    * single-frame formats (JPEG/PNG/BMP) yield one grid. `maxFrames`
    * bounds both output size and decode CPU per row (a hostile 10k-frame
    * GIF cannot stall a partition).
    */
  def gifFrameGrids(bytes: Array[Byte], gridW: Int, gridH: Int,
      maxFrames: Int = 64): Array[Array[Byte]] = {
    if (bytes == null || bytes.length == 0) return null
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return null
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return null }
    val reader = readers.next()
    try {
      reader.setInput(iis, false, false) // keep metadata: frame offsets
      val n = math.min(reader.getNumImages(true), maxFrames)
      if (n <= 0) return null
      val (sw, sh) = logicalScreen(reader)
      var canvas: java.awt.image.BufferedImage = null
      val out = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val frame = reader.read(i)
        val (ox, oy) = frameOffset(reader, i)
        if (canvas == null) {
          val w = math.max(sw, frame.getWidth + ox)
          val h = math.max(sh, frame.getHeight + oy)
          canvas = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
        }
        val g = canvas.createGraphics()
        g.drawImage(frame, ox, oy, null)
        g.dispose()
        out(i) = gridOf(canvas, gridW, gridH)
        i += 1
      }
      out
    } catch { case _: Exception => null }
    finally { reader.dispose(); try iis.close() catch { case _: Exception => } }
  }

  /** GIF logical screen dims from stream metadata; (0,0) when absent
    * (single-frame formats) — the canvas then sizes to frame+offset. */
  private def logicalScreen(reader: javax.imageio.ImageReader): (Int, Int) =
    try {
      val tree = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val d = tree.getElementsByTagName("LogicalScreenDescriptor")
      if (d.getLength == 0) (0, 0)
      else {
        val e = d.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("logicalScreenWidth").toInt,
          e.getAttribute("logicalScreenHeight").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Per-frame canvas offset from the GIF image descriptor; (0,0) when
    * the format carries none. */
  private def frameOffset(reader: javax.imageio.ImageReader,
      idx: Int): (Int, Int) =
    try {
      val tree = reader.getImageMetadata(idx)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val d = tree.getElementsByTagName("ImageDescriptor")
      if (d.getLength == 0) (0, 0)
      else {
        val e = d.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("imageLeftPosition").toInt,
          e.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Column form of [[gifFrameGrids]]: binary payload → array of
    * gridW×gridH luma grids (array<binary>), null for non-images —
    * drop-in where [[Multimodal.frameWindows]] feeds the scene-cut ops.
    */
  def gifFrameGridsCol(bin: Column, gridW: Int, gridH: Int): Column = {
    val f = udf((b: Array[Byte]) => gifFrameGrids(b, gridW, gridH))
    f(bin)
  }

  /** True decoded dimensions (width, height), or null if undecodable —
    * the cross-check for the header-walk kernels
    * ([[KernelExpressions.jpegDims]] / imageDims), which trust container
    * metadata this actually verifies.
    */
  def decodedDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None else Some((img.getWidth, img.getHeight))
  }

  /** Column form: binary payload → gridW×gridH luma grid (binary), null
    * for non-images. A UDF by necessity; see the scaladoc scale notes.
    */
  def lumaGridCol(bin: Column, gridW: Int, gridH: Int): Column = {
    val f = udf((b: Array[Byte]) => lumaGrid(b, gridW, gridH))
    f(bin)
  }

  /** Per-partition decoder factory for [[Multimodal.decodePartitions]]:
    * bytes → luma grid as floats in [0,1] (an embedding-shaped output so
    * the ANN/dedup operators consume it unchanged). Undecodable rows map
    * to the zero vector rather than poisoning the partition.
    */
  def lumaGridDecoder(gridW: Int, gridH: Int): () => (Long, Array[Byte]) => Array[Float] =
    () => (_, bytes) => {
      val g = lumaGrid(bytes, gridW, gridH)
      if (g == null) new Array[Float](gridW * gridH)
      else g.map(b => (b & 0xFF) / 255.0f)
    }
}
