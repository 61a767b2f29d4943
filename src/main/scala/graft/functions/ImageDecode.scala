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

  // ------------------------------------------------------------- MJPEG/AVI

  /** The standard JPEG Huffman tables (ITU T.81 Annex K, Tables K.3-K.6)
    * as one complete DHT segment (420 bytes: marker + length + 4 tables).
    * MJPEG frames in AVI files routinely OMIT their Huffman tables — the
    * OpenDML spec says decoders must assume these exact tables.
    * [[withStandardHuffman]] splices this segment before SOS to repair
    * such frames for decoders without that fallback (the JDK 17 reader
    * happens to substitute the tables itself; older/other ImageIO
    * plugins throw "Huffman table was not defined" — the explicit repair
    * keeps the decode portable). The constants are validated bit-for-bit
    * by the strip-and-reinject spec: decoding through the injection path
    * (which forces OUR tables) must reproduce the exact pixels of the
    * original stream, whose embedded tables are the JDK encoder's own
    * standard set.
    */
  private val StdHuffmanDht: Array[Byte] = {
    val bitsDcLum = "00010501010101010100000000000000"
    val bitsDcChr = "00030101010101010101010000000000"
    val valsDc = "000102030405060708090A0B"
    val bitsAcLum = "0002010303020403050504040000017D"
    val valsAcLum =
      "0102030004110512213141061351610722711432819" + "1A108" +
      "2342B1C11552D1F02433627282090A161718191A25262728" +
      "292A343536373839" + "3A43444546474849" + "4A53545556575859" +
      "5A63646566676869" + "6A73747576777879" + "7A83848586878889" +
      "8A92939495969798" + "999AA2A3A4A5A6A7" + "A8A9AAB2B3B4B5B6" +
      "B7B8B9BAC2C3C4C5" + "C6C7C8C9CAD2D3D4" + "D5D6D7D8D9DAE1E2" +
      "E3E4E5E6E7E8E9EA" + "F1F2F3F4F5F6F7F8" + "F9FA"
    val bitsAcChr = "00020102040403040705040400010277"
    val valsAcChr =
      "0001020311040521" + "3106124151076171" + "1322328108144291" +
      "A1B1C109233352F0" + "156272D10A162434" + "E125F11718191A26" +
      "2728292A35363738" + "393A434445464748" + "494A535455565758" +
      "595A636465666768" + "696A737475767778" + "797A828384858687" +
      "88898A9293949596" + "9798999AA2A3A4A5" + "A6A7A8A9AAB2B3B4" +
      "B5B6B7B8B9BAC2C3" + "C4C5C6C7C8C9CAD2" + "D3D4D5D6D7D8D9DA" +
      "E2E3E4E5E6E7E8E9" + "EAF2F3F4F5F6F7F8" + "F9FA"
    val hex = "FFC401A2" +
      "00" + bitsDcLum + valsDc + "01" + bitsDcChr + valsDc +
      "10" + bitsAcLum + valsAcLum + "11" + bitsAcChr + valsAcChr
    require(hex.length == 840, s"DHT hex length ${hex.length}, expected 840")
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  /** Repair a table-less MJPEG frame: if the JPEG stream carries no DHT
    * marker, splice [[StdHuffmanDht]] immediately before the SOS marker.
    * Streams that already carry tables (or aren't JPEG) pass through
    * untouched. Walks header segments only, like the dims kernel.
    */
  def withStandardHuffman(jpeg: Array[Byte]): Array[Byte] = {
    val n = jpeg.length
    @inline def u8(i: Int): Int = jpeg(i) & 0xFF
    if (n < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return jpeg
    var p = 2
    while (p + 1 < n) {
      if (u8(p) != 0xFF) return jpeg // desync — hand back unmodified
      while (p + 1 < n && u8(p + 1) == 0xFF) p += 1
      if (p + 1 >= n) return jpeg
      val m = u8(p + 1)
      if (m == 0xC4) return jpeg // tables present — nothing to repair
      if (m == 0xDA) { // SOS: splice the standard tables right here
        val out = new Array[Byte](n + StdHuffmanDht.length)
        System.arraycopy(jpeg, 0, out, 0, p)
        System.arraycopy(StdHuffmanDht, 0, out, p, StdHuffmanDht.length)
        System.arraycopy(jpeg, p, out, p + StdHuffmanDht.length, n - p)
        return out
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2
      else if (m == 0xD9) return jpeg
      else {
        if (p + 3 >= n) return jpeg
        val len = (u8(p + 2) << 8) | u8(p + 3)
        if (len < 2) return jpeg
        p += 2 + len
      }
    }
    jpeg
  }

  /** Decode one MJPEG frame chunk to a luma grid: try the bytes as-is,
    * then through the standard-table repair ([[withStandardHuffman]]).
    * Null when the chunk is not a decodable JPEG (e.g. a `00db`
    * uncompressed-DIB frame, or garbage).
    */
  private def mjpegFrameGrid(body: Array[Byte], gridW: Int, gridH: Int): Array[Byte] = {
    if (body.length < 4 || (body(0) & 0xFF) != 0xFF || (body(1) & 0xFF) != 0xD8) return null
    val direct = lumaGrid(body, gridW, gridH)
    if (direct != null) direct
    else lumaGrid(withStandardHuffman(body), gridW, gridH)
  }

  /** REAL video pixel decode for MJPEG-in-AVI (the webcam / DV / capture
    * format whose frames are self-contained JPEGs): walks the RIFF/AVI
    * container to the `movi` list, decodes each `##dc` frame chunk via
    * the JDK JPEG codec — repairing the table-less frames real MJPEG
    * muxers emit (see [[StdHuffmanDht]]) — and area-averages each frame
    * to the same `gridW`×`gridH` luma grid as [[lumaGrid]]. Output is the
    * [[Multimodal.frameWindows]] contract (array of fixed-size grids), so
    * the existing scene-cut / dHash pipeline runs on real video pixels
    * unchanged: `posexplode(aviFrameGridsCol(payload, 8, 8))` → `dhash60`
    * → cuts.
    *
    * Returns null when the payload is not RIFF/AVI or has no `movi` list;
    * undecodable frame chunks are skipped (uncompressed `00db` frames,
    * truncated tails). `maxFrames` bounds decode CPU per row — a hostile
    * million-frame file cannot stall a partition. Interleaved `rec `
    * sub-lists (the OpenDML grouping) are walked one level deep. Scale
    * notes as [[lumaGrid]]: per-row CPU behind a UDF, run through
    * [[Multimodal.decodePartitions]] at 100 TB, 64 bytes out per frame,
    * no shuffle anywhere in decode → hash.
    */
  def aviMjpegFrameGrids(bytes: Array[Byte], gridW: Int, gridH: Int,
      maxFrames: Int = 64): Array[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return null
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xFF
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    @inline def is4(i: Int, a: Char, b: Char, c: Char, d: Char): Boolean =
      u8(i) == a && u8(i + 1) == b && u8(i + 2) == c && u8(i + 3) == d
    if (!is4(0, 'R', 'I', 'F', 'F') || !is4(8, 'A', 'V', 'I', ' ')) return null
    @inline def isFrameChunk(i: Int): Boolean =
      u8(i + 2) == 'd' && (u8(i + 3) == 'c' || u8(i + 3) == 'b')
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var attempted = 0
    // decode one frame chunk at header offset i (body size s); true = keep going
    def frame(i: Int, s: Long): Boolean = {
      attempted += 1
      val body = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + s.toInt)
      val g = mjpegFrameGrid(body, gridW, gridH)
      if (g != null) out += g
      attempted < maxFrames
    }
    var p = 12L // Long cursor — 2 GB-safe, like the header kernels
    var sawMovi = false
    while (p + 8 <= n) {
      val pi = p.toInt
      val size = le32(pi + 4)
      if (size < 0L || p + 8 + size > n) return if (sawMovi) out.toArray else null
      if (is4(pi, 'L', 'I', 'S', 'T') && size >= 4 && is4(pi + 8, 'm', 'o', 'v', 'i')) {
        sawMovi = true
        var q = p + 12
        val end = p + 8 + size
        var go = true
        while (go && q + 8 <= end) {
          val qi = q.toInt
          val s2 = le32(qi + 4)
          if (s2 < 0L || q + 8 + s2 > end) return out.toArray
          if (is4(qi, 'L', 'I', 'S', 'T') && s2 >= 4 && is4(qi + 8, 'r', 'e', 'c', ' ')) {
            var r = q + 12
            val rend = q + 8 + s2
            while (go && r + 8 <= rend) {
              val ri = r.toInt
              val s3 = le32(ri + 4)
              if (s3 < 0L || r + 8 + s3 > rend) return out.toArray
              if (isFrameChunk(ri)) go = frame(ri, s3)
              r += 8L + s3 + (s3 & 1L)
            }
          } else if (isFrameChunk(qi)) go = frame(qi, s2)
          q += 8L + s2 + (s2 & 1L)
        }
        return out.toArray
      }
      p += 8L + size + (size & 1L)
    }
    if (sawMovi) out.toArray else null
  }

  /** Column form of [[aviMjpegFrameGrids]]: binary payload → array of
    * gridW×gridH luma grids (array<binary>), null for non-AVI payloads —
    * drop-in where [[gifFrameGridsCol]] / [[Multimodal.frameWindows]]
    * feed the scene-cut ops.
    */
  def aviFrameGridsCol(bin: Column, gridW: Int, gridH: Int): Column = {
    val f = udf((b: Array[Byte]) => aviMjpegFrameGrids(b, gridW, gridH))
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
