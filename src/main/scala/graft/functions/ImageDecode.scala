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
