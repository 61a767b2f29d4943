package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.functions.{ImageDecode, Multimodal}
import org.apache.spark.sql.functions._

/** Real-codec coverage for the byte-grid seam: encode REAL JPEG/PNG bytes
  * with the JDK, decode them through ImageDecode, and pin (a) decoded
  * dims agree with the header-walk kernels, (b) the dHash over decoded
  * luma is stable across JPEG re-encode quality — the perceptual
  * property the stub grids can only assert by construction.
  */
class ImageDecodeSpec extends SparkTestBase {

  /** Deterministic test scene: horizontal luma gradient + one dark block
    * (gives the dHash real structure; pure gradients are degenerate).
    */
  private def scene(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255) / math.max(1, w - 1)
      val v = if (x > w / 2 && y > h / 2) base / 4 else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def dhashOf(grids: Seq[Array[Byte]]): Seq[Long] = {
    import spark.implicits._
    grids.toDF("grid")
      .select(Multimodal.dhash60(col("grid")).as("h"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("decoded dims cross-check the header-walk kernels (PNG and JPEG)") {
    val img = scene(37, 23)
    val png = encodePng(img)
    val jpg = encodeJpeg(img, 0.9f)
    assert(ImageDecode.decodedDims(png) === Some((37, 23)))
    assert(ImageDecode.decodedDims(jpg) === Some((37, 23)))
    import spark.implicits._
    val rows = Seq(png, jpg).toDF("payload")
      .select(Multimodal.imageDims(col("payload")).as("d"))
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1)))
    assert(rows.toSeq === Seq((37L, 23L), (37L, 23L)),
      "header-walk dims disagree with the real decode")
  }

  test("undecodable payloads are null, not errors") {
    assert(ImageDecode.lumaGrid("not an image".getBytes, 8, 8) == null)
    assert(ImageDecode.lumaGrid(Array.empty[Byte], 8, 8) == null)
    assert(ImageDecode.lumaGrid(null, 8, 8) == null)
    // truncated JPEG: a real codec stream cut mid-scan must not throw
    val jpg = encodeJpeg(scene(64, 64), 0.9f)
    val cut = ImageDecode.lumaGrid(jpg.take(jpg.length / 3), 8, 8)
    assert(cut == null || cut.length == 64) // decoder-dependent, never a throw
  }

  test("dHash over decoded luma is stable across JPEG quality, distinct across scenes") {
    val img = scene(256, 128)
    val grids = Seq(
      ImageDecode.lumaGrid(encodeJpeg(img, 0.95f), 8, 8),
      ImageDecode.lumaGrid(encodeJpeg(img, 0.5f), 8, 8),
      ImageDecode.lumaGrid(encodePng(img), 8, 8))
    grids.foreach(g => assert(g != null && g.length == 64))
    val Seq(hq, lq, png) = dhashOf(grids)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same scene, different codecs/quality: perceptually identical
    assert(ham(hq, lq) <= 6, s"quality re-encode moved dHash by ${ham(hq, lq)} bits")
    assert(ham(hq, png) <= 6, s"codec change moved dHash by ${ham(hq, png)} bits")
    // a mirrored scene must be FAR: the hash discriminates
    val mirrored = new BufferedImage(256, 128, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 128; x <- 0 until 256)
      mirrored.setRGB(x, y, img.getRGB(255 - x, y))
    val Seq(hm) = dhashOf(Seq(ImageDecode.lumaGrid(encodePng(mirrored), 8, 8)))
    assert(ham(hq, hm) > 15, s"mirrored scene only ${ham(hq, hm)} bits away")
  }

  test("lumaGridCol + decodePartitions run the real decode distributed") {
    import spark.implicits._
    val imgs = (0 until 6).map { i =>
      (i.toLong, encodeJpeg(scene(32 + 8 * i, 32), 0.8f))
    }
    val df = imgs.toDF("img_id", "payload").repartition(3)
    // column path: grid arrives as binary, existing kernels consume it
    val viaCol = df.select(col("img_id"),
        Multimodal.dhash60(ImageDecode.lumaGridCol(col("payload"), 8, 8)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCol.size === 6 && viaCol.values.forall(_ >= 0))
    // partition path: per-partition decoder init, embedding-shaped output
    val feats = Multimodal.decodePartitions(df, "img_id", "payload", 64)(
        ImageDecode.lumaGridDecoder(8, 8))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size === 6)
    assert(feats.values.forall(v => v.length == 64 && v.exists(_ > 0f)))
  }
}
