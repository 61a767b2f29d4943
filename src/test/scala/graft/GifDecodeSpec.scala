package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.functions.{ImageDecode, Multimodal}
import org.apache.spark.sql.functions._

/** Real multi-frame decode: encode an animated GIF with the JDK, decode it
  * through [[ImageDecode.gifFrameGrids]], and pin (a) frame count + dims,
  * (b) bit-identical re-decode (sampled corpora must replay), (c) the
  * scene-cut contract end-to-end on REAL pixels — two shots with opposed
  * gradients must hash far apart across the cut and near-identical within
  * a shot, the exact test `m_scene_cuts` applies to the stub grids.
  */
class GifDecodeSpec extends SparkTestBase {

  /** Horizontal luma ramp; `reverse` flips the gradient direction so the
    * dHash (a gradient-sign hash) flips nearly every bit across the cut.
    */
  private def ramp(w: Int, h: Int, reverse: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = if (reverse) w - 1 - x else x
      val v = (t * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def makeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private val shotA = Seq(ramp(40, 24, reverse = false),
    ramp(40, 24, reverse = false))
  private val shotB = Seq(ramp(40, 24, reverse = true),
    ramp(40, 24, reverse = true))
  private val gif = makeGif(shotA ++ shotB)

  test("animated GIF: frame count, dims, and bit-identical re-decode") {
    val grids = ImageDecode.gifFrameGrids(gif, 8, 8)
    assert(grids != null && grids.length === 4)
    grids.foreach(g => assert(g.length === 64))
    assert(ImageDecode.decodedDims(gif) === Some((40, 24)))
    val again = ImageDecode.gifFrameGrids(gif, 8, 8)
    assert(grids.zip(again).forall { case (a, b) => a.sameElements(b) },
      "decode must be deterministic — sampled corpora replay bit-exactly")
  }

  test("scene cut on real pixels: opposed-gradient shots hash far apart, within-shot stays put") {
    import spark.implicits._
    val sigs = Seq(gif).toDF("payload")
      .select(posexplode(
        ImageDecode.gifFrameGridsCol(col("payload"), 8, 8))
        .as(Seq("fi", "frame")))
      .select(col("fi"), Multimodal.dhash60(col("frame")).as("sig"))
      .orderBy("fi").collect().map(r => r.getLong(1))
    assert(sigs.length === 4)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) <= 10, "within shot A: no cut")
    assert(ham(sigs(2), sigs(3)) <= 10, "within shot B: no cut")
    assert(ham(sigs(1), sigs(2)) > 10,
      s"across the cut the gradient-sign hash must flip: ${ham(sigs(1), sigs(2))}")
  }

  test("maxFrames bounds hostile payloads; single-frame PNG yields one grid") {
    val many = makeGif(Seq.fill(9)(ramp(16, 16, reverse = false)))
    val capped = ImageDecode.gifFrameGrids(many, 8, 8, maxFrames = 3)
    assert(capped != null && capped.length === 3)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ramp(16, 16, reverse = false), "png", bos)
    val png = ImageDecode.gifFrameGrids(bos.toByteArray, 8, 8)
    assert(png != null && png.length === 1)
    assert(ImageDecode.gifFrameGrids("not an image".getBytes, 8, 8) == null)
  }
}
