package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.functions.{ImageDecode, Kernels, Multimodal}
import org.apache.spark.sql.functions._

/** Real VIDEO pixel decode: mux JDK-encoded JPEG frames into a hand-built
  * MJPEG AVI, decode it through [[ImageDecode.aviMjpegFrameGrids]], and pin
  * (a) frame count + bit-identical re-decode, (b) the scene-cut contract
  * end-to-end on REAL video pixels (the exact test `m_scene_cuts` applies
  * to the stub frames), (c) the table-less-MJPEG repair path: stripping the
  * DHT segments real MJPEG muxers omit must still decode — to the SAME
  * pixels — via the ITU T.81 Annex K standard tables
  * ([[ImageDecode.withStandardHuffman]]), which validates those table
  * constants bit-for-bit against the JDK encoder's own standard tables.
  * Also pins [[Kernels.aviMeta]] edge semantics the `m_avi_meta` oracle
  * row can't reach (sentinels, truncation, slot overflow).
  */
class AviDecodeSpec extends SparkTestBase {

  /** Horizontal luma ramp, as GifDecodeSpec: `reverse` flips the gradient
    * so the dHash flips nearly every bit across a scene cut. */
  private def ramp(w: Int, h: Int, reverse: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = if (reverse) w - 1 - x else x
      val v = (t * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Remove every DHT (FFC4) segment — the table-less frame shape real
    * MJPEG muxers emit (OpenDML says decoders must assume the standard
    * tables). Walks header segments exactly like the repair path. */
  private def stripDht(jpeg: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(jpeg, 0, 2) // SOI
    var p = 2
    var done = false
    while (!done && p + 3 < jpeg.length) {
      val m = jpeg(p + 1) & 0xFF
      if (m == 0xDA) { out.write(jpeg, p, jpeg.length - p); done = true }
      else {
        val len = ((jpeg(p + 2) & 0xFF) << 8) | (jpeg(p + 3) & 0xFF)
        if (m != 0xC4) out.write(jpeg, p, 2 + len)
        p += 2 + len
      }
    }
    out.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes ++ le32(body.length.toLong) ++ body ++ pad
  }

  private def list(listType: String, contents: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes ++ contents)

  /** Hand-built MJPEG AVI: RIFF/AVI + LIST hdrl { avih } + LIST movi with
    * one `00dc` JPEG chunk per frame (optionally grouped in `rec ` lists,
    * the OpenDML interleave shape). */
  private def makeAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      recGroups: Boolean = false, junkBeforeHdrl: Boolean = false): Array[Byte] = {
    val avihBody = le32(33333L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(frames.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avihBody))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi",
      if (recGroups) frameChunks.grouped(2).map(g => list("rec ", g.flatten.toArray))
        .flatten.toArray
      else frameChunks.flatten.toArray)
    val junk = if (junkBeforeHdrl) chunk("JUNK", Array.fill(4)(0.toByte))
      else Array.empty[Byte]
    val body = "AVI ".getBytes ++ junk ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length.toLong) ++ body
  }

  private val shotA = Seq.fill(2)(jpegBytes(ramp(40, 24, reverse = false)))
  private val shotB = Seq.fill(2)(jpegBytes(ramp(40, 24, reverse = true)))
  private val avi = makeAvi(shotA ++ shotB, 40, 24)

  test("MJPEG AVI: frame count, meta walk, and bit-identical re-decode") {
    val grids = ImageDecode.aviMjpegFrameGrids(avi, 8, 8)
    assert(grids != null && grids.length === 4)
    grids.foreach(g => assert(g.length === 64))
    val again = ImageDecode.aviMjpegFrameGrids(avi, 8, 8)
    assert(grids.zip(again).forall { case (a, b) => a.sameElements(b) },
      "decode must be deterministic — sampled corpora replay bit-exactly")
    val meta = Kernels.aviMeta(avi)
    assert(meta === ((40L << 48) | (24L << 32) | (4L << 16) | 33333L))
  }

  test("scene cut on real video pixels: opposed-gradient shots hash far apart") {
    import spark.implicits._
    val sigs = Seq(avi).toDF("payload")
      .select(posexplode(
        ImageDecode.aviFrameGridsCol(col("payload"), 8, 8))
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

  test("table-less MJPEG frames decode to the SAME pixels via Annex K injection") {
    val full = jpegBytes(ramp(32, 16, reverse = false))
    val bare = stripDht(full)
    assert(bare.length < full.length, "strip must remove the DHT segments")
    // JDK 17's decoder happens to substitute the standard tables itself
    // (MJPEG-style streams decode bare); the explicit injection stays as
    // the safety net for decoders without that fallback. The repaired
    // stream decodes with OUR spliced tables, so pixel-identity against
    // the full stream validates the Annex K constants bit for bit — a
    // wrong table would decode to different (or no) pixels.
    val repaired = ImageDecode.withStandardHuffman(bare)
    assert(repaired.length === bare.length + 420,
      "repair must splice exactly the 420-byte standard DHT segment")
    val viaRepair = ImageDecode.lumaGrid(repaired, 8, 8)
    val viaFull = ImageDecode.lumaGrid(full, 8, 8)
    assert(viaRepair != null && viaFull != null)
    assert(viaRepair.sameElements(viaFull),
      "Annex K constants must reproduce the encoder's standard tables exactly")
    // end-to-end: an AVI of table-less frames decodes through the same path
    val bareAvi = makeAvi(Seq(bare, bare), 32, 16)
    val grids = ImageDecode.aviMjpegFrameGrids(bareAvi, 8, 8)
    assert(grids != null && grids.length === 2)
    assert(grids(0).sameElements(viaFull))
    // a stream that already carries tables passes through untouched
    assert(ImageDecode.withStandardHuffman(full) eq full)
  }

  test("rec -grouped interleave, JUNK padding, maxFrames, and hostile inputs") {
    val frames = Seq.fill(5)(jpegBytes(ramp(16, 16, reverse = false)))
    val grouped = makeAvi(frames, 16, 16, recGroups = true, junkBeforeHdrl = true)
    val grids = ImageDecode.aviMjpegFrameGrids(grouped, 8, 8)
    assert(grids != null && grids.length === 5, "rec  sub-lists walk one level")
    assert(Kernels.aviMeta(grouped) ===
      ((16L << 48) | (16L << 32) | (5L << 16) | 33333L),
      "avih is found through the JUNK chunk")
    val capped = ImageDecode.aviMjpegFrameGrids(grouped, 8, 8, maxFrames = 3)
    assert(capped != null && capped.length === 3)
    // undecodable frame chunks are skipped, not fatal
    val mixed = makeAvi(Seq(frames.head, "garbage".getBytes, frames.head), 16, 16)
    val mg = ImageDecode.aviMjpegFrameGrids(mixed, 8, 8)
    assert(mg != null && mg.length === 2)
    // non-AVI / truncated payloads → null (and -1 from the meta kernel)
    assert(ImageDecode.aviMjpegFrameGrids("not a video".getBytes, 8, 8) == null)
    assert(ImageDecode.aviMjpegFrameGrids(avi.take(20), 8, 8) == null)
    assert(Kernels.aviMeta("not a video".getBytes) === -1L)
    assert(Kernels.aviMeta(avi.take(20)) === -1L)
    // slot overflow (width > 0x7FFF) yields the sentinel, never bleed
    val wide = makeAvi(Seq(frames.head), 0x8000, 16)
    assert(Kernels.aviMeta(wide) === -1L)
  }
}
