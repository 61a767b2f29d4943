package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftExpressionBridge

/** Custom Catalyst expressions for the hot scalar kernels.
  *
  * Why custom expressions (brief §custom-operators tier (b)): the built-in
  * formulations of these kernels are either thousand-term unrolled trees
  * (janino 64 KB limit → repeated failed compiles + interpreted fallback) or
  * higher-order-function folds (never codegen'd). Each expression here
  * generates a single static call into [[Kernels]] — compact generated code
  * that stays inside whole-stage codegen, with the loop JIT-compiled.
  *
  * Results are bit-identical to the expression formulations (see the
  * cross-engine contract note in [[Kernels]]), so the DuckDB oracles are
  * unaffected.
  */
object KernelExpressions {

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }


  /** Analysis-time type gate for the vector kernels: an array column of
    * the WRONG element type would otherwise pass analysis and be
    * reinterpreted bytewise by the unsafe accessors (array<int> read as
    * doubles = silent garbage, not an error).
    */
  private def requireArrayOf(e: Expression, pos: String,
      elems: Set[DataType]): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) if elems.contains(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$pos argument must be array<${elems.map(_.simpleString).mkString("|")}>, got ${other.simpleString}")
    }

  private val FloatingElems: Set[DataType] =
    Set(org.apache.spark.sql.types.FloatType, DoubleType)

  private def checkBothArrays(l: Expression, r: Expression,
      elems: Set[DataType]): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val a = requireArrayOf(l, "first", elems)
    if (a.isSuccess) requireArrayOf(r, "second", elems) else a
  }

  /** Cosine similarity of two numeric array columns (float or double). */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkBothArrays(left, right, FloatingElems)
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Kernels.cosine($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Dot product of two numeric array columns (strict on dimensions). */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkBothArrays(left, right, FloatingElems)
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Kernels.dot($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Language-ID winner over a tokenized array per static marker profiles. */
  case class LangIdPick(child: Expression, langs: Seq[String],
      markers: Seq[Seq[String]]) extends UnaryExpression {
    override def dataType: DataType = StringType
    private lazy val langArr = langs.map(UTF8String.fromString).toArray
    private lazy val markerFlat = markers.flatten.map(UTF8String.fromString).toArray
    private lazy val offsets = markers.scanLeft(0)(_ + _.size).toArray
    override protected def nullSafeEval(t: Any): Any =
      Kernels.langIdPick(t.asInstanceOf[ArrayData], markerFlat, offsets, langArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rm = ctx.addReferenceObj("markers", markerFlat,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val ro = ctx.addReferenceObj("offsets", offsets, "int[]")
      val rl = ctx.addReferenceObj("langs", langArr,
        "org.apache.spark.unsafe.types.UTF8String[]")
      defineCodeGen(ctx, ev, t =>
        s"graft.functions.Kernels.langIdPick($t, $rm, $ro, $rl)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-table SRP bucket keys (t*2^bits | bucket) over a ±1 plane matrix. */
  case class SrpBucketKeys(child: Expression, planes: Seq[Double],
      numTables: Int, bits: Int) extends UnaryExpression {
    require(numTables > 0 && bits > 0 && bits <= 62,
      s"srpBucketKeys: numTables=$numTables bits=$bits out of range (1..62 bits)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val planesArr = planes.toArray
    override protected def nullSafeEval(v: Any): Any =
      Kernels.srpBucketKeys(v.asInstanceOf[ArrayData], planesArr, numTables,
        bits, isFloatArr(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planesArr, "double[]")
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.Kernels.srpBucketKeys($v, $ref, $numTables, $bits, ${isFloatArr(child)})")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature over char n-gram shingles of lower(text). */
  case class MinhashSig(child: Expression, n: Int, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val (coeffA, coeffB) = {
      val cs = graft.operators.Dedup.minhashCoeffs(numHashes)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    }
    override protected def nullSafeEval(t: Any): Any =
      Kernels.minhashSignature(t.asInstanceOf[UTF8String], n, coeffA, coeffB)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ra = ctx.addReferenceObj("coeffA", coeffA, "long[]")
      val rb = ctx.addReferenceObj("coeffB", coeffB, "long[]")
      defineCodeGen(ctx, ev, t =>
        s"graft.functions.Kernels.minhashSignature($t, $n, $ra, $rb)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Symmetric per-vector int8 quantization of a numeric array column. */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.int8Quantize(v.asInstanceOf[ArrayData], isFloatArr(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.Kernels.int8Quantize($v, ${isFloatArr(child)})")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 1-bit sign quantization to packed longs ([[Kernels.signBits]]) —
    * the binary-quantized ANN coarse representation (64 dims per word).
    */
  case class SignBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.signBits(v.asInstanceOf[ArrayData], isFloatArr(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.Kernels.signBits($v, ${isFloatArr(child)})")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hamming distance of two packed bit arrays ([[Kernels.hammingLong]]) —
    * xor + popcount per word, the binary-ANN scan kernel.
    */
  case class HammingLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkBothArrays(left, right, Set(LongType))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hammingLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hammingLong($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 60-bit dHash of a binary column's first 61 bytes ([[Kernels.dhash60]];
    * -1 = payload too short). */
  case class Dhash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.dhash60(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v => s"graft.functions.Kernels.dhash60($v)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Jaro-Winkler similarity of two string columns ([[Kernels.jaroWinkler]]
    * — DuckDB-compatible variant, boost only above jaro 0.7). */
  case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Integer dot product of two long-array columns. */
  case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkBothArrays(left, right, Set(LongType))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dotLong($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** PQ code array of a vector against flat literal codebooks
    * ([[Kernels.pqEncode]]) — numSub x ksub centroid scans in one static
    * call instead of an interpreted higher-order-function argmin tree.
    */
  case class PqEncode(child: Expression, books: Seq[Double], numSub: Int,
      ksub: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private lazy val booksArr = books.toArray
    override protected def nullSafeEval(v: Any): Any =
      Kernels.pqEncode(v.asInstanceOf[ArrayData], booksArr, numSub, ksub,
        isFloatArr(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", booksArr, "double[]")
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.Kernels.pqEncode($v, $ref, $numSub, $ksub, ${isFloatArr(child)})")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ADC distance of (codes, query vector) against the same flat codebooks
    * ([[Kernels.pqAdc]]).
    */
  case class PqAdc(left: Expression, right: Expression, books: Seq[Double],
      numSub: Int, ksub: Int) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val booksArr = books.toArray
    override protected def nullSafeEval(codes: Any, q: Any): Any =
      Kernels.pqAdc(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
        booksArr, numSub, ksub, isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", booksArr, "double[]")
      defineCodeGen(ctx, ev, (codes, q) =>
        s"graft.functions.Kernels.pqAdc($codes, $q, $ref, $numSub, $ksub, ${isFloatArr(right)})")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Morton z-value of two non-negative long coordinates ([[Kernels.zValue2]]). */
  case class ZValue2(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits > 0 && bits <= 31, s"zvalue needs 1..31 bits per dim, got $bits")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.zValue2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.zValue2($a, $b, $bits)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Merge-scan intersection count of two sorted long arrays. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Distinct poly-hashed char n-gram shingles of lower(text). */
  case class CharShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.charShingleHashes(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.charShingleHashes($t, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Sorted distinct winnowed (min-of-w-window) k-gram fingerprints. */
  case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k > 0 && w > 0, s"winnowing needs positive k/w, got k=$k w=$w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.winnowedFingerprints(t.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.winnowedFingerprints($t, $k, $w)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Poly hashes of every char n-gram OCCURRENCE of lower(text), in order. */
  case class CharNgramOccHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.charNgramOccHashes(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.charNgramOccHashes($t, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct poly-hashed word n-gram shingles of trim(text). */
  case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.wordShingleHashes(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.wordShingleHashes($t, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class TextQualityStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.textQualityStats(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.textQualityStats($t)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WordNgramStrings(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.wordNgramStrings(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.wordNgramStrings($t, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** [total, distinct, maxRun] occurrence stats of word n-grams of
    * trim(text) — basis of the Gopher repetition signals.
    */
  case class WordNgramStats(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      Kernels.wordNgramStats(t.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.wordNgramStats($t, $n)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** BPE token count of whitespace words under a frozen merge table
    * (precompiled to parallel left/right symbol arrays in rank order).
    */
  case class BpeTokenCount(child: Expression, lefts: Seq[String], rights: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    private lazy val leftsArr = lefts.toArray
    private lazy val rightsArr = rights.toArray
    override protected def nullSafeEval(t: Any): Any =
      Kernels.bpeTokenCount(t.asInstanceOf[UTF8String], leftsArr, rightsArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rl = ctx.addReferenceObj("lefts", leftsArr, "java.lang.String[]")
      val rr = ctx.addReferenceObj("rights", rightsArr, "java.lang.String[]")
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.bpeTokenCount($t, $rl, $rr)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Packed JPEG dimensions `(width << 16) | height` from the SOF segment
    * walk; -1 when the payload has no frame header.
    */
  case class JpegDims(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.jpegDims(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.jpegDims($b)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Packed PNG/GIF/JPEG dimensions `(width << 32) | height`; -1 when the
    * payload is not an image or its header is truncated.
    */
  case class ImageDims(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.imageDims(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.imageDims($b)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Header-exact, payload-subsampled resize seam for image payloads. */
  case class ResizeStub(child: Expression, factor: Int) extends UnaryExpression {
    require(factor > 0, "factor must be positive")
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.resizeStub(b.asInstanceOf[Array[Byte]], factor)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.resizeStub($b, $factor)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WavFormat(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.wavFormat(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.wavFormat($b)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MP4/ISO-BMFF mvhd metadata packed long ([[Kernels.mp4Meta]]). */
  case class Mp4Meta(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.mp4Meta(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.mp4Meta($b)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** AVI MainAVIHeader metadata packed long ([[Kernels.aviMeta]]). */
  case class AviMeta(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(b: Any): Any =
      Kernels.aviMeta(b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.Kernels.aviMeta($b)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Bloom-filter membership probe of a long column against a driver-built
    * filter (`df.stat.bloomFilter` — Spark's public sketch, built
    * distributed via treeAggregate). The filter rides to executors as a
    * codegen reference object — one `mightContainLong` per row, no join.
    * False positives only (callers follow with an exact verify join);
    * never false negatives.
    */
  case class BloomMightContain(child: Expression,
      bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(h: Any): Any =
      bloom.mightContainLong(h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      defineCodeGen(ctx, ev, h => s"$ref.mightContainLong($h)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 60-bit SimHash of lower(text) over whitespace tokens. */
  case class Simhash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(t: Any): Any =
      Kernels.simhash60(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t => s"graft.functions.Kernels.simhash60($t)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ----------------------------------------------------- Column wrappers

  private def e(c: Column): Expression = GraftExpressionBridge.expression(c)
  private def c(x: Expression): Column = GraftExpressionBridge.column(x)

  def vecCosine(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))
  def vecDot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))
  def langIdPick(toks: Column, langs: Seq[String],
      markers: Seq[Seq[String]]): Column = c(LangIdPick(e(toks), langs, markers))

  def srpBucketKeys(v: Column, planes: Seq[Seq[Double]], numTables: Int,
      bits: Int): Column =
    c(SrpBucketKeys(e(v), planes.flatten, numTables, bits))

  def minhashSig(text: Column, n: Int, numHashes: Int): Column =
    c(MinhashSig(e(text), n, numHashes))

  def simhash60(text: Column): Column = c(Simhash60(e(text)))

  def charShingleHashes(text: Column, n: Int): Column = c(CharShingleHashes(e(text), n))

  def sortedIntersectCount(a: Column, b: Column): Column =
    c(SortedIntersectCount(e(a), e(b)))

  def wordShingleHashes(text: Column, n: Int): Column = c(WordShingleHashes(e(text), n))

  def charNgramOccHashes(text: Column, n: Int): Column = c(CharNgramOccHashes(e(text), n))

  def winnowedFingerprints(text: Column, k: Int, w: Int): Column =
    c(WinnowedFingerprints(e(text), k, w))

  def wordNgramStrings(text: Column, n: Int): Column = c(WordNgramStrings(e(text), n))

  def textQualityStats(text: Column): Column = c(TextQualityStats(e(text)))

  def wordNgramStats(text: Column, n: Int): Column = c(WordNgramStats(e(text), n))

  def jpegDims(bin: Column): Column = c(JpegDims(e(bin)))

  def imageDims(bin: Column): Column = c(ImageDims(e(bin)))

  def resizeStub(bin: Column, factor: Int): Column = c(ResizeStub(e(bin), factor))

  def wavFormat(bin: Column): Column = c(WavFormat(e(bin)))

  def mp4Meta(bin: Column): Column = c(Mp4Meta(e(bin)))

  def aviMeta(bin: Column): Column = c(AviMeta(e(bin)))

  def bpeTokenCount(text: Column, lefts: Seq[String], rights: Seq[String]): Column =
    c(BpeTokenCount(e(text), lefts, rights))

  def bloomMightContain(h: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    c(BloomMightContain(e(h), bloom))

  def int8Quantize(v: Column): Column = c(Int8Quantize(e(v)))

  def dotLong(a: Column, b: Column): Column = c(DotLong(e(a), e(b)))

  def signBits(v: Column): Column = c(SignBits(e(v)))

  def hammingLong(a: Column, b: Column): Column = c(HammingLong(e(a), e(b)))

  def jaroWinkler(a: Column, b: Column): Column = c(JaroWinkler(e(a), e(b)))

  def dhash60(bin: Column): Column = c(Dhash60(e(bin)))

  def pqEncode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    c(PqEncode(e(vec), books.flatten.flatten, books.size, books.head.size))

  def pqAdc(codes: Column, q: Column, books: Seq[Seq[Seq[Double]]]): Column =
    c(PqAdc(e(codes), e(q), books.flatten.flatten, books.size, books.head.size))

  def zValue2(x: Column, y: Column, bits: Int = 21): Column =
    c(ZValue2(e(x), e(y), bits))
}
