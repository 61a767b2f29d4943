package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column operators (`Array[Float]` columns).
  *
  * Pure expression trees over `zip_with`/`aggregate` — codegen'd, no UDFs.
  * All math is done in double after casting, sequentially over the array, so
  * results are bit-deterministic regardless of partitioning.
  */
object VectorOps {

  private def d(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** ±1 entry of the Rademacher plane family: two xor-shift-multiply rounds
    * (murmur-finalizer style) over the flat index, all intermediates inside
    * a positive 63-bit range. A single multiplicative round is a Weyl
    * rotation in the low bits — measurably correlated planes (LSH recall
    * stuck below target on real data); two rounds restore the independent-
    * plane recall of true random Rademacher projections (Achlioptas '03:
    * same locality guarantees as Gaussian planes for SRP).
    */
  def rademacherSign(i: Long): Double = {
    val h0 = (i * 2654435761L) % 4294967296L
    val h1 = h0 ^ (h0 >> 16)
    val h2 = ((h1 % 2147483648L) * 2246822507L) % 4294967296L
    val h3 = h2 ^ (h2 >> 13)
    if ((h3 & 1L) == 1L) 1.0 else -1.0
  }

  /** Deterministic ±1 hyperplanes; plane p entry d uses flat index p*dim+d. */
  def rademacherPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes)(p => Seq.tabulate(dim)(dd => rademacherSign(p.toLong * dim + dd)))
}
