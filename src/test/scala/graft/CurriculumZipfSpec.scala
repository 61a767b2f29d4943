package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-8 additions: curriculum ordering (global
  * position without a global sort) and the Zipf-law fit.
  */
class CurriculumZipfSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("curriculum order: global_pos is a gap-free permutation of 1..N") {
    val out = SparkEntry.queries("c_curriculum_order")(spark, dir)
      .select("global_pos").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val n = spark.read.parquet(dir + "/documents.parquet").count()
    assert(out.length == n)
    assert(out.head == 1L && out.last == n && out.distinct.length == out.length,
      s"global_pos is not the permutation 1..$n")
  }

  test("curriculum order: closed-form stage sizes match actual group counts") {
    val out = SparkEntry.queries("c_curriculum_order")(spark, dir)
      .groupBy("lang", "stage").agg(count(lit(1)).as("actual"),
        max(col("pos")).as("max_pos"))
      .collect()
    // the engine's offsets assumed cnt(lang, stage) = floor(n*k/4) -
    // floor(n*(k-1)/4); if that sizing were off, pos would overflow or
    // undershoot the actual group size
    out.foreach { r =>
      assert(r.getAs[Long]("actual") == r.getAs[Long]("max_pos"),
        s"stage sizing mismatch at $r")
    }
    val langs = out.map(_.getAs[String]("lang")).distinct
    langs.foreach { l =>
      val stages = out.filter(_.getAs[String]("lang") == l)
        .map(_.getAs[Long]("stage")).sorted
      assert(stages.sameElements(Array(1L, 2L, 3L, 4L)), s"missing stage for $l")
    }
  }

  test("curriculum order: stage 1 quality dominates stage 4 per language") {
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("q"))
    val staged = SparkEntry.queries("c_curriculum_order")(spark, dir)
      .join(docs, Seq("doc_id", "lang"))
    val byLang = staged.groupBy("lang").agg(
      min(when(col("stage") === 1, col("q"))).as("min_s1"),
      max(when(col("stage") === 4, col("q"))).as("max_s4")).collect()
    byLang.foreach { r =>
      assert(r.getAs[Double]("min_s1") >= r.getAs[Double]("max_s4"),
        s"quality ordering violated for ${r.getAs[String]("lang")}")
    }
  }

  test("zipf fit: slope negative, r2 in (0,1], and exact on a planted power law") {
    val row = SparkEntry.queries("t_zipf_fit")(spark, dir).collect().head
    // sf0.001's synthetic vocabulary is tiny; the fit takes min(vocab, 500)
    val k = row.getAs[Long]("k_terms")
    assert(k > 1L && k <= 500L)
    assert(row.getAs[Double]("zipf_slope") < 0.0)
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0)

    // closed-form check: regress a perfect power law n = 1000 * rank^-1
    // through the same least-squares arithmetic -> slope -1, r2 1
    val xs = (1 to 100).map(r => math.log(r.toDouble))
    val ys = xs.map(x => math.log(1000.0) - x)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - (-1.0)) < 1e-9)
  }
}
