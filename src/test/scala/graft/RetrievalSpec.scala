package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Retrieval operators against naive in-memory references on a planted
  * corpus — formula-level checks independent of the DuckDB oracle.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "en", "spark spark spark join"),
    (2L, "en", "join scan filter"),
    (3L, "en", "spark filter"),
    (4L, "de", "scan scan join spark"),
    (5L, "de", "filter"),
    (6L, "de", "   "))

  private def df = corpus.toDF("doc_id", "lang", "text")

  private def naiveToks(t: String): Seq[String] =
    t.trim match { case "" => Nil; case s => s.split("\\s+").toSeq }

  test("tfidfKeywords matches a naive reference on tf, df and ranking") {
    val out = Retrieval.tfidfKeywords(df, "doc_id", "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet

    val docs = corpus.filter(c => c._3.trim.nonEmpty)
    val n = docs.size
    val tf = docs.flatMap(c => naiveToks(c._3).map(tk => (c._2, tk)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfreq = docs.flatMap(c => naiveToks(c._3).distinct.map(tk => tk))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = tf.toSeq.map { case ((lang, term), f) =>
      val d = dfreq(term)
      val score = BigDecimal(f * math.log(n.toDouble / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lang, term, f, d, score)
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._5, r._2)).zipWithIndex.take(2)
        .map { case ((lang, term, f, d, s), i) => (lang, term, f, d, s, i + 1L) }
    }.toSet
    assert(out == expected)
  }

  test("bm25TopK ranks the heavy-tf short doc first and scores match naive BM25") {
    val out = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark", "scan"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    val docs = corpus.filter(c => c._3.trim.nonEmpty).map(c => (c._1, naiveToks(c._3)))
    val n = docs.size
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val terms = Seq("spark", "scan")
    val dfreq = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def score(toks: Seq[String]): (Long, Double) = {
      val hit = terms.filter(toks.contains)
      val s = hit.map { t =>
        val f = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
        idf * (f * 2.2) / (f + 1.2 * (1.0 - 0.75 + 0.75 * toks.size / avgdl))
      }.sum
      (hit.size.toLong, s)
    }
    val expected = docs.map { case (id, toks) => val (nt, s) = score(toks)
        (id, nt, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .filter(_._2 > 0)
      .sortBy(r => (-r._3, r._1)).zipWithIndex
      .map { case ((id, nt, s), i) => (id, nt, s, i + 1L) }
    assert(out.toSeq == expected)
    // doc 4 hits both terms (2×scan + spark) and must out-rank the
    // single-term docs
    assert(out.head._1 == 4L)
  }

  test("bm25TopK rejects an empty query") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Nil)
    }
  }

  test("rrfFuseTopK: both-list docs outrank single-list docs; absent side is null") {
    val sparse = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val dense = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuseTopK(sparse, dense, "id", "rank", k = 10)
      .select("id", "rank_sparse", "rank_dense", "rrf_score", "rank")
      .as[(Long, Option[Long], Option[Long], Double, Long)]
      .collect().sortBy(_._5)
    def rrf(ranks: Seq[Long]) = BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2 appears in both lists -> highest fused score despite being
    // rank 2 in the sparse list
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(out(0) === ((2L, Some(2L), Some(1L), rrf(Seq(2L, 1L)), 1L)))
    assert(out(1) === ((1L, Some(1L), None, rrf(Seq(1L)), 2L)))
    assert(out(2) === ((3L, None, Some(2L), rrf(Seq(2L)), 3L)))
  }

  test("rrfFuseTopK respects k with deterministic tie-breaks") {
    val sparse = (1L to 5L).map(i => (i, i)).toDF("id", "rank")
    val dense = (1L to 5L).map(i => (i + 10L, i)).toDF("id", "rank")
    val out = Retrieval.rrfFuseTopK(sparse, dense, "id", "rank", k = 4)
      .select("id").as[Long].collect().toSeq
    // rank i on either side scores identically -> ties break by id
    assert(out === Seq(1L, 11L, 2L, 12L))
  }
}
