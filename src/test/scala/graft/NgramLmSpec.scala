package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("bigram LM scores fluent text above gibberish, zero for short docs") {
    val fluent = (0L until 20L).map(i =>
      (i, "en", "the cat sat on the mat and the dog sat on the log"))
    val docs = (fluent ++ Seq(
      (100L, "en", "zq xv jk qwp vbn mlk zzx qqy"), // gibberish
      (101L, "en", "x"), (102L, "en", ""))).toDF("doc_id", "lang", "text")
    val model = NgramLm.charBigramModel(docs, "doc_id", "lang", "text")
    val out = NgramLm.lmScore(docs, "doc_id", "lang", "text", model)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_score"))).toMap
    assert(out(0L)._2 > out(100L)._2 * 5,
      s"fluent ${out(0L)} should dwarf gibberish ${out(100L)}")
    assert(out(101L) == (0L, 0L) && out(102L) == (0L, 0L))
    // scoring against a DIFFERENT corpus's model: unseen bigrams score 0
    val foreign = Seq((200L, "en", "üöä ßüö"))
      .toDF("doc_id", "lang", "text")
    val cross = NgramLm.lmScore(foreign, "doc_id", "lang", "text", model)
      .collect().head
    assert(cross.getAs[Long]("n_bigrams") > 0 && cross.getAs[Long]("lm_score") == 0L)
  }

  test("model terms are bounded smoothed probabilities") {
    val docs = Seq((0L, "en", "aaab")).toDF("doc_id", "lang", "text")
    // C(a,a)=2, C(a,b)=1, C(a,*)=3: terms = 2e6/103, 1e6/103 floored
    val m = NgramLm.charBigramModel(docs, "doc_id", "lang", "text")
      .select("term").as[Long].collect().sorted
    assert(m.toSeq == Seq(1000000L / 103L, 2 * 1000000L / 103L))
  }

  test("scoreTertiles: value-based rank-tertile cut, per group") {
    // en: scores 90..10 (9 docs) -> head {90,80,70}, middle {60,50,40},
    // tail {30,20,10}; de: one doc -> head by definition
    val rows = (1 to 9).map(i => (i.toLong, "en", (10 * (10 - i)).toLong)) :+
      ((100L, "de", 5L))
    val out = NgramLm.scoreTertiles(rows.toDF("id", "g", "score"), "g", "score")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert((1 to 3).forall(i => out(i.toLong) == "head"))
    assert((4 to 6).forall(i => out(i.toLong) == "middle"))
    assert((7 to 9).forall(i => out(i.toLong) == "tail"))
    assert(out(100L) == "head")
  }

  test("scoreTertiles: tied scores share a bucket instead of splitting") {
    // 6 docs all score 7: cum*3 >= total at the only score value ->
    // everyone is head; no arbitrary ntile split of ties
    val rows = (1 to 6).map(i => (i.toLong, "en", 7L))
    val out = NgramLm.scoreTertiles(rows.toDF("id", "g", "score"), "g", "score")
      .select("bucket").as[String].collect()
    assert(out.forall(_ == "head"))
  }
}
