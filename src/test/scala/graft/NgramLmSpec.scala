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
}
