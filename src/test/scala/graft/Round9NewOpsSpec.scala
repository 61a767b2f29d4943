package graft

import graft.operators.{Graph, Marketing, Similarity}
import org.apache.spark.sql.functions._

/** Closed-form pins for the round-9 operators (the oracle gate covers the
  * corpus shapes; these pin hand-computable graphs/timelines).
  */
class Round9NewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("harmonicCentrality: star + chain give the textbook values") {
    // 1 -> {2,3,4} (star), 2 -> 5 -> 6 (chain): from seed 1,
    // d=1: {2,3,4}, d=2: {5}, d=3: {6}  => H = 3/1 + 1/2 + 1/3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 6L).toDF("id")
    val rows = Graph.harmonicCentrality(edges, "src", "dst", seeds, "id", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (n1, n2, n3, h) = rows(1L)
    assert((n1, n2, n3) === ((3L, 1L, 1L)))
    assert(math.abs(h - (3.0 + 0.5 + 1.0 / 3.0)) < 1e-5, s"harmonic $h")
    // seed 6 reaches nothing (sink) -> no row (reaches-at-least-one contract)
    assert(!rows.contains(6L))
  }

  test("harmonicCentrality: truncation at maxHops and shortest-distance wins") {
    // 1 -> 2 -> 3 and 1 -> 3 directly: node 3 counts at d=1, not d=2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.harmonicCentrality(edges, "src", "dst", seeds, "id", 2)
      .head()
    // d=1: {2,3}; d=2: {4}; node 5 is beyond maxHops=2
    assert((r.getLong(1), r.getLong(2)) === ((2L, 1L)))
    assert(r.getDouble(3) === 2.0 + 0.5)
  }

  test("embeddingOutliers: the planted far vector tops the list") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    // cell 0: tight cluster around (1, 0) + ONE planted outlier at 45°;
    // cell 1: tight cluster around (0, 1)
    val vecs =
      (1L to 20L).map(i => (i, Seq(1.0, 0.001 * i))) ++
        Seq((99L, Seq(1.0, 1.0))) ++
        (101L to 120L).map(i => (i, Seq(0.001 * (i - 100), 1.0)))
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.embeddingOutliers(df, "vec_id", "embedding",
        centroids, topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(top.head._1 === 99L, s"planted outlier not ranked first: ${top.toSeq}")
    assert(top.head._3 > 2.0, "outlier z-score implausibly small")
  }

  test("attributeTimeDecay: dyadic credits at exact half-life boundaries") {
    val hl = 100L // half-life in ts units
    // conversion at t=1000; touches at 1000-50 (k=0 -> 1.0),
    // 1000-150 (k=1 -> 0.5), 1000-250 (k=2 -> 0.25), 1000-200 (k=2: exact
    // 2 half-lives -> 0.25); a second user with no conversion contributes 0
    val events = Seq(
      (1L, 950L, 10L, "click"), (1L, 850L, 11L, "view"),
      (1L, 750L, 12L, "click"), (1L, 800L, 13L, "view"),
      (1L, 1000L, 14L, "purchase"),
      (2L, 500L, 20L, "click"))
      .toDF("user_id", "t", "event_id", "event_type")
    val got = Marketing.attributeTimeDecay(events, "user_id", "t",
        "event_id", "event_type", Seq("view", "click"), "purchase",
        halfLifeUs = hl)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("click") === ((2L, 1.0 + 0.25)))        // k=0 and k=2
    assert(got("view") === ((2L, 0.5 + 0.25)))         // k=1 and k=2 (exact boundary)
  }
}
