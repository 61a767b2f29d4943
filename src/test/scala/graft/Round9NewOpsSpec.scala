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

  test("shapleyAttribution: two-channel closed form (symmetry + dummy)") {
    // 4 users: {A}=converted, {A}=not, {B}=not, {A,B}=converted.
    // Cumulative v: v(∅)=0 (no untouched users), v(A)=1/2 -> 5e8,
    // v(B)=0/1 -> 0, v(AB)=2/4 -> 5e8.
    // n=2: weights |S|!·(1-|S|)!/2! -> a(0)=1, a(1)=1, denominator 2·1e9.
    // A: (v(A)-v(∅)) + (v(AB)-v(B)) = 5e8 + 5e8 = 1e9 -> 0.5
    // B: (v(B)-v(∅)) + (v(AB)-v(A)) = 0 + 0 = 0 -> 0.0 (B adds nothing)
    // Efficiency: credits sum to v(N) - v(∅) = 0.5 exactly.
    val events = Seq(
      (1L, "a"), (1L, "buy"), (2L, "a"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "buy"))
      .toDF("user_id", "event_type")
    val got = Marketing.shapleyAttribution(events, "user_id", "event_type",
        Seq("a", "b"), "buy")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a") === ((1000000000L, 0.5)))
    assert(got("b") === ((0L, 0.0)))
    // dummy channel never touched: exactly zero credit
    val got3 = Marketing.shapleyAttribution(events, "user_id", "event_type",
        Seq("a", "b", "ghost"), "buy")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got3("ghost") === 0L)
  }

  test("kaplanMeier: the textbook hand-worked curve with censoring") {
    // durations: deaths at 2 (n=5 at risk -> S=0.8), censored 3,
    // deaths at 4 (2 of 3 at risk -> S=0.8·(1/3)), censored 5
    val lt = Seq((2L, false), (3L, true), (4L, false), (4L, false),
      (5L, true)).toDF("dur", "cens")
    val got = Marketing.kaplanMeier(lt, "dur", "cens")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 2)
    assert(got(0) === ((2L, 5L, 1L, 0.8)))
    assert(got(1)._1 === 4L && got(1)._2 === 3L && got(1)._3 === 2L)
    assert(math.abs(got(1)._4 - 0.8 / 3.0) < 2e-6, got(1).toString)
    // everyone dies at the last time -> survival exactly 0.0 there
    val all = Seq((1L, false), (2L, false), (2L, false)).toDF("dur", "cens")
    val g2 = Marketing.kaplanMeier(all, "dur", "cens")
      .orderBy("t").collect()
    assert(g2.last.getDouble(3) === 0.0)
    assert(g2.head.getDouble(3) === round6(2.0 / 3.0))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("Holt fold: hand-worked shift recursion incl. negative trends") {
    // l0=100,b0=0; y=40 -> l=70,b=(-30)>>1=-15 (floor, NOT trunc: -15);
    // chain ends at l=541,b=225 (verified by hand; the same series pinned
    // the DuckDB 1.0 list_reduce accumulator-aliasing bug the oracle's
    // recursive CTE sidesteps)
    val hw = spark.sql(
      """SELECT aggregate(slice(ys, 2, size(ys) - 1),
           named_struct('l', ys[0], 'b', 0L),
           (acc, y) -> named_struct(
             'l', shiftright(y + acc.l + acc.b, 1),
             'b', shiftright(shiftright(y + acc.l + acc.b, 1) - acc.l + acc.b, 1)),
           acc -> acc) AS hw
         FROM (SELECT array(100L, 40L, 7L, 253L, 11L, 999L) AS ys)""").head()
      .getStruct(0)
    assert((hw.getLong(0), hw.getLong(1)) === ((541L, 225L)))
    // floor semantics on a negative intermediate: one step from (100, 0)
    val one = spark.sql(
      """SELECT shiftright(40 + 100 + 0, 1) AS l,
                shiftright(shiftright(40 + 100 + 0, 1) - 100 + 0, 1) AS b""").head()
    assert((one.getInt(0), one.getInt(1)) === ((70, -15)))
  }

  test("feature hashing: fixed width, sign balance, exact integer counts") {
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "alpha ALPHA"),
      (3L, "")).toDF("doc_id", "text")
    val th = graft.operators.Dedup.tokenHash60(col("tok"))
    val feats = docs
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(lower(col("text")))).as("tok"))
      .select(col("doc_id"), pmod(th, lit(1024L)).as("bucket"),
        when(shiftright(th, 10).bitwiseAND(1) === 0, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("bucket")).agg(sum(col("sgn")).as("feat"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 2: both tokens lowercase to "alpha" -> ONE bucket, |feat| = 2
    val d2 = feats.collect { case ((2L, b), f) => (b, f) }
    assert(d2.size === 1 && math.abs(d2.head._2) === 2L)
    // doc 1: alpha twice + beta + gamma; every bucket in [0, 1024)
    assert(feats.keys.forall { case (_, b) => b >= 0 && b < 1024 })
    // doc 3 (empty text) contributes no rows
    assert(!feats.keys.exists(_._1 == 3L))
    // doc 1's alpha bucket matches doc 2's (same token, same hash)
    val aBucket = d2.head._1
    assert(feats.contains((1L, aBucket)))
  }

  test("residualExpr subtracts the NEAREST coarse centroid elementwise") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.2, 0.8)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        graft.operators.Pq.residualExpr(col("embedding"), centroids).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 }
    assert(close(got(1L), Seq(-0.1, 0.1)), got(1L).toString)   // cell 0
    assert(close(got(2L), Seq(0.2, -0.2)), got(2L).toString)   // cell 1
  }

  test("binaryTopK: Hamming candidates then exact-cosine ranks") {
    // query 0 = (1,1,-1,-1). Sign pattern matches: id 1 exactly (hd=0),
    // id 2 in 3 of 4 bits (hd=1), id 3 is the sign-opposite (hd=4).
    // candidates=2 keeps {1,2}; exact cosine then ranks 1 before 2.
    val vecs = Seq(
      (0L, Seq(1.0f, 1.0f, -1.0f, -1.0f)),
      (1L, Seq(0.9f, 0.8f, -0.7f, -0.6f)),
      (2L, Seq(1.0f, 1.0f, -1.0f, 0.5f)),
      (3L, Seq(-1.0f, -1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.binaryTopK(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", k = 2, candidates = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 1), (2L, 2)), got.toSeq.toString)
  }

  test("ssspWeighted: min over a direct edge vs a cheaper two-hop path") {
    // 1 -> 3 direct w=10; 1 -> 2 -> 3 total w=3; parallel 1->2 edges
    // collapse to min(2, 5) = 2. Node 5 pins the HOP-bound contract:
    // within rounds=3 only the expensive route 1->3->4->5 (10+1+1=12)
    // fits — the cheaper 4-hop path (2+1+1+1=5) is out of scope by
    // construction.
    val edges = Seq(
      (1L, 3L, 10L), (1L, 2L, 2L), (1L, 2L, 5L), (2L, 3L, 1L),
      (3L, 4L, 1L), (4L, 5L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.ssspWeighted(edges, "src", "dst", "w", seeds, "id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 12L))
    // one more round settles 5's true distance
    val got4 = Graph.ssspWeighted(edges, "src", "dst", "w", seeds, "id", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got4(5L) === 5L)
  }

  test("modularity: two cliques with one bridge match the hand-computed terms") {
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4: m = 7 undirected edges.
    // Perfect split: intra = 3 each; degrees (2,2,3 | 3,2,2) sum 7 each.
    // q_term = (4*7*3 - 49) / (4*49) = 35/196 each; Q = 70/196 ≈ 0.357
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "community")
    val got = Graph.modularity(labels, "id", "community", edges, "src", "dst")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val want = BigDecimal(35.0 / 196.0).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) === ((3L, 3L, 7L, want)))
    assert(got(20L) === ((3L, 3L, 7L, want)))
    // degenerate all-one-community partition: Q term = intra/m - 1 = 0
    val one = labels.select($"id", lit(1L).as("community"))
    val g1 = Graph.modularity(one, "id", "community", edges, "src", "dst").head()
    assert(g1.getLong(2) === 7L && g1.getDouble(4) === 0.0)
  }
}
