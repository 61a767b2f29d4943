package graft

import org.apache.spark.sql.functions._

import graft.operators.{Importance, Sketches, Temporal}

/** Edge semantics of the temporal joins, the CMS sketch, and DSIR weights —
  * the boundary cases the sf-corpus oracle rows don't isolate.
  */
class TemporalSpec extends SparkTestBase {

  import spark.implicits._

  test("asofJoin: latest right at or before left ts, nulls before any right") {
    val left = Seq(
      (1L, 10L, 5L),   // before any right row -> nulls
      (1L, 10L, 20L),  // equal ts -> that right row ("<=")
      (1L, 10L, 25L),  // between rights -> the 20 one
      (1L, 10L, 40L),  // after the last -> the 30 one
      (2L, 20L, 99L)   // key with no right rows at all
    ).toDF("id", "key", "t")
    val right = Seq((10L, 20L, "a"), (10L, 30L, "b"))
      .toDF("key", "rt", "payload")
    val out = Temporal.asofJoin(left, right, "key", "t", "rt", Seq("payload"))
      .orderBy("key", "t").collect()
    assert(out.map(r => Option(r.getString(3))).toSeq ===
      Seq(None, Some("a"), Some("a"), Some("b"), None))
    // left columns survive untouched
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L, 1L, 2L))
  }

  test("asofJoin plan: one exchange on the key, no nested loop") {
    val left = Seq((1L, 1L, 1L)).toDF("id", "key", "t")
    val right = Seq((1L, 1L, 1L)).toDF("key", "rt", "v")
    val p = Temporal.asofJoin(left, right, "key", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected exactly one hash exchange:\n$p")
  }

  test("asofJoinNative: backward matches the union+window encoding row for row") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "key", "t")
    val right = Seq.tabulate(60)(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("rkey", "rt", "payload")
      .dropDuplicates("rkey", "rt") // unique (key, ts) as both operators require
    val viaWindow = Temporal.asofJoin(left,
        right.withColumnRenamed("rkey", "key"), "key", "t", "rt", Seq("payload"))
      .select("id", "payload").as[(Long, Option[Double])].collect().toMap
    val native = Temporal.asofJoinNative(left, right,
        Seq("key"), Seq("rkey"), "t", "rt")
      .select("id", "payload").as[(Long, Option[Double])].collect().toMap
    assert(native === viaWindow)
  }

  test("asofJoinNative: tolerance bounds staleness, forward finds the next row") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 310L), (4L, 20L, 100L))
      .toDF("id", "key", "t")
    val right = Seq((10L, 90L, "a"), (10L, 300L, "b")).toDF("rkey", "rt", "v")
    // backward, tolerance 50: id=1 matches a (lag 10); id=2 nothing in
    // range (a is 160 stale); id=3 matches b (lag 10); id=4 no key
    val back = Temporal.asofJoinNative(left, right, Seq("key"), Seq("rkey"),
        "t", "rt", toleranceUs = 50L)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(back === Map(1L -> Some("a"), 2L -> None, 3L -> Some("b"), 4L -> None))
    // forward, tolerance 200: id=1 -> b at 300 (lead 200, inclusive bound);
    // id=2 -> b (lead 50); id=3 -> nothing at/after 310; equal-ts check:
    val fwd = Temporal.asofJoinNative(left, right, Seq("key"), Seq("rkey"),
        "t", "rt", toleranceUs = 200L, forward = true)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(fwd === Map(1L -> Some("b"), 2L -> Some("b"), 3L -> None, 4L -> None))
    // forward at exactly-equal timestamps is inclusive
    val eq = Temporal.asofJoinNative(
        Seq((9L, 10L, 300L)).toDF("id", "key", "t"), right,
        Seq("key"), Seq("rkey"), "t", "rt", forward = true)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(eq === Map(9L -> Some("b")))
  }

  test("asofJoinNative: multi-column keys match only when every key column is equal") {
    val left = Seq((1L, 10L, "eu", 100L), (2L, 10L, "us", 100L), (3L, 11L, "eu", 100L))
      .toDF("id", "k1", "k2", "t")
    val right = Seq((10L, "eu", 50L, "a"), (10L, "us", 60L, "b"), (11L, "us", 40L, "c"))
      .toDF("r1", "r2", "rt", "v")
    val out = Temporal.asofJoinNative(left, right, Seq("k1", "k2"),
        Seq("r1", "r2"), "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
  }

  test("asofJoinNative: mismatched key types are an error, not empty output") {
    val left = Seq((1, 1L)).toDF("key", "t") // key: Int
    val right = Seq((1L, 1L, 1.0)).toDF("rkey", "rt", "v") // rkey: Long
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoinNative(left, right, Seq("key"), Seq("rkey"), "t", "rt")
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("asofJoinNative: null keys and null times never match") {
    val left = Seq((1L, Some(10L), Some(100L)), (2L, None, Some(100L)),
        (3L, Some(10L), None))
      .toDF("id", "key", "t")
    val right = Seq((Some(10L), Some(50L), "a"), (None, Some(40L), "x"),
        (Some(10L), None, "y"))
      .toDF("rkey", "rt", "v")
    val out = Temporal.asofJoinNative(left, right, Seq("key"), Seq("rkey"),
        "t", "rt")
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> None, 3L -> None))
  }

  test("asofJoinNative plan: AsofJoinExec with co-partitioned exchanges, no window") {
    val left = Seq((1L, 1L, 1L)).toDF("id", "key", "t")
    val right = Seq((1L, 1L, 1.0)).toDF("rkey", "rt", "v")
    val p = Temporal.asofJoinNative(left, right, Seq("key"), Seq("rkey"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert(!p.contains("Window") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected the two co-partitioned exchanges:\n$p")
  }

  test("asofJoinSalted: row-identical to the unsalted native join on a hot-key corpus") {
    val rnd = new scala.util.Random(11)
    // one pathological key (0) holds ~80% of left rows
    val left = Seq.tabulate(2000) { i =>
      val key = if (rnd.nextInt(10) < 8) 0L else 1L + rnd.nextInt(5).toLong
      (i.toLong, key, rnd.nextInt(100000).toLong)
    }.toDF("id", "key", "t")
    val right = Seq.tabulate(400)(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(100000).toLong, i.toDouble))
      .toDF("rkey", "rt", "payload").dropDuplicates("rkey", "rt")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "payload").as[(Long, Option[Double])].collect().toMap
    for (fwd <- Seq(false, true); tol <- Seq(-1L, 5000L)) {
      val plain = collectPairs(Temporal.asofJoinNative(
        left, right, Seq("key"), Seq("rkey"), "t", "rt", tol, fwd))
      val salted = collectPairs(Temporal.asofJoinSalted(
        left, right, Seq("key"), Seq("rkey"), "t", "rt", tol, fwd,
        numSalts = 8, hotKeyThreshold = 500L))
      assert(salted === plain, s"fwd=$fwd tol=$tol")
    }
  }

  test("asofJoinSalted: the hot key's left rows actually split across salts") {
    val left = Seq.tabulate(4000)(i => (i.toLong, 0L, i.toLong * 7 % 100000))
      .toDF("id", "key", "t")
    val right = Seq.tabulate(50)(i => (0L, i.toLong * 2000, i.toDouble))
      .toDF("rkey", "rt", "payload")
    // same salting arithmetic as asofJoinSalted: hash(t) % 8 over hot rows
    val saltCounts = left
      .withColumn("__salt", pmod(hash(col("t")), lit(8)))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    // the single one-task key becomes >= 6 buckets, none holding more
    // than ~2x the even share — the merge work parallelizes
    assert(saltCounts.size >= 6, s"salts used: $saltCounts")
    assert(saltCounts.values.max <= 4000 / 8 * 2, s"skewed salts: $saltCounts")
    // and the salted join still answers correctly under that split
    val out = Temporal.asofJoinSalted(left, right, Seq("key"), Seq("rkey"),
      "t", "rt", numSalts = 8, hotKeyThreshold = 100L)
    assert(out.count() === 4000L)
    assert(out.filter(col("payload").isNull).count() === 0L)
  }

  test("pointInIntervalJoin: half-open bounds, bin-spanning interval pairs once") {
    val points = Seq((1L, 100L), (2L, 150L), (3L, 199L), (4L, 200L), (5L, 99L))
      .toDF("pid", "t")
    // interval [100, 200) spans many 30-wide bins; each in-range point must
    // appear exactly once, the t=200 point (end-exclusive) and t=99 not at all
    val iv = Seq((7L, 100L, 200L)).toDF("iid", "s", "e")
    val out = Temporal.pointInIntervalJoin(points, "t", iv, "s", "e", 30L)
      .select("pid").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("countMinSketch estimates are >= exact counts and exact without collisions") {
    val toks = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = toks.toDF("tok")
    val sketch = Sketches.countMinSketch(df, "tok")
    val exact = df.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(exact, sketch, "tok")
      .select("tok", "exact_n", "cms_est")
      .as[(String, Long, Long)].collect().map { case (k, n, e) => k -> ((n, e)) }.toMap
    assert(est.forall { case (_, (n, e)) => e >= n })
    // 3 tokens in 4x1024 cells: no collisions, estimates are exact
    assert(est("alpha") === ((5L, 5L)) && est("beta") === ((3L, 3L)) &&
      est("gamma") === ((1L, 1L)))
    // the weighted (pre-aggregated) construction yields the identical sketch
    val weighted = Sketches.countMinSketchWeighted(exact, "tok", "exact_n")
      .as[(Int, Long, Long)].collect().toSet
    assert(weighted === sketch.as[(Int, Long, Long)].collect().toSet)
  }

  test("zValue2 interleaves bits (x even, y odd) and rejects negatives") {
    val df = Seq((3L, 1L), (0L, 0L), (63L, 0L), (0L, 63L)).toDF("x", "y")
      .select(graft.functions.KernelExpressions.zValue2(col("x"), col("y"), 6).as("z"))
    // x=3 -> z bits 0,2 = 5; y=1 -> z bit 1 = 2; 5|2 = 7
    assert(df.as[Long].collect().toSeq === Seq(7L, 0L, 0x555L, 0xAAAL))
    val neg = Seq((-1L, 1L)).toDF("x", "y")
      .select(graft.functions.KernelExpressions.zValue2(col("x"), col("y"), 6))
    assertThrows[Exception](neg.collect())
  }

  test("histogramQuantiles: rank math exact on a known distribution") {
    // values 0..99 once each, binWidth 10: p50 -> rank 50 -> bin 4 (40..49
    // holds cum 41..50), p90 -> rank 90 -> bin 8, p1000 -> last bin
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val out = Sketches.histogramQuantiles(df, "v", 10.0, Seq(500, 900, 1000))
      .as[(Long, Double)].collect().toMap
    assert(out === Map(500L -> 40.0, 900L -> 80.0, 1000L -> 90.0))
  }

  test("mixtureSample: binding source kept whole, others hit their ratio budget") {
    // src a: 100 tokens total, b: 1000, c: 1000; weights 1:1:2 -> a binds:
    // K = min(100*4/1, 1000*4/1, 1000*4/2) = 400; budgets a=100, b=100, c=200
    val docs = (
      (1 to 10).map(i => (s"a$i", "a", 10L)) ++
      (1 to 100).map(i => (s"b$i", "b", 10L)) ++
      (1 to 100).map(i => (s"c$i", "c", 10L))).toDF("doc_id", "source", "n")
    val out = Importance.mixtureSample(docs, "doc_id", "source", col("n"),
      Seq(("a", 1L), ("b", 1L), ("c", 2L)))
    val kept = out.groupBy("source")
      .agg(sum("n_tokens").as("tok"), max("budget").as("budget"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(kept("a") === ((100L, 100L)))
    assert(kept("b") === ((100L, 100L)))
    assert(kept("c") === ((200L, 200L)))
    // non-divisible case: a totals 7 tokens, weights 2:1 -> q_a = 7*3/2 = 10
    // (floor) binds; the binding source is taken WHOLE (budget 7, not the
    // proportional floor 2*10/3 = 6)
    val docs2 = (Seq(("a1", "a", 3L), ("a2", "a", 4L)) ++
      (1 to 50).map(i => (s"b$i", "b", 1L))).toDF("doc_id", "source", "n")
    val out2 = Importance.mixtureSample(docs2, "doc_id", "source", col("n"),
      Seq(("a", 2L), ("b", 1L)))
      .groupBy("source").agg(sum("n_tokens").as("tok"), max("budget").as("budget"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out2("a") === ((7L, 7L)), s"binding source must be whole: $out2")
    assert(out2("b")._2 === 3L) // 1 * 10 div 3
  }

  test("kmvDistinct: small groups exact, large groups estimate within KMV error") {
    val rows = (1 to 5).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", i.toLong))
    val df = rows.toDF("g", "x")
    val out = Sketches.kmvDistinct(df, "g",
      graft.operators.Dedup.shingleHash(col("x").cast("string")), k = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("small") === ((5L, 5L)))
    val (exact, est) = out("big")
    assert(exact === 5000L)
    // KMV standard error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
    assert(math.abs(est - 5000L) < 2500, s"KMV estimate $est too far from 5000")
  }

  test("dsirWeights: target-like docs outscore off-target; token-less docs score 0") {
    val docs = Seq(
      (1L, "tok_en tok_en common", true),
      (2L, "tok_other common", false),
      (3L, "tok_en tok_en tok_en", true),
      (4L, "   ", false)
    ).toDF("doc_id", "text", "is_en")
    val out = Importance.dsirWeights(docs, "doc_id", "text", col("is_en"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(4L) === ((0L, 0L)))
    // doc 3 is pure target vocabulary; doc 2 carries the off-target token
    assert(out(3L)._2 > out(2L)._2)
    assert(out(1L)._2 > out(2L)._2)
  }

  test("kmvMergedDistinct: merged sketch equals the single-pass global estimate") {
    // two shards with a 1000-value overlap; global distinct = 5000
    val rows = (1 to 3000).map(i => ("day1", i.toLong)) ++
      (2001 to 5000).map(i => ("day2", i.toLong))
    val df = rows.toDF("g", "x")
    val h = graft.operators.Dedup.shingleHash(col("x").cast("string"))
    val out = Sketches.kmvMergedDistinct(df, "g", h, k = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("day1")._1 === 3000L)
    assert(out("day2")._1 === 3000L)
    val (gExact, gEst) = out("__all__")
    assert(gExact === 5000L)
    // mergeability: the union of per-shard k-minima CONTAINS the global
    // k-minima, so the merged estimate must equal the one-pass global
    // sketch over the same rows — not just be close to it
    val single = Sketches.kmvDistinct(df.select(lit("all").as("g"), col("x")),
      "g", h, k = 64).as[(String, Long, Long)].collect().head
    assert(gEst === single._3)
    assert(math.abs(gEst - 5000L) < 2500, s"merged KMV estimate $gEst")
  }

  test("kmvSetSimilarity: under-k pairs exact, large pairs within sketch error") {
    // small: A={1..4}, B={3..6} -> jaccard 2/6; union(8 hashes) < k so the
    // sketch estimate must EQUAL the exact value
    val small = ((1 to 4).map(i => ("a", i.toLong)) ++
      (3 to 6).map(i => ("b", i.toLong))).toDF("g", "x")
    val h = graft.operators.Dedup.shingleHash(col("x").cast("string"))
    val s1 = Sketches.kmvSetSimilarity(small, "g", h, k = 64)
      .as[(String, String, Long, Long)].collect().head
    assert(s1 === (("a", "b", 333333L, 333333L)))
    // large: 3000 each, 1000 shared -> jaccard 1000/5000 = 0.2; k=64 gives
    // std error ~ sqrt(j(1-j)/k) ~ 5pp; allow 4 sigma
    val large = ((1 to 3000).map(i => ("a", i.toLong)) ++
      (2001 to 5000).map(i => ("b", i.toLong))).toDF("g", "x")
    val s2 = Sketches.kmvSetSimilarity(large, "g", h, k = 64)
      .as[(String, String, Long, Long)].collect().head
    assert(s2._3 === 200000L)
    assert(math.abs(s2._4 - 200000L) < 200000L, s"kmv jaccard ${s2._4}")
  }

  test("kmvMergedDistinct: tiny groups stay exact through the merge") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L), ("b", 3L))
      .toDF("g", "x")
    val out = Sketches.kmvMergedDistinct(df, "g",
        graft.operators.Dedup.shingleHash(col("x").cast("string")), k = 16)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") === ((2L, 2L)))
    assert(out("b") === ((2L, 2L)))
    assert(out("__all__") === ((3L, 3L))) // value 2 shared across shards
  }
}
