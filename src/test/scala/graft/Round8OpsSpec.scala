package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Round-8 additions: HLL cardinality sketch, PMI collocations, PSI drift,
  * and the TPC-H Q7/Q10 shapes. The oracle gate pins cross-engine hash
  * parity; these tests pin the ESTIMATOR contracts (branch behavior,
  * mergeability, accuracy bounds) and the query invariants.
  */
class Round8OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("hllDistinct: linear-counting branch is near-exact at low load") {
    val rows = (1 to 5).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", i.toLong))
    val out = Sketches.hllDistinct(rows.toDF("g", "x"), "g",
        graft.operators.Dedup.shingleHash(col("x").cast("string")))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val (se, sest) = out("small")
    assert(se === 5L)
    assert(math.abs(sest - 5.0) < 0.5, s"LC estimate $sest for 5 distinct")
    // n/m ~ 1.2: still the LC branch (E <= 2.5m, V > 0), tight regime
    val (be, best) = out("big")
    assert(be === 5000L)
    assert(math.abs(best - 5000.0) / 5000.0 < 0.05, s"LC estimate $best for 5000")
  }

  test("hllDistinct: raw harmonic branch within 4-sigma at p=7") {
    // m=128: 5000 distinct >> 2.5m=320 forces the raw estimator;
    // std err 1.04/sqrt(128) ~ 9.2%, assert inside ~4 sigma
    val out = Sketches.hllDistinct(
        (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "x"), "g",
        graft.operators.Dedup.shingleHash(col("x").cast("string")), p = 7)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(out("g") - 5000.0) / 5000.0 < 0.4,
      s"raw HLL estimate ${out("g")} too far from 5000")
  }

  test("hllDistinct: '__all__' merge equals the single-pass global sketch") {
    // two shards with a 1000-value overlap, global distinct 5000; the
    // register-wise max over shards must reproduce the one-pass global
    // registers EXACTLY (max is associative), so the estimates are equal
    val rows = (1 to 3000).map(i => ("day1", i.toLong)) ++
      (2001 to 5000).map(i => ("day2", i.toLong))
    val h = graft.operators.Dedup.shingleHash(col("x").cast("string"))
    val out = Sketches.hllDistinct(rows.toDF("g", "x"), "g", h)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("day1")._1 === 3000L && out("day2")._1 === 3000L)
    assert(out("__all__")._1 === 5000L)
    val single = Sketches.hllDistinct(
        rows.toDF("g", "x").select(lit("all").as("g"), col("x")), "g", h)
      .as[(String, Long, Double)].collect()
      .find(_._1 == "all").get
    assert(out("__all__")._2 === single._3,
      s"merged ${out("__all__")._2} != single-pass ${single._3}")
  }

  test("hllDistinct rejects out-of-range p") {
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(Seq(("a", 1L)).toDF("g", "x"), "g", col("x"), p = 5)
    }
  }

  test("amsF2: unbiased self-join-size estimate on a skewed key set") {
    // one hot key x1000 + 1000 singletons: F2 ~ 1.001e6; std err ~ F2*sqrt(2/32)
    val rows = Seq.fill(1000)("hot") ++ (1 to 1000).map(i => s"k$i")
    val df = rows.toDF("k")
      .select(graft.operators.Dedup.shingleHash(col("k")).as("h"))
    val est = Sketches.amsF2(df, col("h")).as[Long].head()
    val exact = df.groupBy(col("h")).count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    assert(est > exact / 3 && est < exact * 3,
      s"AMS estimate $est vs exact $exact")
  }

  test("s_hll_stream: windowed sketch estimates track per-window exact distincts") {
    val out = SparkEntry.queries("s_hll_stream")(spark, sf("sf0.001"))
      .as[(Long, Double)].collect().toMap
    assert(out.nonEmpty)
    val exact = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .transform(graft.io.EventTs.toNsLong)
      .select((col("ts") / 1000L / 21600000000L).cast("long").as("win_id"),
        col("user_id"))
      .distinct().groupBy("win_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == exact.keySet, s"${out.keySet} vs ${exact.keySet}")
    // <=150 users vs 512 registers: deep linear-counting regime, tight
    exact.foreach { case (w, n) =>
      assert(math.abs(out(w) - n) / n.toDouble < 0.1,
        s"window $w: est ${out(w)} vs exact $n")
    }
  }

  test("e_hard_negatives: below the ceiling, densest-first, never the query itself") {
    val out = SparkEntry.queries("e_hard_negatives")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._4 < 0.98), "a candidate at/above the ceiling survived")
    assert(out.forall(r => r._1 != r._3), "query returned as its own negative")
    out.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to rs.length), s"query $q ranks not contiguous: $ranks")
      // densest-first: cosine non-increasing in rank
      val byRank = rs.sortBy(_._2).map(_._4).toSeq
      assert(byRank == byRank.sorted.reverse, s"query $q: $byRank")
    }
  }

  test("t_pmi_phrases: thresholded, finite, and count-consistent") {
    val out = SparkEntry.queries("t_pmi_phrases")(spark, sf("sf0.001"))
      .as[(String, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_._2 >= 5), "bigrams below the min-count survived")
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
    // descending-PMI order with the ngram tiebreak
    val ps = out.map(_._3).toSeq
    assert(ps == ps.sorted.reverse, ps)
  }

  test("q_psi_drift: non-negative terms, total equals the term sum") {
    val rows = SparkEntry.queries("q_psi_drift")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // (pa-pb)*ln(pa/pb) >= 0 always — same-sign factors
    assert(rows.forall(_._4 >= 0), rows.toSeq)
    val total = rows.map(_._4).sum
    assert(rows.forall(_._5 == total), s"window total mismatch: $total")
  }

  test("groupedHistogramQuantiles: per-group rank math exact, error <= binWidth") {
    // group a: 1..100 uniform; group b: 1..10 — p50/p99 land in known bins
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i.toDouble))
    val out = Sketches.groupedHistogramQuantiles(rows.toDF("g", "v"), "g", "v",
        binWidth = 5.0, quantilesPerMille = Seq(500, 990))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // group a rank 50 -> value 50 -> bin floor(50/5)*5 = 50
    assert(out(("a", 500L)) === 50.0, out)
    assert(out(("a", 990L)) === 95.0, out) // rank 99 -> value 99 -> bin 95
    assert(out(("b", 500L)) === 5.0, out)  // rank 5 -> value 5 -> bin 5
    assert(out(("b", 990L)) === 10.0, out) // rank 10 -> value 10 -> bin 10
  }

  test("t_llr_phrases: counts consistent, finite, ordered") {
    val out = SparkEntry.queries("t_llr_phrases")(spark, sf("sf0.001"))
      .as[(String, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_._2 >= 5))
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
    val ls = out.map(_._3).toSeq
    assert(ls == ls.sorted.reverse, ls)
  }

  test("s_f2_stream: windowed AMS counters match the batch sketch per window") {
    val out = SparkEntry.queries("s_f2_stream")(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    assert(out.nonEmpty)
    // batch dual: same signs, same windows, same finish
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .transform(graft.io.EventTs.toNsLong)
      .select((col("ts") / 1000L / 21600000000L).cast("long").as("win_id"),
        graft.operators.Dedup.shingleHash(col("user_id").cast("string")).as("h"))
    val signs = Sketches.amsSigns(col("h"), 32)
    val batch = ev.groupBy(col("win_id"))
      .agg(sum(signs.head).as("z0"),
        signs.tail.zipWithIndex.map { case (sg, i) => sum(sg).as(s"z${i + 1}") }: _*)
      .select(col("win_id"), Sketches.amsF2FromZ(32).as("est"))
      .as[(Long, Long)].collect().toMap
    assert(out == batch, s"stream $out vs batch $batch")
  }

  test("markovRemovalAttribution: hand-computed chain, exact integer outputs") {
    // u1: view -> purchase; u2: view -> click -> purchase; u3: click (no conv)
    // chain: START->{view 2/3, click 1/3}; view->{CONV .5, click .5};
    // click->{CONV .5, DROP .5}; aBase=666666, remove(view)->166666,
    // remove(click)->333333 => re 750000/500000, shares 600000/400000
    val ev = Seq(
      (1L, 10L, 100L, "view"), (1L, 20L, 101L, "purchase"),
      (2L, 10L, 200L, "view"), (2L, 20L, 201L, "click"), (2L, 30L, 202L, "purchase"),
      (3L, 10L, 300L, "click"))
      .toDF("user_id", "us", "event_id", "event_type")
    val out = graft.operators.Marketing.markovRemovalAttribution(
        ev, "user_id", "us", "event_id", "event_type", "purchase")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("view") === ((750000L, 600000L)), out)
    assert(out("click") === ((500000L, 400000L)), out)
  }

  test("q_markov_attribution: effects in [0,1e6], shares sum to ~1e6") {
    val rows = SparkEntry.queries("q_markov_attribution")(spark, sf("sf0.001"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 1000000L), rows.toSeq)
    val shareSum = rows.map(_._3).sum
    // integer floors: total within #channels of exactly 1e6
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length - 1,
      s"share sum $shareSum")
  }

  test("textRankKeywords: the co-occurrence hub outranks peripheral terms") {
    val docs = Seq("hub alpha", "hub beta", "hub gamma", "hub delta",
      "alpha beta").toDF("text")
    val out = graft.operators.Retrieval.textRankKeywords(docs, "text", k = 5)
      .as[(Long, String, Long)].collect()
    assert(out.head._2 == "hub", out.toSeq)
    assert(out.map(_._1).toSeq == (1L to out.length), out.toSeq)
    assert(out.forall(_._3 > 0), out.toSeq)
    // ordered by score desc
    val ss = out.map(_._3).toSeq
    assert(ss == ss.sorted.reverse, ss)
  }

  test("textRankKeywords: empty co-occurrence graph returns empty, not a crash") {
    // empty corpus AND single-token docs (no bigram anywhere) both yield
    // a keyword-less result with the query's (rank, term, score_e9) schema
    for (docs <- Seq(Seq.empty[String].toDF("text"),
        Seq("one", "two", "").toDF("text"))) {
      val out = graft.operators.Retrieval.textRankKeywords(docs, "text", k = 5)
      assert(out.columns.toSeq === Seq("rank", "term", "score_e9"))
      assert(out.count() === 0)
    }
  }

  test("q_cohort_ltv: cumulative column is the running sum per cohort") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf("sf0.001"))
      .as[(java.sql.Date, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cd, rs) =>
      val sorted = rs.sortBy(_._2)
      val running = sorted.map(_._3).scanLeft(0L)(_ + _).tail
      assert(sorted.map(_._4).toSeq == running.toSeq, s"cohort $cd")
    }
  }

  test("q_incrementality: two segments, DiD consistent with the lifts") {
    val rows = SparkEntry.queries("q_incrementality")(spark, sf("sf0.001"))
      .collect().map(r => (r.getBoolean(0), r.getLong(7), r.getLong(8)))
    assert(rows.length == 2)
    val lift = rows.map(r => r._1 -> r._2).toMap
    val did = lift(true) - lift(false)
    assert(rows.forall(_._3 == did), s"$rows")
  }

  test("m_scene_cuts: still segments suppress cuts; counts bounded by groups") {
    val rows = SparkEntry.queries("m_scene_cuts")(spark, sf("sf0.001"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, nc) =>
      // a cut can only sit at a 3-frame group boundary
      val boundaries = (nf - 1) / 3
      assert(nc >= 0 && nc <= boundaries, s"doc $id: $nc cuts for $nf frames")
    }
    // the planted payloads are text-random across groups: some doc cuts
    assert(rows.map(_._3).sum > 0, "no cuts detected anywhere")
  }

  test("t_lr_calibration: bins partition the corpus; rates are probabilities") {
    val rows = SparkEntry.queries("t_lr_calibration")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 1000000L))
    val total = rows.map(_._2).sum
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(total == docs, s"calibration covered $total of $docs docs")
  }

  test("s_psi_stream: per-window PSI non-negative, windows cover the stream") {
    val rows = SparkEntry.queries("s_psi_stream")(spark, sf("sf0.001"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // (pa-pb)*ln(pa/pb) >= 0 per term, so the integer sum is >= -n_types
    // (each term's rounding can only lose half a unit)
    assert(rows.forall(r => r._3 >= -r._2), rows.toSeq)
  }

  test("q7/q10: shapes and deterministic cuts") {
    // sf0.001 has ~10 suppliers over 25 nations — the two-nation slice can
    // be legitimately empty there; the correctness scale is sf0.01
    val q7 = SparkEntry.queries("q7_volume_shipping")(spark, sf("sf0.01")).collect()
    assert(q7.nonEmpty)
    assert(q7.forall(r => r.getString(0) != r.getString(1)),
      "same-nation rows must be excluded")
    val q10 = SparkEntry.queries("q10_returned_items")(spark, sf("sf0.001"))
      .collect()
    assert(q10.length <= 20 && q10.nonEmpty)
  }

  test("bitmapDistinct: exact on boundary and NEGATIVE ids (sign-safe slots)") {
    // -1 and 31 collide under div/pmod bit math (both → word 0, bit 31);
    // shiftright/& must keep them distinct. 0, word-edge 31/32/63/64, and
    // duplicates round out the edges.
    val ids = Seq(-33L, -32L, -1L, 0L, 31L, 32L, 63L, 64L, -1L, 31L, 0L)
    val out = Sketches.bitmapDistinct(
        ids.map(("g", _)).toDF("g", "id"), Seq("g"), "id")
      .as[(String, Long)].collect().toMap
    assert(out("g") === ids.distinct.length.toLong, out)
    // cross-check against count(DISTINCT) on a dense spread incl. negatives
    val big = (-2500L to 2500L by 3L).toSeq
    val got = Sketches.bitmapDistinct(
        (big ++ big).map(("h", _)).toDF("g", "id"), Seq("g"), "id")
      .as[(String, Long)].collect().head._2
    assert(got === big.length.toLong)
  }

  test("soleLatestActor: tie between actors disqualifies, own ties don't") {
    val rows = Seq(
      // A: actor 2 alone at the max → qualifies
      ("A", 1L, 10L), ("A", 2L, 20L),
      // B: actors 1 and 2 tie at the max → no sole owner
      ("B", 1L, 30L), ("B", 2L, 30L),
      // C: single actor → excluded (needs >= 2 distinct actors)
      ("C", 7L, 40L), ("C", 7L, 50L),
      // D: actor 3's OWN two rows at the max — still sole vs actor 4
      ("D", 3L, 60L), ("D", 3L, 60L), ("D", 4L, 10L))
    val out = graft.operators.Temporal
      .soleLatestActor(rows.toDF("grp", "actor", "ts"), "grp", "actor", "ts")
      .as[(String, Long)].collect().toMap
    assert(out === Map("A" -> 2L, "D" -> 3L), out)
  }

  test("Scan.prefixSum: matches the sequential scan across many range partitions") {
    // Deterministic pseudo-random values over shuffled unique keys; 16
    // range partitions so partition offsets genuinely matter.
    val rows = (1 to 5000).map(i => ((i * 2654435761L) % 100000, (i % 97).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val out = graft.operators.Scan
      .prefixSum(rows.toDF("k", "v"), "k", "v", "cum", numPartitions = 16)
      .select("k", "v", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
    assert(out.length === rows.length)
    out.map(_._3).zip(expect).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"row $i: cum $got != $want")
    }
  }

  test("Scan.prefixSum: multi-column scan carries each value independently") {
    val rows = Seq((1L, 10L, 1L), (2L, 20L, 2L), (3L, 30L, 3L), (4L, 40L, 4L))
    val out = graft.operators.Scan
      .prefixSum(rows.toDF("k", "a", "b"), "k", "a", "cum_a0", Seq("b"),
        numPartitions = 3)
      .select("k", "cum_a0", "cum_b").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, 10L, 1L), (2L, 30L, 3L), (3L, 60L, 6L),
      (4L, 100L, 10L)))
  }

  test("slidingDistinct coverage: interval merge equals brute-force windowed distinct") {
    // Planted: user 1 active days 0 and 3 (one merged island 0..9),
    // user 2 active days 0 and 20 (two islands), user 3 day 5 only —
    // plus a duplicate activity row that must not double-count.
    val days = Seq((1L, 0L), (1L, 3L), (1L, 3L), (2L, 0L), (2L, 20L), (3L, 5L))
    val brute = (0L to 26L).map { d =>
      d -> days.collect { case (u, ad) if ad <= d && d <= ad + 6 => u }
        .distinct.size.toLong
    }.filter(_._2 > 0).toMap
    val got = graft.operators.Temporal
      .slidingDistinct(days.toDF("user_id", "day_id"), "user_id", "day_id", 7)
      .as[(Long, Long)].collect().toMap
    assert(got === brute, s"got $got\nwant $brute")
  }

  test("slidingDistinct window=1 degenerates to per-period distinct counts") {
    val days = Seq((1L, 0L), (1L, 0L), (2L, 0L), (1L, 2L))
    val got = graft.operators.Temporal
      .slidingDistinct(days.toDF("u", "p"), "u", "p", 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 2L -> 1L), got)
  }

  test("prefixJaccardPairs: lossless at the exact threshold boundary") {
    // Docs A/B share 9 of 10 3-shingles (J = 9/11 < 0.8... construct
    // instead around τ = 0.5): A vs B share exactly half their union.
    // 12 tokens → 10 shingles; B = A with the last 5 tokens replaced →
    // shared shingles = first 6, each side 10 → J = 6/14 ≈ 0.4286 < 0.5;
    // easier: plant EXACT duplicates and a disjoint doc, τ = 0.99 —
    // the boundary case J = 1.0 must survive the ceil/slack arithmetic.
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (20 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("id", "text")
    val out = graft.operators.Dedup
      .prefixJaccardPairs(docs, "id", "text", n = 3, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)), out.toSeq)
  }

  test("prefixJaccardPairs agrees with the brute-force exact pair set") {
    // 40 docs drawn from a tiny vocab — heavy overlap stresses the
    // filter's no-false-negative guarantee rather than its pruning.
    val docs = (1L to 40L).map { i =>
      val toks = (0 until 10).map(j => s"v${(i * 7 + j * j) % 13}")
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("id", "text")
    val got = graft.operators.Dedup
      .prefixJaccardPairs(df, "id", "text", n = 3, threshold = 0.6)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // brute force over the same kernel shingle sets
    val sh = df.select(col("id"), graft.functions.KernelExpressions
        .wordShingleHashes(col("text"), 3).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sa = sh(a).toSet; sb = sh(b).toSet
      if sa.nonEmpty || sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.6
    } yield (a, b)).toSet
    assert(got === want, s"missing ${want -- got}, extra ${got -- want}")
  }

  test("temporalEarliestArrival: time-respecting only, min arrival wins") {
    // 1→2 at t=5; 2→3 at t=3 (BEFORE arrival at 2 — unusable) and at
    // t=8 (usable); 1→3 direct at t=20 (usable but LATER than via 2);
    // 4 unreachable (its only in-edge departs from an unreached node).
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 8L), (1L, 3L, 20L),
      (5L, 4L, 9L))
    val seeds = Seq((1L, 0L)).toDF("id", "t0")
    val got = graft.operators.Graph.temporalEarliestArrival(
        edges.toDF("src", "dst", "ts"), "src", "dst", "ts",
        seeds, "id", "t0", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 5L, 3L -> 8L), got)
  }

  test("temporalEarliestArrival: rounds bound path length in hops") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L))
    val seeds = Seq((1L, 0L)).toDF("id", "t0")
    val oneHop = graft.operators.Graph.temporalEarliestArrival(
        chain.toDF("src", "dst", "ts"), "src", "dst", "ts",
        seeds, "id", "t0", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneHop === Map(1L -> 0L, 2L -> 1L), oneHop)
  }

  test("new operators tolerate empty and single-row inputs") {
    val emptyKV = Seq.empty[(Long, Long)].toDF("k", "v")
    // prefixSum: empty input -> empty output, no offset-collect crash
    assert(graft.operators.Scan.prefixSum(emptyKV, "k", "v", "cum")
      .count() === 0L)
    // prefixSum: one row -> its own value
    val one = graft.operators.Scan
      .prefixSum(Seq((5L, 7L)).toDF("k", "v"), "k", "v", "cum")
      .select("cum").as[Long].collect()
    assert(one.toSeq === Seq(7L))
    // slidingDistinct: empty input -> empty output
    assert(graft.operators.Temporal
      .slidingDistinct(emptyKV.toDF("u", "p"), "u", "p", 7).count() === 0L)
    // prefixJaccardPairs: corpus of empty/short texts -> no pairs, no crash
    val shorts = Seq((1L, ""), (2L, "a"), (3L, "a b")).toDF("id", "text")
    assert(graft.operators.Dedup
      .prefixJaccardPairs(shorts, "id", "text", n = 3, threshold = 0.9)
      .count() === 0L)
    // temporalEarliestArrival: zero rounds -> just the seeds
    val z = graft.operators.Graph.temporalEarliestArrival(
        Seq((1L, 2L, 1L)).toDF("src", "dst", "ts"), "src", "dst", "ts",
        Seq((9L, 4L)).toDF("id", "t0"), "id", "t0", rounds = 0)
      .as[(Long, Long)].collect().toMap
    assert(z === Map(9L -> 4L), z)
    // mondrianCells: fewer than k rows total -> one unsplit cell
    val tiny = graft.operators.Safety.mondrianCells(
        Seq((1.0, 1.0), (2.0, 2.0)).toDF("a", "b"), Seq("a", "b"),
        k = 50, rounds = 3)
      .select("n").as[Long].collect()
    assert(tiny.toSeq === Seq(2L), tiny.toSeq)
  }
}
