package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 operator edge cases: FIFO allocation boundaries, hash-walk
  * overflow safety, modularity's empty-edge guard, and the grouped
  * value-rank scan device behind the robust-stats rewrites.
  */
class Round10OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def fifo(demand: Seq[(String, Long, Long)],
      supply: Seq[(String, Long, Long)]) = {
    // id order IS the fifo order (ord cols = the id itself)
    val d = demand.toDF("key", "did", "qty").withColumn("o", col("did"))
    val s = supply.toDF("key", "lot", "qty").withColumn("o", col("lot"))
    graft.operators.Allocate.fifo(d, "key", "did", "qty", Seq("o"),
        s, "key", "lot", "qty", Seq("o"))
      .orderBy("key", "did", "lot")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
  }

  test("fifo: demand splits across lots; a lot splits across demands") {
    val got = fifo(
      demand = Seq(("k", 1L, 5L), ("k", 2L, 7L)),
      supply = Seq(("k", 10L, 4L), ("k", 11L, 8L)))
    assert(got === Seq(("k", 1L, 10L, 4L), ("k", 1L, 11L, 1L),
      ("k", 2L, 11L, 7L)))
  }

  test("fifo: zero-quantity demands and lots emit NO rows") {
    // the zero-width interval [4,4) sits strictly inside lot 10's [0,9)
    // — the spurious qty=0 shape the overlap test alone would emit
    val got = fifo(
      demand = Seq(("k", 1L, 4L), ("k", 2L, 0L), ("k", 3L, 5L)),
      supply = Seq(("k", 10L, 9L), ("k", 11L, 0L)))
    assert(got === Seq(("k", 1L, 10L, 4L), ("k", 3L, 10L, 5L)))
    assert(!got.exists(_._4 == 0L), "zero-qty allocation row leaked")
  }

  test("fifo: over-demand beyond total supply gets no rows; under-demand leaves lots idle") {
    val over = fifo(demand = Seq(("k", 1L, 3L), ("k", 2L, 10L)),
      supply = Seq(("k", 10L, 5L)))
    assert(over === Seq(("k", 1L, 10L, 3L), ("k", 2L, 10L, 2L)),
      "demand 2 must drain only the remaining 2 units")
    val under = fifo(demand = Seq(("k", 1L, 2L)),
      supply = Seq(("k", 10L, 5L), ("k", 11L, 5L)))
    assert(under === Seq(("k", 1L, 10L, 2L)), "lot 11 must stay untouched")
  }

  test("fifo hot key: 10^4 x 10^4 one-key intervals match on (key, bin), never all pairs") {
    // One hot SKU with n demands and n lots: the retired bare key-join
    // streamed n^2 = 10^8 pairs through one task's overlap filter; the
    // binned join must carry `bin` in its equi-key so per-bin occupancy
    // (unit widths -> W = 1 -> one interval per side per bin) bounds the
    // pairs actually enumerated.
    val n = 10000L
    val d = spark.range(1, n + 1).select(lit("hot").as("key"),
      col("id").as("did"), lit(1L).as("qty"), col("id").as("o"))
    val s = spark.range(1, n + 1).select(lit("hot").as("key"),
      col("id").as("lot"), lit(1L).as("qty"), col("id").as("o"))
    val out = graft.operators.Allocate.fifo(d, "key", "did", "qty", Seq("o"),
      s, "key", "lot", "qty", Seq("o"))
    out.collect() // finalize the adaptive plan before reading it
    val p = out.queryExecution.executedPlan.toString
    // the literal test key constant-folds out of the equi-keys, so the
    // bin key is what distinguishes the binned join from all-pairs
    val joinKeyLines = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("HashJoin")).toSeq
    assert(joinKeyLines.exists(_.contains("bin#")),
      "fifo match join lost its bin equi-key (all-pairs shape is back):\n" +
        joinKeyLines.mkString("\n"))
    val rows = out.collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(rows.length === n,
      s"unit FIFO must pair demand i with lot i: got ${rows.length} rows")
    assert(rows.forall { case (did, lot, qty) => did == lot && qty == 1L },
      rows.filterNot { case (did, lot, qty) => did == lot && qty == 1L }
        .take(5).mkString(", "))
  }

  test("hashWalks: walk ids beyond 2^33 don't overflow — hop equals the mod-reduced replay") {
    val big = 1L << 40 // would overflow the unreduced walk*1103515245L mix
    val edges = Seq((big, big + 1), (big, big + 2), (big + 1, big))
      .toDF("src", "dst")
    val seeds = Seq(big).toDF("id")
    val got = graft.operators.Graph.hashWalks(edges, "src", "dst",
        seeds, "id", steps = 1)
      .where(col("step") === 1).collect()
    assert(got.length === 1)
    // sorted adjacency of `big` is [big+1, big+2]; replay the reduced LCG
    val idx = (((big % 2147483647L) * 1103515245L + 12345L) % 2147483647L % 2L).toInt
    assert(got.head.getLong(2) === big + 1 + idx)
  }

  test("hashWalks: walks ending at a sink stop, earlier steps survive") {
    val edges = Seq((1L, 2L)).toDF("src", "dst") // 2 is a sink
    val out = graft.operators.Graph.hashWalks(edges, "src", "dst",
        Seq(1L).toDF("id"), "id", steps = 3)
      .orderBy("step").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 1L), (1L, 2L)))
  }

  test("modularity: empty edge set yields q_term 0.0, never NaN") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "c")
    val edges = spark.emptyDataset[(Long, Long)].toDF("s", "d")
    val got = graft.operators.Graph.modularity(labels, "id", "c",
      edges, "s", "d").orderBy("community").collect()
    assert(got.length === 2)
    got.foreach { r =>
      val q = r.getDouble(r.fieldIndex("q_term"))
      assert(!q.isNaN && q === 0.0, s"q_term must be 0.0, got $q")
    }
  }

  test("groupedValueRanks: cum_grp ranks match a per-group sort; n_grp is the group total") {
    val vc = Seq((0L, 10L, 2L), (0L, 30L, 1L), (0L, 20L, 3L),
        (7L, 5L, 4L)).toDF("g", "v", "cnt")
    val got = graft.operators.Scan.groupedValueRanks(vc, "g", "v", "cnt")
      .orderBy("g", "v")
      .select("g", "v", "cum_grp", "n_grp").as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((0L, 10L, 2L, 6L), (0L, 20L, 5L, 6L),
      (0L, 30L, 6L, 6L), (7L, 5L, 4L, 4L)))
  }

  test("sampledShapley: dummy + efficiency axioms exact; agrees with exact Shapley at n=3") {
    // users: 1{a,buy} 2{a,b,buy} 3{b} 4{buy} 5{a,b} 6{b,buy}
    val ev = Seq((1L, "a"), (1L, "buy"), (2L, "a"), (2L, "b"), (2L, "buy"),
      (3L, "b"), (4L, "buy"), (5L, "a"), (5L, "b"), (6L, "b"), (6L, "buy"))
      .toDF("u", "ch")
    val chans = Seq("a", "b", "zzz") // zzz: touched by nobody — the dummy
    val m = 60
    val exact = graft.operators.Marketing
      .shapleyAttribution(ev, "u", "ch", chans, "buy")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = graft.operators.Marketing
      .sampledShapley(ev, "u", "ch", chans, "buy", perms = m).collect()
    val e9s = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    // dummy axiom: in the cumulative-exposure game an untouched channel's
    // marginal is zero in EVERY permutation — exactly zero, not near
    assert(e9s("zzz") === 0L && exact("zzz") === 0.0)
    // efficiency axiom: per permutation the marginals telescope to
    // v(N) − v(∅); here v(N) = 4/6 (round-half-up e9 666666667) and
    // v(∅) = 1/1 (user 4 converts untouched), so the e9 sum is EXACTLY
    // m · (666666667 − 1000000000)
    assert(e9s.values.sum === m * (666666667L - 1000000000L))
    // agreement: the m-permutation average sits near the exact value
    chans.foreach { c =>
      assert(math.abs(est(c) - exact(c)) < 0.15,
        s"$c: sampled ${est(c)} vs exact ${exact(c)}")
    }
  }

  test("rfmHistogramSegments: metric-tied customers share a cell; cells partition the customers") {
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (2L, "2024-01-10", 100.0), // identical r/f/m
      (3L, "2024-02-01", 50.0), (3L, "2024-02-20", 75.0),
      (4L, "2024-03-05", 500.0), (5L, "2023-11-11", 20.0),
      (6L, "2024-03-30", 300.0), (6L, "2024-01-02", 10.0))
      .toDF("cust", "d", "amt").withColumn("d", col("d").cast("date"))
    val cells = graft.operators.Marketing
      .rfmHistogramSegments(orders, "cust", "d", "amt").collect()
    assert(cells.map(_.getLong(3)).sum === 6L, "cells must partition customers")
    cells.foreach { r =>
      Seq(0, 1, 2).foreach(i => assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L))
    }
    // customers 1 and 2 tie on all three metrics → one cell holds both
    assert(cells.exists(r => r.getLong(3) >= 2L &&
      math.abs(r.getDouble(4) - 100.0) < 1e-9),
      "value-tied customers must share a histogram cell")
  }

  test("groupedValueRanks: out-of-range keys raise, not silently collide") {
    val vc = Seq((0L, 1L << 50, 1L)).toDF("g", "v", "cnt")
    val e = intercept[Exception] {
      graft.operators.Scan.groupedValueRanks(vc, "g", "v", "cnt").collect()
    }
    assert(e.getMessage != null)
  }
}
