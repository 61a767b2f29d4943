package graft

import graft.operators.{Graph, Safety}
import org.apache.spark.sql.functions._

class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- pageRank / personalizedPageRank duplicated-loop invariant ------
  //
  // The two power-iteration loops are deliberate parallel copies
  // (Graph.scala documents why: pageRank's teleport is a plan-time scalar
  // whose exact double the oracle replays). This pin gives the
  // duplication test teeth: with seeds = ALL nodes the teleport vector is
  // uniform 1/N, so PPR must coincide with pageRank — a structural edit
  // to one loop that misses the other breaks the equality.
  test("personalizedPageRank(seeds = all nodes) equals pageRank") {
    val nodes = spark.range(0, 400).toDF("id")
    val edges = spark.range(0, 400).toDF("i").select(
        col("i").as("src"), ((col("i") * 13 + 5) % 400).as("dst"),
        (col("i") % 7 + 1).cast("double").as("w"))
      .union(spark.range(0, 200).toDF("i").select(
        ((col("i") * 3) % 400).as("src"), ((col("i") * 11 + 1) % 400).as("dst"),
        lit(2.0).as("w")))
    val pr = Graph.pageRank(nodes, "id", edges, "src", "dst", "w",
        iterations = 6, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ppr = Graph.personalizedPageRank(nodes, "id", edges, "src", "dst",
        "w", seeds = nodes, seedIdCol = "id",
        iterations = 6, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet === ppr.keySet)
    // The teleport terms differ only in float association:
    // (1-d)/N (scalar) vs (1-d)·(1/N) (column) — equality at the oracle
    // rounding (1e-12 is far below the 6-decimal oracle round).
    val worst = pr.keys.map(k => math.abs(pr(k) - ppr(k))).max
    assert(worst <= 1e-12, s"PPR(all seeds) diverged from pageRank by $worst")
    // and the ranks are non-trivial (guards against both loops degenerating)
    assert(pr.values.max > pr.values.min)
  }

  test("personalizedPageRank: empty/disjoint seed set returns empty, not a crash") {
    // an empty daily partition is normal at corpus scale — no restart
    // mass means no ranked nodes, with the query's (id, rank) schema
    val nodes = spark.range(0, 5).toDF("id")
    val edges = Seq((0L, 1L, 1.0)).toDF("src", "dst", "w")
    for (seeds <- Seq(spark.range(0, 0).toDF("id"),
        spark.range(100, 103).toDF("id"))) {
      val out = Graph.personalizedPageRank(nodes, "id", edges, "src", "dst",
        "w", seeds = seeds, seedIdCol = "id", iterations = 3)
      assert(out.columns.toSeq === Seq("id", "rank"))
      assert(out.count() === 0)
    }
  }

  // ---- seeded-pseudo-DP nonce contract --------------------------------
  test("dpNoisyCounts: empty nonce is replay-stable (bit-identical)") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("g", (col("id") % 5).cast("string"))
    def run() = Safety.dpNoisyCounts(df, Seq("g"), eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("dpNoisyCounts: distinct noise per nonce, stable within one") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("g", (col("id") % 5).cast("string"))
    def run(nonce: String) =
      Safety.dpNoisyCounts(df, Seq("g"), eps = 1.0, nonce = nonce)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    val a1 = run("roundA"); val a2 = run("roundA")
    val b = run("roundB"); val empty = run("")
    assert(a1 === a2, "same nonce must be deterministic")
    assert(a1 !== b, "different nonces must draw different noise")
    assert(a1 !== empty, "a non-empty nonce must differ from the replay form")
    // noise is actually applied and bounded-sane: at eps=1 a Laplace draw
    // beyond ±25 has probability < 2e-11 per row — a hit means the hash →
    // uniform → Laplace transform broke, not bad luck.
    val trueCounts = df.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- a1) assert(math.abs(n - trueCounts(g)) < 25.0,
      s"group $g noise |${n - trueCounts(g)}| implausibly large at eps=1")
  }

  // ---- prefixSum guards (ADVICE round 8) -------------------------------
  test("prefixSum rejects non-Long value columns with an actionable error") {
    val df = spark.range(0, 100).toDF("k")
      .withColumn("v", (col("k") * 1.5).cast("double"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Scan.prefixSum(df, "k", "v", "cum")
    }
    assert(e.getMessage.contains("LongType"))
    assert(e.getMessage.contains("v: double"))
  }

  test("prefixSum still exact on Long columns after the guard rewrite") {
    val df = spark.range(1, 2001).toDF("k").withColumn("v", col("k") % 97)
    val got = graft.operators.Scan.prefixSum(df, "k", "v", "cum",
        numPartitions = 7)
      .select("k", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    for ((k, cum) <- got) { acc += k % 97; assert(cum === acc, s"at k=$k") }
  }
}
