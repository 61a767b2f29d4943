package graft

import graft.operators.Safety
import org.apache.spark.sql.functions._

/** PII scan, secret entropy, and DP release against inputs with known
  * answers (reference Luhn vectors, analytically-known entropies, and the
  * noise determinism/magnitude contract).
  */
class SafetySpec extends SparkTestBase {
  import spark.implicits._

  test("luhn validates reference vectors and rejects off-by-one") {
    val df = Seq(
      "4539578763621486", // valid (standard test number)
      "4539578763621487", // last digit off -> invalid
      "4111111111111111", // valid (classic Visa test number)
      "1234567812345678") // invalid
      .toDF("card")
      .select(col("card"), Safety.luhnValid16(col("card")).as("ok"))
    assert(df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap ==
      Map("4539578763621486" -> true, "4539578763621487" -> false,
        "4111111111111111" -> true, "1234567812345678" -> false))
  }

  test("piiScan counts typed matches and scores a Luhn-valid card higher") {
    val docs = Seq(
      (1L, "mail a@b.co and c@d.org from 10.0.0.1 card 4539578763621486"),
      (2L, "no identifiers here at all"),
      (3L, "just a shape 1234567812345678"))
      .toDF("doc_id", "text")
    val out = Safety.piiScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 1L, true, 6L)))  // 2 emails + 1 ip + 3 for luhn
    assert(out(2L) == ((0L, 0L, false, 0L)))
    assert(out(3L) == ((0L, 0L, false, 0L))) // shape-only card: luhn rejects
  }

  test("secretScan: zero entropy for repeats, ln(16) for 16 distinct chars, length gate") {
    val docs = Seq(
      (1L, "short words only here"),              // nothing >= 16 chars
      (2L, "aaaaaaaaaaaaaaaa 0123456789abcdef"))  // H=0 and H=ln 16
      .toDF("doc_id", "text")
    val out = Safety.secretScan(docs, "doc_id", "text", minLen = 16,
        minNats = 2.2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!out.keySet.exists(_._1 == 1L))
    assert(out((2L, 0)) == ((16L, 0.0, false)))
    val h16 = out((2L, 1))
    assert(h16._1 == 16L && h16._3)
    assert(math.abs(h16._2 - math.log(16.0)) < 1e-6)
  }

  test("dpNoisyCounts: deterministic across runs, bounded noise, keyed draws differ") {
    val ev = Seq.tabulate(100)(i => (s"t${i % 4}", i)).toDF("k", "v")
    def release() = Safety.dpNoisyCounts(ev, Seq("k"), 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = release()
    assert(a == release()) // seeded: identical release on re-run
    assert(a.size == 4)
    // true count is 25 per key; eps=1 noise is within ~ln(2e9) ~ 21.4
    assert(a.values.forall(v => math.abs(v - 25.0) < 22.0))
    // draws are per-key, not a shared constant
    assert(a.values.toSeq.distinct.size > 1)
  }

  test("mondrianCells: every published cell holds >= k rows; ranges cover the data") {
    val rows = (1 to 400).map(i => (i.toDouble, (i % 7).toDouble))
    val out = Safety.mondrianCells(rows.toDF("a", "b"), Seq("a", "b"),
        k = 50, rounds = 5)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(out.map(_._2).sum === 400L)
    assert(out.forall(_._2 >= 50L), out.toSeq)
    assert(out.length > 1, "no split happened at all")
    // cells partition: a-ranges of sibling splits cannot overlap-count rows
    assert(out.forall(c => c._3 <= c._4 && c._5 <= c._6))
  }

  test("mondrianCells: refuses a split that would starve a child below k") {
    // 60 rows, k=50: the first median split would give 30/30 — both < k,
    // so NO split may happen at any depth; one cell with all 60 rows.
    val rows = (1 to 60).map(i => (i.toDouble, 0.0))
    val out = Safety.mondrianCells(rows.toDF("a", "b"), Seq("a", "b"),
        k = 50, rounds = 4)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(out.length === 1 && out.head._2 === 60L, out.toSeq)
  }

  test("mondrianCells: deterministic — identical cells on re-run") {
    val rows = (1 to 300).map(i => ((i * 37 % 101).toDouble, (i % 11).toDouble))
    def run() = Safety.mondrianCells(rows.toDF("a", "b"), Seq("a", "b"),
        k = 30, rounds = 4)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSet
    assert(run() === run())
  }
}
