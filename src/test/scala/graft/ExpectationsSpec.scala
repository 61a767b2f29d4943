package graft

import graft.operators.Expectations
import graft.operators.Expectations._

/** Data-quality audit against hand-built tables where every check's exact
  * ratio is known, including the empty-slice and all-null edge cases.
  */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    Expectations.audit(df, checks)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(4)))).toMap

  test("one aggregation answers completeness, uniqueness, bounds, in-set") {
    // 4 rows: one null key, one dup value, one out-of-bounds, one bad enum
    val df = Seq(
      (Some(1L), 10.0, "O"),
      (Some(2L), 10.0, "F"),
      (Some(2L), -5.0, "O"),
      (None, 20.0, "X"))
      .toDF("k", "v", "st")
    val out = report(df, Seq(
      Completeness("k"),                    // 3/4
      Uniqueness("k"),                      // 2 distinct / 3 non-null
      Bounds("v", 0.0, 15.0),               // 2/4 in bounds (-5 and 20 out)
      InSet("st", Seq("O", "F"))))          // 3/4
    assert(out(("completeness", "k")) === ((750000L, false)))
    assert(out(("uniqueness", "k")) === ((666666L, false)))
    assert(out(("bounds", "v")) === ((500000L, false)))
    assert(out(("in_set", "st")) === ((750000L, false)))
  }

  test("foreign key: orphans counted once each; nulls don't count as orphans") {
    val facts = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L).toDF("id")
    val out = report(facts, Seq(ForeignKey("fk", dim, "id")))
    // 3 non-null refs, 1 orphan (9) -> 2/3
    assert(out(("foreign_key", "fk")) === ((666666L, false)))
  }

  test("empty slices are vacuously true; perfect data passes at 1e6") {
    val empty = Seq.empty[(Option[Long], String)].toDF("k", "st")
    val outE = report(empty, Seq(Completeness("k"), InSet("st", Seq("O"))))
    assert(outE.values.toSet === Set((1000000L, true)))
    val good = Seq((1L, "O"), (2L, "F")).toDF("k", "st")
    val outG = report(good, Seq(Completeness("k"), Uniqueness("k"),
      InSet("st", Seq("O", "F"))))
    assert(outG.values.toSet === Set((1000000L, true)))
  }

  test("threshold semantics: a lowered bar turns the same ratio into a pass") {
    val df = Seq(Some(1L), None).toDF("k")
    val out = report(df, Seq(Completeness("k", minRatioE6 = 500000L)))
    assert(out(("completeness", "k")) === ((500000L, true)))
  }

  test("quarantine: first failing check wins, FK orphans routed, passes null") {
    val dim = Seq(1L, 2L).toDF("id")
    val df = Seq(
      (Some(1L), 10.0, "O"),   // clean
      (None, 10.0, "O"),       // completeness
      (Some(1L), -1.0, "X"),   // bounds fires BEFORE in_set
      (Some(1L), 10.0, "X"),   // in_set
      (Some(9L), 10.0, "O"))   // fk orphan
      .toDF("k", "v", "st")
    val out = Expectations.quarantine(df, Seq(
        Completeness("k"), Bounds("v", 0.0, 15.0),
        InSet("st", Seq("O", "F")), ForeignKey("k", dim, "id")))
      .select("v", "st", "quarantine_reason")
      .collect().map(r => (r.getDouble(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out((10.0, "O")) == null || out((10.0, "O")) == "foreign_key:k")
    val byRow = Expectations.quarantine(df, Seq(
        Completeness("k"), Bounds("v", 0.0, 15.0),
        InSet("st", Seq("O", "F")), ForeignKey("k", dim, "id")))
      .groupBy("quarantine_reason").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("pass") -> r.getLong(1)).toMap
    assert(byRow === Map("pass" -> 1L, "completeness:k" -> 1L,
      "bounds:v" -> 1L, "in_set:st" -> 1L, "foreign_key:k" -> 1L))
    // schema contract: original columns + the reason, nothing else
    val cols = Expectations.quarantine(df, Seq(Completeness("k"))).columns.toSeq
    assert(cols === Seq("k", "v", "st", "quarantine_reason"))
  }

  test("rejects an empty check list") {
    intercept[IllegalArgumentException] {
      Expectations.audit(Seq((1L, 2L)).toDF("a", "b"), Nil)
    }
  }
}
