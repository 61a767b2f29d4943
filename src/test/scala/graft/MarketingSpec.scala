package graft

import graft.operators.Marketing
import org.apache.spark.sql.functions._

/** Attribution and RFM against hand-built timelines where every credit
  * and quintile assignment is known by construction.
  */
class MarketingSpec extends SparkTestBase {
  import spark.implicits._

  private def attrib(rows: Seq[(Long, Long, Long, String)]) =
    Marketing.attributeU(rows.toDF("u", "t", "eid", "ch"),
      "u", "t", "eid", "ch", Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("U-shape: 1, 2, and n-touch segments credit correctly") {
    // user 1: v(1) c(2) v(3) c(4) -> purchase(5): 4 touches, U = .4/.2·(1/2)/.4
    //   first v gets .4, last c gets .4, middle v and c get .1 each
    // user 2: v(1) -> purchase(2): single touch, full 1.0
    // user 3: v(1) c(2) -> purchase(3): two touches, .5 each
    val out = attrib(Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "view"),
      (1L, 4L, 4L, "click"), (1L, 5L, 5L, "purchase"),
      (2L, 1L, 6L, "view"), (2L, 2L, 7L, "purchase"),
      (3L, 1L, 8L, "view"), (3L, 2L, 9L, "click"), (3L, 3L, 10L, "purchase")))
    // view: .4 + .1 (u1) + 1.0 (u2) + .5 (u3) = 2.0 over 4 touches
    // click: .1 + .4 (u1) + .5 (u3) = 1.0 over 3 touches
    assert(out("view") == ((4L, 2.0)))
    assert(out("click") == ((3L, 1.0)))
  }

  test("touches after the last conversion earn nothing; same-ts conversion is strict") {
    val out = attrib(Seq(
      // view at t=5 has no later purchase -> unattributed
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"), (1L, 5L, 3L, "view"),
      // view at the SAME ts as the purchase: strict "before" excludes it,
      // so only the t=1 view of user 2 earns the credit
      (2L, 1L, 4L, "view"), (2L, 3L, 5L, "view"), (2L, 3L, 6L, "purchase")))
    assert(out("view") == ((2L, 2.0))) // u1 t=1 full, u2 t=1 full
  }

  test("multiple conversions segment the timeline without double counting") {
    val out = attrib(Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"),
      (1L, 3L, 3L, "click"), (1L, 4L, 4L, "purchase")))
    // each conversion owns exactly its preceding segment's touch
    assert(out("view") == ((1L, 1.0)))
    assert(out("click") == ((1L, 1.0)))
  }

  test("rfm quintiles: known 10-customer split, segment rollup sums") {
    // 10 customers, one order each: monetary descending 100..10 by custkey,
    // all same day -> r ties broken by custkey, freq all 1
    val orders = (1 to 10).map(i =>
      (i.toLong, "2024-01-01 00:00:00", (11 - i) * 10.0))
      .toDF("cust", "day", "amt")
      .select(col("cust"), col("day").cast("timestamp").as("day"), col("amt"))
    val out = Marketing.rfmSegments(orders, "cust", "day", "amt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    // m_score follows monetary desc = custkey asc; r/f follow custkey asc
    // so cells are (q,q,q) for q=1..5 with 2 customers each
    assert(out.keySet == (1 to 5).map(q => (q.toLong, q.toLong, q.toLong)).toSet)
    assert(out((1L, 1L, 1L)) == ((2L, 95.0))) // custs 1,2: 100+90 / 2
    assert(out((5L, 5L, 5L)) == ((2L, 15.0))) // custs 9,10: 20+10 / 2
  }
}
