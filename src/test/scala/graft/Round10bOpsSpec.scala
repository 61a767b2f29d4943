package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end invariant tests for the round-10 session-2 entries, run on
  * FABRICATED parquet tables (not the driver corpus) so the expected
  * values are knowable in closed form: the exact-integer Holt-Winters /
  * backtest folds on a constant series, ABC classification with a
  * planted dominant part, and the mix bridge's telescoping identity.
  */
class Round10bOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Write a minimal orders/lineitem/part corpus to a temp dir and
    * return the dir path. Weekly revenue is CONSTANT (one $1000 order
    * per week for 30 weeks), which makes every Holt/HW fixed point
    * closed-form.
    */
  private lazy val constDir: String = {
    val dir = Files.createTempDirectory("graft_r10b").toFile.getAbsolutePath
    val orders = (0 until 30).map { w =>
      (w.toLong, 1L, "F", 1000.0,
        java.sql.Timestamp.valueOf(java.time.LocalDateTime
          .ofEpochSecond(w.toLong * 7 * 86400, 0, java.time.ZoneOffset.UTC)),
        "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    orders.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q_holt_winters: a constant weekly series is its own fixed point") {
    val r = SparkEntry.queries("q_holt_winters")(spark, constDir).collect().head
    assert(r.getAs[Long]("n_weeks") === 30L)
    assert(r.getAs[Long]("level_e2") === 100000L, "level = the constant, in cents")
    assert(r.getAs[Long]("trend_e2") === 0L)
    (1 to 4).foreach { h =>
      assert(r.getAs[Long](s"fc${h}_e2") === 100000L,
        s"h=$h forecast must equal the constant")
    }
  }

  test("q_holt_backtest: zero one-step error (and zero bias) on a constant series") {
    val r = SparkEntry.queries("q_holt_backtest")(spark, constDir).collect().head
    assert(r.getAs[Long]("n_weeks") === 30L)
    assert(r.getAs[Double]("mae") === 0.0)
    assert(r.getAs[Double]("bias") === 0.0)
  }

  test("q_acf: a constant daily series degrades to NULL acf, never a crash") {
    // var_pop = 0 ⇒ the nullif guard fires: ANSI-mode Spark 4 turns the
    // raw 0/0 into a runtime DIVIDE_BY_ZERO error (this test caught it)
    val rows = SparkEntry.queries("q_acf")(spark, constDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.isNullAt(r.fieldIndex("acf"))))
  }

  test("q_stl_anomalies: degenerate constant corpus yields no rows, no crash") {
    assert(SparkEntry.queries("q_stl_anomalies")(spark, constDir)
      .collect().isEmpty, "zero-sd remainder -> NULL z -> no anomaly rows")
  }

  private lazy val abcDir: String = {
    val dir = Files.createTempDirectory("graft_r10b_abc").toFile.getAbsolutePath
    // distinct per-part revenues summing to $1000: 800 | 150 | 30,10,6,3,1.
    // desc_excl at the 150-part is exactly 80% (boundary lands in B, the
    // strict < cut), at the 30-part exactly 95% (boundary lands in C)
    val revs = Seq(800.0, 150.0, 30.0, 10.0, 6.0, 3.0, 1.0)
    val li = revs.zipWithIndex.map { case (rev, i) =>
      (i.toLong + 1, i.toLong + 1, 1L, 1, 1.0, rev, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    li.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q_abc_classes: closed-form classes with exact 80/95 boundary parts") {
    val rows = SparkEntry.queries("q_abc_classes")(spark, abcDir).collect()
    val byClass = rows.map(r => r.getAs[String]("abc_class") ->
      (r.getAs[Long]("n_parts"), r.getAs[Double]("revenue"))).toMap
    assert(byClass("A") === (1L, 800.0), "the 80% head part alone is A")
    assert(byClass("B") === (1L, 150.0),
      "desc_excl exactly 80% -> NOT < -> the boundary part is B")
    assert(byClass("C") === (5L, 50.0),
      "desc_excl exactly 95% -> the boundary part falls to C with the tail")
  }

  private lazy val mixDir: String = {
    val dir = Files.createTempDirectory("graft_r10b_mix").toFile.getAbsolutePath
    // brand B1: 1996 = 10 units @ $100; 1997 = 20 units @ $150
    val li = Seq(
      (1L, 1L, 1L, 1, 10.0, 1000.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1996-03-01 00:00:00")),
      (2L, 1L, 1L, 1, 20.0, 3000.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1997-03-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    li.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "B1")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("q_mix_effect: volume and price effects telescope to the revenue delta") {
    val r = SparkEntry.queries("q_mix_effect")(spark, mixDir).collect().head
    assert(r.getAs[Double]("rev0") === 1000.0)
    assert(r.getAs[Double]("rev1") === 3000.0)
    // volume: (20-10)·$100 = $1000; price: ($150-$100)·20 = $1000... and
    // 1000 + 1000 = 2000 = Δrev exactly (the Laspeyres telescoping)
    assert(r.getAs[Double]("volume_effect") === 1000.0)
    assert(r.getAs[Double]("price_effect") === 1000.0)
    assert(r.getAs[Double]("volume_effect") + r.getAs[Double]("price_effect")
      === r.getAs[Double]("rev1") - r.getAs[Double]("rev0"))
  }
}
