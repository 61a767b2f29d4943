package graft

import graft.io.Bucketing
import graft.transform.Transforms
import org.apache.spark.sql.functions._

/** Shuffle-topology utilities: bucketed tables joining with zero exchanges,
  * and salted joins spreading a degenerate key. These are plan-shape
  * assertions — the properties that decide whether a recurring 100 TB join
  * shuffles the fact table every day or never again.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed+sorted tables join with zero shuffle exchanges") {
    val dir = sf("sf0.001")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
    Bucketing.writeBucketed(li, "li_bucketed", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_bucketed", 4, Seq("o_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about EXCHANGES, not
      // a small-table broadcast hiding them
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed join still shuffles the fact side")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed join still shuffles the dim side")
      // correctness vs the plain (shuffling) join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("compaction yields N sorted files with disjoint clustering-key ranges") {
    import org.apache.spark.sql.functions.col
    val events = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select("event_id", "user_id", "value")
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/out"
    Bucketing.compactSorted(events, Seq("user_id", "event_id"), 4, path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, s"expected 4 data files, got ${files.length}")
    // per-file: internally sorted; across files: key ranges disjoint (the
    // precondition for parquet min/max footer pruning to hit ONE file)
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select(col("user_id"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(keys.sameElements(keys.sorted), s"${f.getName} not sorted")
      (keys.head, keys.last)
    }
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(implicitly[Ordering[(Long, Long)]].lteq(hiA, loB),
        s"file ranges overlap: $hiA vs $loB")
    }
    // nothing lost
    assert(spark.read.parquet(path).count() == events.count())
  }

  test("salted join equals the plain join on a corpus with one hot key") {
    val left = ((1 to 900).map(i => (42L, s"hot$i")) ++
      (101 to 200).map(i => (i.toLong, s"cold$i"))).toDF("k", "payload")
    val right = Seq((42L, "x"), (7L, "y"), (13L, "z")).toDF("k", "tag")
    val plain = left.join(right, "k")
      .select("k", "payload", "tag").as[(Long, String, String)].collect().toSet
    val salted = Transforms.saltedJoin(left, right, Seq("k"), factor = 8)
      .select("k", "payload", "tag").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 42L) == 900)
  }
}
