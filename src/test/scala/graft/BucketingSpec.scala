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

  test("z-order rewrite: per-file boxes tight on BOTH dims, box query skips files") {
    // a synthetic grid where the two dims are independent: lexicographic
    // (x, y) sort makes every file span the FULL y range, the z-curve
    // bounds both
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val numFiles = 16
    val zPath = java.nio.file.Files.createTempDirectory("graft_z").toString + "/z"
    val lexPath = java.nio.file.Files.createTempDirectory("graft_z").toString + "/lex"
    Bucketing.compactZOrder(grid, "x", "y", numFiles, zPath, bits = 6)
    Bucketing.compactSorted(grid, Seq("x", "y"), numFiles, lexPath)
    def fileBoxes(path: String): Array[(Long, Long, Long, Long)] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    // lossless
    assert(spark.read.parquet(zPath).count() === grid.count())
    // every z file's box is a quadrant-ish cell: both spans well under the
    // full 0..63 range; the lexicographic layout spans all of y per file
    val zBoxes = fileBoxes(zPath)
    val lexBoxes = fileBoxes(lexPath)
    assert(zBoxes.forall { case (x0, x1, y0, y1) => x1 - x0 <= 31 && y1 - y0 <= 31 },
      s"z boxes not tight: ${zBoxes.mkString(", ")}")
    assert(lexBoxes.forall { case (_, _, y0, y1) => y1 - y0 === 63 },
      "lexicographic baseline unexpectedly bounded y — grid assumption broken")
    // a 16x16 box predicate intersects a strict minority of z files (file
    // skipping), but EVERY lexicographic file whose x range matches
    val hit = zBoxes.count { case (x0, x1, y0, y1) =>
      x0 <= 15L && x1 >= 0L && y0 <= 15L && y1 >= 0L }
    assert(hit <= numFiles / 2, s"box query hits $hit of $numFiles z files")
  }

  test("versioned table: snapshot isolation, explicit time travel, latest wins") {
    import graft.io.Versioned
    val path = java.nio.file.Files.createTempDirectory("graft_ver").toString
    assert(Versioned.latestVersion(spark, path).isEmpty)
    assertThrows[IllegalStateException](Versioned.read(spark, path))
    assert(Versioned.write(Seq((1L, "a")).toDF("k", "v"), path) === 1)
    // a reader resolves v1, then v2 publishes: the held snapshot is intact
    val v1 = Versioned.read(spark, path)
    assert(Versioned.write(Seq((1L, "b"), (2L, "c")).toDF("k", "v"), path) === 2)
    assert(v1.count() === 1L && Versioned.read(spark, path, Some(1)).count() === 1L)
    assert(Versioned.read(spark, path).count() === 2L)
    assert(Versioned.latestVersion(spark, path) === Some(2))
  }

  test("versioned table: a lost manifest never restarts numbering over published snapshots") {
    import graft.io.Versioned
    val path = java.nio.file.Files.createTempDirectory("graft_ver_crash").toString
    assert(Versioned.write(Seq((1L, "a")).toDF("k", "v"), path) === 1)
    assert(Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path) === 2)
    // simulate a writer crash between manifest delete and rename
    new java.io.File(path, "_LATEST").delete()
    assert(Versioned.latestVersion(spark, path).isEmpty)
    // the next write must number from the v=N directories, not the manifest:
    // v=3, never an overwrite of the published (and possibly still-read) v=1
    assert(Versioned.write(Seq((3L, "c")).toDF("k", "v"), path) === 3)
    assert(Versioned.read(spark, path, Some(1)).count() === 1L)
    assert(Versioned.read(spark, path, Some(2)).count() === 2L)
    assert(Versioned.latestVersion(spark, path) === Some(3))
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

  test("versioned table: RACING writers land distinct versions, manifest at the head") {
    import graft.io.Versioned
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = java.nio.file.Files.createTempDirectory("graft_ver_race").toString
    // 6 writers race from a cold store: the exclusive claim markers must
    // hand out 6 DISTINCT version numbers (no lost update, no overwrite of
    // a published immutable snapshot)
    val versions = Await.result(
      Future.sequence((1 to 6).map(i => Future {
        Versioned.write(Seq((i.toLong, s"w$i")).toDF("k", "v"), path)
      })), 120.seconds)
    assert(versions.toSet.size === 6, s"duplicate versions: $versions")
    assert(versions.toSet === (1 to 6).toSet, versions)
    // every claimed version is readable and holds exactly its writer's row
    versions.zipWithIndex.foreach { case (v, i) =>
      val rows = Versioned.read(spark, path, Some(v))
        .as[(Long, String)].collect()
      assert(rows.toSeq === Seq(((i + 1).toLong, s"w${i + 1}")))
    }
    // publication is monotonic: the manifest points at the max version
    assert(Versioned.latestVersion(spark, path) === Some(6))
  }
}
