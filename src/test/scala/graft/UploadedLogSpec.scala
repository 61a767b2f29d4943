package graft

import graft.io.UploadedLog
import graft.model.TransactionalType
import graft.transform.Transforms
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Transactional writeback loop: read-missing-as-empty, append, 15-day
  * retention, and the writeback∘read fixpoint (second run uploads nothing) —
  * reference `file_data_source.py:71-154`.
  */
class UploadedLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("uploaded_log").toString + "/log.parquet"

  test("missing log reads as empty with the right schema") {
    val log = UploadedLog(spark, tmpDir(), TransactionalType.GclidTime)
    val df = log.read()
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("timestamp", "gclid", "time"))
  }

  test("append then read round-trips keys") {
    val log = UploadedLog(spark, tmpDir(), TransactionalType.Uuid)
    log.append(Seq("u1", "u2").toDF("uuid"))
    assert(log.read().select("uuid").as[String].collect().toSet == Set("u1", "u2"))
  }

  test("writeback fixpoint: second run has nothing to upload") {
    val path = tmpDir()
    val log = UploadedLog(spark, path, TransactionalType.GclidTime)
    val source = Seq(("g1", "t1", 10.0), ("g2", "t2", 20.0), ("g3", "t3", 30.0))
      .toDF("gclid", "time", "amount")
    val run1 = Transforms.antiJoinUploaded(source, log.read(), TransactionalType.GclidTime)
    assert(run1.count() == 3)
    log.append(run1) // all succeeded
    val run2 = Transforms.antiJoinUploaded(source, log.read(), TransactionalType.GclidTime)
    assert(run2.count() == 0)
  }

  test("partial success: only succeeded keys are excluded next run") {
    val path = tmpDir()
    val log = UploadedLog(spark, path, TransactionalType.OrderIdTime)
    val source = Seq(("o1", "t1"), ("o2", "t2")).toDF("order_id", "time")
    log.append(source.filter($"order_id" === "o1"))
    val run2 = Transforms.antiJoinUploaded(source, log.read(), TransactionalType.OrderIdTime)
    assert(run2.select("order_id").as[String].collect().toSeq == Seq("o2"))
    // ORDER_ID_TIME log keeps ALL key columns (reference bug not reproduced)
    assert(log.read().columns.toSeq == Seq("timestamp", "order_id", "time"))
  }

  test("15-day retention drops old rows at read") {
    val path = tmpDir()
    // hand-write a log with one fresh and one 20-day-old entry
    Seq(("u_fresh", 0L), ("u_old", 20L * 86400))
      .toDF("uuid", "age_s")
      .select(
        expr("timestampadd(SECOND, -age_s, current_timestamp())").as("timestamp"),
        col("uuid"))
      .write.parquet(path)
    val log = UploadedLog(spark, path, TransactionalType.Uuid)
    assert(log.read().select("uuid").as[String].collect().toSeq == Seq("u_fresh"))
  }
}
