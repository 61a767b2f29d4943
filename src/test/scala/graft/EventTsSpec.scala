package graft

import graft.io.EventTs
import org.apache.spark.sql.functions._

/** The adaptive events-ts normalizer must map BOTH physical encodings the
  * driver's testdata has shipped (ns-epoch long and µs TIMESTAMP) to the
  * same internal values.
  */
class EventTsSpec extends SparkTestBase {
  import spark.implicits._

  private val usEpoch = 1714557600123456L // 2024-05-01T10:00:00.123456Z

  test("toNsLong passes a long ts through and converts a timestamp ts") {
    val asLong = Seq((1L, usEpoch * 1000L)).toDF("event_id", "ts")
    assert(EventTs.toNsLong(asLong).head().getLong(1) == usEpoch * 1000L)

    val asTs = Seq((1L, usEpoch)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    assert(EventTs.toNsLong(asTs).head().getLong(1) == usEpoch * 1000L)

    // TIMESTAMP_NTZ (what µs parquet reads as) resolves through the UTC
    // session timezone to the same instant
    val asNtz = Seq((1L, usEpoch)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(EventTs.toNsLong(asNtz).head().getLong(1) == usEpoch * 1000L)
  }

  test("toTimestamp yields the same instant from either encoding") {
    val fromLong = EventTs.toTimestamp(
      Seq((1L, usEpoch * 1000L)).toDF("event_id", "ts"))
    val fromNtz = EventTs.toTimestamp(
      Seq((1L, usEpoch)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    assert(fromLong.schema("ts").dataType.typeName == "timestamp")
    assert(fromNtz.schema("ts").dataType.typeName == "timestamp")
    assert(fromLong.head().getTimestamp(1) == fromNtz.head().getTimestamp(1))
    assert(fromLong.head().getTimestamp(1).getTime == usEpoch / 1000L)
  }
}
