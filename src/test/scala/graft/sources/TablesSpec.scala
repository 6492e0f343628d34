package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The fixture generator has shipped `events.ts` as TIMESTAMP(NANOS)
  * (read as long under nanosAsLong) and TIMESTAMP(MICROS, ntz) across
  * rounds — and date columns as both tz and ntz. These pins keep the
  * loader contract stable whichever vintage the next round writes:
  * every temporal operator downstream assumes epoch-nanos longs from
  * `Tables.events` and comparable TIMESTAMP columns everywhere else.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-tables-spec").toString

  test("events.ts: TIMESTAMP_NTZ micros normalize to epoch-nanos long") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "2024-03-01 12:00:00.123456"), (2L, "2024-03-02 00:30:00.000001"))
      .toDF("event_id", "s")
      .select(col("event_id"), to_timestamp_ntz(col("s")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == LongType)
    val byId = ev.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2024-03-01T12:00:00.123456 UTC in nanos
    assert(byId(1L) == 1709294400123456000L, s"got ${byId(1L)}")
    assert(byId(2L) % 1000L == 0L, "micros fixture carries nanos = micros*1000")
  }

  test("events.ts: a legacy epoch-nanos long column passes through") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1709294400123456789L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.head().getLong(1) == 1709294400123456789L)
  }

  test("NTZ date columns load as comparable session TIMESTAMP") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "1997-06-01 00:00:00"), (2L, "1999-01-01 00:00:00"))
      .toDF("o_orderkey", "s")
      .select(col("o_orderkey"), to_timestamp_ntz(col("s")).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ord = Tables.orders(spark, dir)
    assert(ord.schema("o_orderdate").dataType == TimestampType)
    // the exact comparison shape every TPC-H-ish query uses
    val n = ord.where(col("o_orderdate") <
      lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))).count()
    assert(n == 1L)
  }
}
