package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-9 break: the driver regenerated
  * `events.parquet` with native `timestamp[us]` and the reader still assumed
  * TIMESTAMP(NANOS)-as-long, failing 13 queries at analysis time. The events
  * loader must accept every encoding a parquet writer could plausibly emit
  * for `ts` — nanos-as-long, naive micros (TIMESTAMP_NTZ), and UTC-adjusted
  * micros (TimestampType) — and normalize all three to the same values. */
class EventsEncodingSpec extends AnyFunSuite with SparkTestBase {

  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00 UTC
    1704070800123456L, // +1h, sub-second µs
    1704153599999999L) // end of 2024-01-01 (wall)

  private def expected: Seq[java.sql.Timestamp] =
    micros.map { us =>
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/events.parquet"

  private def loadVia(path: String) = {
    val dir = path.stripSuffix("/events.parquet")
    SparkEntry.events(spark, dir)
  }

  private def assertNormalized(path: String): Unit = {
    val got = loadVia(path)
    assert(got.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${got.schema("ts").dataType}")
    val vals = got.select(col("ts")).collect().map(_.getTimestamp(0)).sortBy(_.getTime)
    assert(vals.toSeq == expected, s"values after normalize: ${vals.toSeq}")
  }

  test("events loader reads nanos-as-long encoding") {
    val s = spark; import s.implicits._
    // Spark cannot WRITE TIMESTAMP(NANOS) parquet; a LongType `ts` column is
    // exactly what the nanos-as-long flag decodes the old testdata into, so
    // the written file reproduces the post-decode shape of that encoding.
    val path = tmp("ev-nanos")
    micros.map(us => (us * 1000L, 1L, "view")).toDF("ts", "user_id", "event_type")
      .write.parquet(path)
    assertNormalized(path)
  }

  test("events loader reads naive timestamp[us] (TIMESTAMP_NTZ) encoding") {
    val s = spark; import s.implicits._
    val path = tmp("ev-ntz")
    micros.map(us => (us, 1L, "view")).toDF("us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .write.parquet(path)
    // verify the fixture really carries NTZ (isAdjustedToUTC=false micros)
    val raw = spark.read.parquet(path)
    assert(raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType,
      s"fixture must be NTZ, got ${raw.schema("ts").dataType}")
    assertNormalized(path)
  }

  test("events loader reads UTC-adjusted timestamp[us] (TimestampType) encoding") {
    val s = spark; import s.implicits._
    val path = tmp("ev-ltz")
    micros.map(us => (us, 1L, "view")).toDF("us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .write.parquet(path)
    assertNormalized(path)
  }

  test("NTZ encoding yields the same instants under a non-UTC session timezone") {
    val s = spark; import s.implicits._
    // Instants that both land on America/New_York wall-clock 01:30 on the
    // 2025 DST fall-back night (05:30Z = 01:30 EDT, 06:30Z = 01:30 EST):
    // any rebase through the LOCAL wall-clock must guess one offset for
    // the repeated hour and collapses the pair — only analysis-time-UTC
    // epoch arithmetic keeps them distinct.
    val ambiguous = Seq(1762061400000000L, 1762065000000000L)
    val all = micros ++ ambiguous
    // Fixture written under UTC (the generator's posture: NTZ wall-clock IS
    // the UTC instant) …
    val path = tmp("ev-ntz-tz")
    all.map(us => (us, 1L, "view")).toDF("us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .write.parquet(path)
    // … then loaded under the DST-shifting zone: the loader must recover
    // the exact epoch micros — including both sides of the repeated hour.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = loadVia(path)
      assert(got.schema("ts").dataType == TimestampType)
      val us = got.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
      assert(us.toSeq == all.sorted, s"epoch micros under NY session: ${us.toSeq}")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("all three encodings agree row-for-row") {
    val s = spark; import s.implicits._
    val pNanos = tmp("ev-eq-nanos")
    micros.map(us => (us * 1000L, 1L, "view")).toDF("ts", "user_id", "event_type")
      .write.parquet(pNanos)
    val pNtz = tmp("ev-eq-ntz")
    micros.map(us => (us, 1L, "view")).toDF("us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz")).drop("us")
      .write.parquet(pNtz)
    val a = loadVia(pNanos).select("ts").collect().map(_.getTimestamp(0).getTime).sorted
    val b = loadVia(pNtz).select("ts").collect().map(_.getTimestamp(0).getTime).sorted
    assert(a.sameElements(b))
  }
}
