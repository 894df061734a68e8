package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("band join: exact boundary inclusion, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(1000), 7L),
      (2L, ts(5000), 7L),
      (3L, ts(1000), 8L) // other key: must not see key-7 rights
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(1060), 7L), // 60s after l1 → in 60s band (boundary, inclusive)
      (101L, ts(1061), 7L), // 61s after l1 → out
      (102L, ts(940), 7L),  // 60s before l1 → in
      (103L, ts(1000), 8L)  // key 8 exact match
    ).toDF("event_id", "ts", "user_id")
    val got = RangeJoin.timeBand(left, right, Seq("user_id"), "ts",
        bandMicros = 60000000L, rightPayload = Seq("event_id"))
      .select("event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (1L, 102L), (3L, 103L)))
  }

  test("band join equals naive nested-loop join on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, ts(rnd.nextInt(5000)), (i % 5).toLong)).toDF("event_id", "ts", "user_id")
    val right = (1 to 300).map(i =>
      (1000L + i, ts(rnd.nextInt(5000)), (i % 5).toLong)).toDF("event_id", "ts", "user_id")
    val band = 120000000L // 2 min
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = pairs(RangeJoin.timeBand(left, right, Seq("user_id"), "ts",
      band, Seq("event_id")))
    val naive = pairs(RangeJoin.timeBandNaive(left, right, Seq("user_id"), "ts",
      band, Seq("event_id")))
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("band join emits each qualifying pair exactly once (no bucket dups)") {
    import spark.implicits._
    // right sits in the bucket BELOW left's but within band — reachable
    // only via left's exploded b−1 candidate; and both in same bucket too
    val left = Seq((1L, ts(100), 1L)).toDF("event_id", "ts", "user_id")
    val right = Seq((2L, ts(95), 1L), (3L, ts(101), 1L)).toDF("event_id", "ts", "user_id")
    val rows = RangeJoin.timeBand(left, right, Seq("user_id"), "ts",
        bandMicros = 10000000L, rightPayload = Seq("event_id"))
      .select("event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size)
    assert(rows.toSet == Set((1L, 2L), (1L, 3L)))
  }
}
