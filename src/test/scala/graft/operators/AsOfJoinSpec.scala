package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("as-of join: latest right at-or-before left, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 7L), // after r@5 → matches 100
      (2L, ts(20), 7L), // equal ts to r@20 → matches 101 (at-or-before)
      (3L, ts(2), 7L),  // before any right → null
      (4L, ts(30), 8L)  // other key, no rights → null
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(5), 7L, 1.5),
      (101L, ts(20), 7L, 2.5)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("asof_event_id")))))
    assert(got.toSeq == Seq(
      (1L, Some(100L)), (2L, Some(101L)), (3L, None), (4L, None)))
  }

  test("as-of join equals brute force on seeded random data (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 200).map(i =>
      (i.toLong, ts(rnd.nextInt(500)), (i % 7).toLong)).toDF("event_id", "ts", "user_id")
    val right = (1 to 150).map(i =>
      (1000L + i, ts(rnd.nextInt(500)), (i % 7).toLong, rnd.nextInt(100).toDouble))
      .toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    // brute force: per left row, max (ts, event_id) among rights at-or-before
    val rights = right.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val expect = left.collect().map { l =>
      val (lid, lts, luser) = (l.getLong(0), l.getTimestamp(1).getTime, l.getLong(2))
      val best = rights.filter(r => r._3 == luser && r._2 <= lts)
        .sortBy(r => (r._2, r._1)).lastOption.map(_._1)
      lid -> best
    }.toMap
    assert(got == expect)
  }

  test("as-of join: equal-ts right rows break ties deterministically (max tie wins)") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(5), 7L, 1.0),
      (101L, ts(5), 7L, 2.0) // same ts: higher tie sorts later → carried
    ).toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "event_id",
        Seq("event_id"))
      .select("asof_event_id").collect()
    assert(got.head.getLong(0) == 101L)
  }
}
