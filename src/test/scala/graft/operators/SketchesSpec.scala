package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("modp token hash: Horner fold, capped at 16 chars") {
    import graft.functions.HashFunctions.{modPTokenHash, P, Base}
    def ref(s: String): Long =
      s.take(16).foldLeft(0L)((h, c) => (h * Base + c) % P)
    assert(modPTokenHash("scan") == ref("scan"))
    assert(modPTokenHash("") == 0L)
    // cap: identical 16-char prefix → identical hash
    assert(modPTokenHash("a" * 16 + "xyz") == modPTokenHash("a" * 16 + "qqq"))
  }

  test("count-min estimates are never below exact counts (and tight here)") {
    val docs = spark.read.parquet(sf("documents"))
    val rows = Sketches.cmsTokenEstimates(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (tok, n, est) =>
      assert(est >= n, s"$tok: est $est < exact $n")
      // d=4 rows of w=1024 over a ~1k vocabulary: collisions inflate a
      // probe by at most a small multiple of the mean bucket load
      assert(est <= n + 2000, s"$tok: est $est wildly above $n")
    }
  }

  test("count-min sketch state collapses collisions additively") {
    import spark.implicits._
    // two distinct tokens, same text column: per-token estimate must count
    // BOTH when they collide in every row — here they don't collide, so
    // estimates equal exact counts exactly
    val df = Seq((1L, "alpha alpha beta")).toDF("id", "text")
    val got = Sketches.cmsTokenEstimates(df, "text", topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("alpha", 2L, 2L), ("beta", 1L, 1L)))
  }

  test("hll registers: sketch is tiny and estimate lands near exact") {
    val li = spark.read.parquet(sf("lineitem"))
    val regs = Sketches.hllRegisters(li, "l_returnflag", "l_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val groups = regs.groupBy(_._1)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groups.foreach { case (g, rs) =>
      assert(rs.length <= 64) // sketch never wider than m
      val est = Sketches.hllEstimate(rs.map(t => t._2 -> t._3).toMap)
      val ex = exact(g).toDouble
      assert(math.abs(est - ex) / ex < 0.4, s"$g: est $est vs exact $ex")
    }
  }

  test("bloom filter: no false negatives, bounded false positives") {
    import spark.implicits._
    val build = spark.range(0, 2000, 2).select(col("id")) // evens
    val bits = Sketches.bloomBuild(build, "id")
    val probes = spark.range(0, 2000).select(col("id"))
    val flagged = Sketches.bloomMightContain(bits, probes, "id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every member flagged (no false negatives)
    (0L until 2000L by 2).foreach(i => assert(flagged(i) == 1, s"member $i missed"))
    // odd ids are non-members: FP rate well under 10% at d·n/m ≈ 0.06
    val fps = (1L until 2000L by 2).count(i => flagged(i) == 1)
    assert(fps < 100, s"$fps false positives of 1000")
  }

  test("bloom: duplicated probe keys — every copy of a true member flags 1") {
    import spark.implicits._
    // a key probed k times used to accumulate k·d bit-hits and fail the
    // === d test, turning duplicated TRUE members into false negatives
    val build = Seq(10L, 20L, 30L).toDF("id")
    val bits = Sketches.bloomBuild(build, "id")
    val probes = Seq(10L, 10L, 10L, 20L, 20L, 999999L, 999999L).toDF("id")
    val rows = Sketches.bloomMightContain(bits, probes, "id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == 7) // fan-out to every probe row preserved
    assert(rows.filter(_._1 == 10L).forall(_._2 == 1))
    assert(rows.filter(_._1 == 20L).forall(_._2 == 1))
    // duplicated rows of the SAME key always agree
    assert(rows.filter(_._1 == 999999L).map(_._2).distinct.length == 1)
  }

  test("bloom + hll accept string keys (no silent null-cast dropouts)") {
    import spark.implicits._
    // cast("long") on a non-numeric string yields null — before the typed
    // dispatch, string-keyed Blooms reported false negatives for every
    // true member and HLL dropped all values
    val build = Seq("alpha", "beta", "gamma").toDF("k")
    val bits = Sketches.bloomBuild(build, "k")
    val probes = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("k")
    val flagged = Sketches.bloomMightContain(bits, probes, "k")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    Seq("alpha", "beta", "gamma").foreach(k =>
      assert(flagged(k) == 1, s"member $k missed"))
    val df = (0 until 5000).map(i => ("g", s"user_$i")).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, "g", "v")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(regs.nonEmpty)
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 5000) / 5000.0 < 0.35, s"est $est for 5000 distinct strings")
  }

  test("approxProfile on a string column profiles hashes, not null-casts") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"name_${i % 137}"))
      .toDF("id", "name")
    val prof = Sketches.approxProfile(df, Seq("id", "name"))
      .collect().map(r => r.getString(0) -> r).toMap
    val nameRow = prof("name")
    // before the typed dispatch, CAST(name AS BIGINT) nulled every value:
    // n_nulls == n_rows and zero buckets — a populated column reported
    // as all-null with no distincts
    assert(nameRow.getLong(nameRow.fieldIndex("n_rows")) == 1000L)
    assert(nameRow.getLong(nameRow.fieldIndex("n_nulls")) == 0L)
    assert(nameRow.getLong(nameRow.fieldIndex("n_buckets")) > 0L)
    // hashed columns carry no value range (a hash min/max would lie)
    assert(nameRow.isNullAt(nameRow.fieldIndex("min_v")))
    assert(nameRow.isNullAt(nameRow.fieldIndex("max_v")))
    val idRow = prof("id")
    assert(idRow.getLong(idRow.fieldIndex("min_v")) == 0L)
    assert(idRow.getLong(idRow.fieldIndex("max_v")) == 999L)
  }

  test("hll estimate tracks 10k distinct ids within the m=64 error band") {
    import spark.implicits._
    val df = spark.range(10000).select(lit("g").as("g"), col("id"))
    val regs = Sketches.hllRegisters(df, "g", "id")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 10000) / 10000.0 < 0.3, s"est $est")
  }

  test("approxQuantiles: estimates within one bucket width of exact order stats") {
    import spark.implicits._
    // group a uniform 0..999, group b uniform 0..99 — exact percentiles
    // known; the GLOBAL grid (w = 999/50 + 1 = 20) serves both groups
    val df = ((0 until 1000).map(i => ("a", i.toLong))
      ++ (0 until 100).map(i => ("b", i.toLong))).toDF("g", "v")
    val q = Sketches.approxQuantiles(df, "g", "v", buckets = 50,
        percentiles = Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(math.abs(q(("a", 50)) - 500) <= 20, q.toString)
    assert(math.abs(q(("a", 90)) - 900) <= 20, q.toString)
    assert(math.abs(q(("b", 50)) - 50) <= 20, q.toString)
    assert(math.abs(q(("b", 90)) - 90) <= 20, q.toString)
    // estimates are bucket LO edges on the shared grid
    q.values.foreach(v => assert(v % 20 == 0, q.toString))
    // empty input: empty result, stable schema
    val e = Sketches.approxQuantiles(
      Seq.empty[(String, Long)].toDF("g", "v"), "g", "v", 8, Seq(50))
    assert(e.collect().isEmpty
      && e.schema.fieldNames.toSeq == Seq("g", "pct", "n", "est"))
  }

  test("histogram: exact counts, bucket bounds, and degenerate inputs") {
    import spark.implicits._
    // 0..99 in 10 buckets: width = 99/10 + 1 = 10 → exactly 10 per bucket
    val uniform = spark.range(100).toDF("v")
    val h = Sketches.histogram(uniform, "v", 10)
      .orderBy("bucket").collect()
    assert(h.length == 10)
    h.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i && r.getLong(3) == 10L,
        s"bucket $i: $r")
      assert(r.getLong(1) == i * 10L && r.getLong(2) == i * 10L + 9,
        s"bounds of bucket $i: $r")
    }
    // counts sum to the non-null row count; bucket ids stay inside range
    val skewed = Seq(1L, 1L, 1L, 1000000L).toDF("v")
    val hs = Sketches.histogram(skewed, "v", 4).collect()
    assert(hs.map(_.getLong(3)).sum == 4L)
    assert(hs.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 4))
    // all-equal values: one bucket of width 1 holding everything
    val const = Seq(7L, 7L, 7L).toDF("v")
    val hc = Sketches.histogram(const, "v", 8).collect()
    assert(hc.length == 1 && hc.head.getLong(0) == 0L
      && hc.head.getLong(1) == 7L && hc.head.getLong(3) == 3L)
    // empty and all-null inputs: empty result, stable schema
    val empty = Sketches.histogram(spark.range(0).toDF("v"), "v", 4)
    assert(empty.collect().isEmpty)
    assert(empty.schema.fieldNames.toSeq == Seq("bucket", "lo", "hi", "n"))
    val nulls = Seq[Option[Long]](None, None).toDF("v")
    assert(Sketches.histogram(nulls, "v", 4).collect().isEmpty)
  }
}
