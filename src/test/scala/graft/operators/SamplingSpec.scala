package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("hash split: deterministic, exhaustive, ~0.8/0.1/0.1") {
    val once = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again) // pure function of id
    val total = once.values.sum
    assert(total == docs.count())
    assert(once("train").toDouble / total > 0.7 && once("train").toDouble / total < 0.9)
  }

  test("hash sample: fraction roughly honored, subset stable under salt") {
    val n = docs.count()
    val s = Sampling.hashSample(docs, "doc_id", 0.2).count()
    assert(s.toDouble / n > 0.1 && s.toDouble / n < 0.3, s"got $s of $n")
    // different salt → different subset (overwhelmingly)
    val a = Sampling.hashSample(docs, "doc_id", 0.2, salt = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("stratified sample: per-stratum rates, default fallback, determinism") {
    val fr = Map("src0" -> 1.0, "src1" -> 0.5)
    val got = Sampling.stratifiedHashSample(docs, "doc_id", "source",
        fr, defaultFraction = 0.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 keeps everything; rate 0 strata vanish entirely
    assert(got("src0") == perSource("src0"))
    assert(got.keySet == Set("src0", "src1"))
    // 0.5 stratum lands in a loose band around half
    val frac = got("src1").toDouble / perSource("src1")
    assert(frac > 0.2 && frac < 0.8, s"src1 kept $frac")
    // membership is exactly the per-stratum filtered hashSample
    val viaUniform = docs.filter(col("source") === "src1")
      .filter(Sampling.hashUniform(col("doc_id"), 0L) <
        lit((0.5 * 1000000007L.toDouble).toLong))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stratified = Sampling.stratifiedHashSample(docs, "doc_id", "source",
        fr, defaultFraction = 0.0)
      .filter(col("source") === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stratified == viaUniform)
  }

  test("bottom-k sample: exactly k per group, stable across reruns and salts differ") {
    val got = Sampling.bottomKByHash(docs, "source", "doc_id", k = 3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 3))
    val a = Sampling.bottomKByHash(docs, "source", "doc_id", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bottomKByHash(docs, "source", "doc_id", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // deterministic
    val c = Sampling.bottomKByHash(docs, "source", "doc_id", k = 3, salt = 9L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != c) // salt rotates the sample
    // mergeability: bottom-k of a union == bottom-k of parts' bottom-ks
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val merged = Sampling.bottomKByHash(
      Sampling.bottomKByHash(half1, "source", "doc_id", 3)
        .unionByName(Sampling.bottomKByHash(half2, "source", "doc_id", 3))
        .drop("sample_rank"),
      "source", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(merged == a)
  }

  test("tokenBudgetSample: distributed prefix sum == plain global window, budget honored") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    // adversarial frame: many score ties (range-partition boundaries land
    // mid-tie), token counts 1..40, across 16 shuffle partitions
    val rows = s.range(2000)
      .select(col("id"),
        (col("id") % 7).as("score"),
        (col("id") % 40 + 1).as("toks"))
    val got = Sampling.tokenBudgetSample(rows, "id", "score", "toks",
        budget = 5000L, partitions = 16)
      .select(col("id"), col("cum_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive single-window reference (fine at spec scale)
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") <= 5000L)
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.max <= 5000L)
    // static-cuts path (known score domain, zero extra jobs) — same result
    val gotStatic = Sampling.tokenBudgetSample(rows, "id", "score", "toks",
        budget = 5000L, partitions = 16, scoreRange = Some((0.0, 6.0)))
      .select(col("id"), col("cum_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStatic == want)
    // prefix property: the selection is closed under the global order
    val selected = rows.filter(col("id").isin(got.keys.toSeq.map(Long.box): _*))
    assert(selected.count() == got.size)
  }

  test("tokenBudgetSample: NULL scores sort last, not first") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    // 3 real scores + 2 null-score rows with huge token counts: if nulls
    // landed in bucket 0 they would inflate every later offset and evict
    // the true prefix
    val rows = s.range(5).select(col("id"),
      when(col("id") < 3, col("id") * 10).as("score"),
      when(col("id") < 3, lit(5L)).otherwise(lit(1000L)).as("toks"))
    val got = Sampling.tokenBudgetSample(rows, "id", "score", "toks",
        budget = 15L, partitions = 4)
      .select(col("id"), col("cum_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") <= 15L)
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.keySet == Set(0L, 1L, 2L)) // the three scored rows, in budget
  }

  test("tokenBudgetSample: randomized equivalence with the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    // deterministic pseudo-random inputs across several shapes: heavy
    // ties, nulls mixed in, token counts spanning 3 orders of magnitude,
    // partition counts that do and don't divide the data evenly
    for ((seed, np) <- Seq((1L, 3), (7L, 8), (13L, 16))) {
      val rows = s.range(1500)
        .select(col("id"),
          when((col("id") * seed) % 11 =!= 0, (col("id") * seed) % 97).as("score"),
          ((col("id") * (seed + 2)) % 1000 + 1).as("toks"))
      val budget = 20000L
      val got = Sampling.tokenBudgetSample(rows, "id", "score", "toks",
          budget, partitions = np)
        .select(col("id"), col("cum_tokens")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = Window.orderBy(col("score").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = rows.withColumn("cum", sum(col("toks")).over(w))
        .filter(col("cum") <= budget)
        .select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed np=$np")
    }
  }

  test("tokenBudgetSample: zero budget selects nothing; huge budget selects all") {
    val s = spark
    val rows = s.range(100).select(col("id"), col("id").as("score"), lit(5L).as("toks"))
    assert(Sampling.tokenBudgetSample(rows, "id", "score", "toks", 0L).count() == 0)
    val all = Sampling.tokenBudgetSample(rows, "id", "score", "toks", Long.MaxValue / 2)
    assert(all.count() == 100)
    // last row's cumulative = total tokens
    assert(all.agg(max(col("cum_tokens"))).head().getLong(0) == 500L)
  }

  test("weighted sample: keep rate tracks weight, deterministic, bounds enforced") {
    val s = spark
    // three weight bands: w = wMax (full rate), w = wMax/2, w = 0 (never)
    val rows = s.range(30000).select(col("id"),
      when(col("id") % 3 === 0, lit(1000L))
        .when(col("id") % 3 === 1, lit(500L))
        .otherwise(lit(0L)).as("w"))
    val kept = Sampling.weightedHashSample(rows, "id", "w", wMax = 1000L,
        baseFraction = 0.8)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0L), "zero-weight rows must never be sampled")
    // large NEGATIVE weights must never match either — an unclamped
    // product would overflow int64 and wrap positive (review finding)
    val negRows = rows.withColumn("w",
      when(col("w") === 0L, lit(-20000000000L)).otherwise(col("w")))
    assert(Sampling.weightedHashSample(negRows, "id", "w", 1000L, 0.8)
      .filter(col("w") < 0L).count() == 0)
    // expected rates: 0.8 for w=1000, 0.4 for w=500 over 10k rows each
    assert(math.abs(kept(1000L) - 8000L) < 400, kept.toString)
    assert(math.abs(kept(500L) - 4000L) < 400, kept.toString)
    // deterministic: same rows on a rerun and under a different partitioning
    val a = Sampling.weightedHashSample(rows, "id", "w", 1000L, 0.8)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.weightedHashSample(rows.repartition(13), "id", "w", 1000L, 0.8)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // weights above wMax saturate at baseFraction, never exceed it
    val over = rows.withColumn("w", when(col("w") === 1000L, lit(999999L)).otherwise(col("w")))
    val nOver = Sampling.weightedHashSample(over, "id", "w", 1000L, 0.8)
      .filter(col("w") === 999999L).count()
    assert(math.abs(nOver - 8000L) < 400, nOver.toString)
    intercept[IllegalArgumentException] {
      Sampling.weightedHashSample(rows, "id", "w", wMax = 2000000000L)
    }
  }

  test("rebalanceToUniform: every stratum's kept token mass tracks the smallest stratum") {
    import spark.implicits._
    // three strata with 1×/4×/16× token mass (ids disjoint so the hash
    // keep test is independent across strata)
    def docs(src: String, base: Long, n: Int, tokens: Int) =
      (0 until n).map(i => (base + i, src, Seq.fill(tokens)("w").mkString(" ")))
    val df = (docs("small", 0L, 500, 4) ++ docs("mid", 100000L, 1000, 8)
      ++ docs("big", 200000L, 2000, 16)).toDF("doc_id", "source", "text")
    val kept = Sampling.rebalanceToUniform(df, "doc_id", "source", "text")
    val byScr = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest stratum is kept whole (threshold = P)
    assert(byScr("small") == 500L, byScr.toString)
    // the others are downsampled to ~T_min tokens = 2000 → ~250 docs of 8
    // and ~125 docs of 16; Bernoulli noise bounded generously
    assert(math.abs(byScr("mid") - 250L) < 60, byScr.toString)
    assert(math.abs(byScr("big") - 125L) < 45, byScr.toString)
    // deterministic: same membership on rerun and under repartitioning
    val again = Sampling.rebalanceToUniform(df.repartition(7), "doc_id", "source", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(kept.select("doc_id").as[Long].collect().sorted))
    // the large-K broadcast-join path (forced via the gate) is identical
    val joined = Sampling.rebalanceToUniform(df, "doc_id", "source", "text",
        caseChainMax = 0)
      .select("doc_id").as[Long].collect().sorted
    assert(joined.sameElements(again))
    // degenerate inputs: NULL strata are dropped (both paths), an
    // all-NULL-text stratum keeps whole without dragging thresholds to 0
    val degen = (docs("tiny", 300000L, 10, 4)
      ++ (0 until 5).map(i => (400000L + i, null: String, "x y z"))
      ++ (0 until 5).map(i => (500000L + i, "ghost", null: String)))
      .toDF("doc_id", "source", "text")
    Seq(64, 0).foreach { gate =>
      val kd = Sampling.rebalanceToUniform(degen, "doc_id", "source", "text",
          caseChainMax = gate)
        .groupBy("source").count().collect()
        .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
      assert(kd.getOrElse("tiny", 0L) == 10L, s"gate=$gate: $kd")
      assert(kd.getOrElse("ghost", 0L) == 5L, s"gate=$gate: $kd")
      assert(!kd.contains("NULL"), s"gate=$gate: $kd")
    }
  }

  test("temperatureSampleSqrt: α=0.5 sits between uniform rebalance and natural; geometric-mean mass") {
    import spark.implicits._
    def docs(src: String, base: Long, n: Int, tokens: Int) =
      (0 until n).map(i => (base + i, src, Seq.fill(tokens)("w").mkString(" ")))
    val df = (docs("small", 0L, 500, 4) ++ docs("mid", 100000L, 1000, 8)
      ++ docs("big", 200000L, 2000, 16)).toDF("doc_id", "source", "text")
    val temp = Sampling.temperatureSampleSqrt(df, "doc_id", "source", "text")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val unif = Sampling.rebalanceToUniform(df, "doc_id", "source", "text")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest stratum whole (rate √(Tmin/Tmin) = 1)
    assert(temp("small") == 500L, temp.toString)
    // every stratum keeps at least as much as under uniform rebalance
    // (√x ≥ x on [0,1]) but no more than natural
    Seq("mid", "big").foreach { s =>
      assert(temp(s) >= unif(s), s"$s: temp=${temp(s)} < unif=${unif(s)}")
    }
    assert(temp("mid") < 1000L && temp("big") < 2000L, temp.toString)
    // expected kept docs: n_s·√(Tmin/Ts) = 1000/2 = 500 and 2000/√16·... :
    // mid rate √(2000/8000)=0.5 → ~500; big rate √(2000/32000)=0.25 → ~500
    // (the geometric-mean property: every stratum's kept MASS ≈ √(Tmin·Ts))
    assert(math.abs(temp("mid") - 500L) < 80, temp.toString)
    assert(math.abs(temp("big") - 500L) < 80, temp.toString)
    // deterministic under repartitioning + the broadcast-join path
    val a = Sampling.temperatureSampleSqrt(df.repartition(7), "doc_id", "source", "text")
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.temperatureSampleSqrt(df, "doc_id", "source", "text",
        caseChainMax = 0)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("hashUniform: 64-bit and negative ids never wrap, values match the mod-P formula") {
    import spark.implicits._
    val P = 1000000007L
    // 5e9 would overflow the unreduced (id·2654435761) product in int64;
    // Long.MaxValue-adjacent ids are the hash-derived-id case from dedup
    val ids = Seq(0L, 12345L, 5000000000L, Long.MaxValue - 1, -3L, -5000000000L)
    val got = ids.toDF("id")
      .select(col("id"), Sampling.hashUniform(col("id"), 0L).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val r = ((id % P) + P) % P          // true mathematical mod
      val expect = (r * 2654435761L) % P  // r < P ⇒ product < 2.66e18, exact
      assert(got(id) == expect, s"id $id: got ${got(id)}, want $expect")
      assert(got(id) >= 0 && got(id) < P)
    }
  }
}
