package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Per-segment deterministic HNSW (VERDICT r16 #6). HNSW output is
 * approximate by design and its construction is not SQL-replayable, so
 * correctness here is the recall-table pattern: deterministic
 * construction pinned bit-for-bit, recall pinned against the exact
 * brute force, self-retrieval exact, crash fence honored.
 */
class HnswSpec extends AnyFunSuite with SparkTestBase {

  private def emb: DataFrame =
    spark.read.parquet(sf("embeddings"))

  private def queries: DataFrame =
    emb.filter(col("vec_id") < 20)

  /** exact cosine top-k per query — the recall ground truth */
  private def bruteTopK(k: Int): Map[Long, Set[Long]] = {
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        s += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else s / math.sqrt(na * nb)
    }
    qs.map { case (qid, qv) =>
      qid -> vecs.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
  }

  test("construction is deterministic: two builds produce identical graphs") {
    val p1 = Files.createTempDirectory("hnsw1").toString
    val p2 = Files.createTempDirectory("hnsw2").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p1, nSegments = 4)
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p2, nSegments = 4)
    def edges(p: String): Seq[String] =
      spark.read.parquet(s"$p/segs/base/nodes")
        .select(col("seg"), col("vec_id"), col("level"),
          explode(col("nbrs")).as("e"))
        .select(col("seg"), col("vec_id"), col("level"),
          col("e.lvl"), col("e.dst"))
        .collect().map(_.toString).sorted.toSeq
    val e1 = edges(p1); val e2 = edges(p2)
    assert(e1.nonEmpty && e1 == e2)
  }

  test("recall@10 against the exact brute force clears 0.9; self-retrieval is exact") {
    val p = Files.createTempDirectory("hnswr").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p,
      m = 8, efConstruction = 64, nSegments = 4)
    val truth = bruteTopK(10)
    val served = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
      k = 10, efSearch = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = truth.map { case (q, want) =>
      want.intersect(served.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
    // a query that IS an indexed vector must rank itself first
    val top1 = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
      k = 1, efSearch = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    top1.foreach { case (q, got) => assert(got == q, s"query $q -> $got") }
  }

  test("higher efSearch never lowers recall (monotone cost/recall knob)") {
    val p = Files.createTempDirectory("hnswm").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p, nSegments = 4)
    val truth = bruteTopK(10)
    def recallAt(ef: Int): Double = {
      val served = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
        k = 10, efSearch = ef)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rs = truth.map { case (q, want) =>
        want.intersect(served.getOrElse(q, Set.empty)).size.toDouble / want.size
      }
      rs.sum / rs.size
    }
    val r16 = recallAt(16); val r64 = recallAt(64)
    assert(r64 >= r16, s"ef=16 -> $r16, ef=64 -> $r64")
    // and the walk's probe cost grows with ef (stats surface sane)
    def evals(ef: Int): Long =
      Hnsw.hnswSearchStats(spark, p, queries, "vec_id", "embedding",
        k = 10, efSearch = ef)
        .agg(sum(col("dist_evals"))).head().getLong(0)
    assert(evals(64) > evals(16))
  }

  test("filtered search: only allowed ids surface, recall holds vs the filtered brute force") {
    import spark.implicits._
    val p = Files.createTempDirectory("hnswf").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p, nSegments = 4)
    val allow = emb.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val allowSet = allow.as[Long].collect().toSet
    val served = Hnsw.hnswTopKFiltered(spark, p, queries, "vec_id",
      "embedding", allow, k = 10, efSearch = 128)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // nothing outside the allow set ever surfaces
    served.values.foreach(ids => assert(ids.subsetOf(allowSet)))
    // recall vs the brute force RESTRICTED to the allow set
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().filter(v => allowSet(v._1))
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        s += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else s / math.sqrt(na * nb)
    }
    val recalls = qs.map { case (qid, qv) =>
      val want = vecs.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      want.intersect(served.getOrElse(qid, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"filtered mean recall@10 = $mean")
    // an over-broad filter set refuses loudly (the brute-force dispatch)
    val cap = intercept[IllegalArgumentException] {
      val wide = spark.range(0, 1000001).select(col("id").as("vec_id"))
      Hnsw.hnswTopKFiltered(spark, p, queries, "vec_id", "embedding",
        wide, k = 10)
    }
    assert(cap.getMessage.contains("brute-force"))
  }

  test("a serve refuses an uncommitted index (ready marker is the fence)") {
    val p = Files.createTempDirectory("hnswx").toString
    intercept[IllegalArgumentException] {
      Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding", k = 3)
    }
  }

  test("append lands as new segments: visible, deterministic, recall holds") {
    val p = Files.createTempDirectory("hnswapp").toString
    Hnsw.buildHnswIndex(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", p, nSegments = 4)
    Hnsw.appendHnswSegments(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", p, nNewSegments = 4)
    // every appended vector retrieves itself exactly (rank 1, cos 1)
    import spark.implicits._
    val oddQs = emb.filter(col("vec_id") % 2 =!= 0)
      .limit(20)
    val self = Hnsw.hnswTopK(spark, p, oddQs, "vec_id", "embedding",
      k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    self.foreach { case (q, got) => assert(got == q, s"self-retrieval $q") }
    // recall over the UNION corpus still clears the build bound
    val served = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
      k = 10, efSearch = 64).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val want = bruteTopK(10)
    val recalls = want.toSeq.map { case (q, w) =>
      w.intersect(served.getOrElse(q, Set.empty)).size.toDouble / w.size
    }
    assert(recalls.sum / recalls.length >= 0.9,
      s"post-append mean recall@10 = ${recalls.sum / recalls.length}")
  }

  test("an orphan segment dir (crashed append) is invisible to serves") {
    val p = Files.createTempDirectory("hnsworph").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", p, nSegments = 4)
    val before = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
      k = 5).collect().map(_.toString).sorted.toSeq
    // simulate a crash between the node write and the manifest commit:
    // a fully-written seg dir that no manifest version references
    val src = new java.io.File(s"$p/segs/base/nodes")
    val dst = new java.io.File(s"$p/segs/app-orphan/nodes")
    dst.getParentFile.mkdirs()
    java.nio.file.Files.walk(src.toPath).forEach { f =>
      val rel = src.toPath.relativize(f)
      val t = dst.toPath.resolve(rel)
      if (java.nio.file.Files.isDirectory(f)) t.toFile.mkdirs()
      else java.nio.file.Files.copy(f, t)
    }
    val after = Hnsw.hnswTopK(spark, p, queries, "vec_id", "embedding",
      k = 5).collect().map(_.toString).sorted.toSeq
    assert(after == before, "orphan seg dir leaked into the serve")
  }
}
