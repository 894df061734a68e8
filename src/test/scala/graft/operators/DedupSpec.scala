package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    val base = spark.read.parquet(sf("documents"))
    // inject: exact copies of docs 0-9 (ids 10000+), edited copies of 10-19
    // (ids 20000+, first 15 chars replaced) — deterministic near-dups
    val exact = base.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 10000)
    val edited = base.filter(col("doc_id") >= 10 && col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 20000)
      .withColumn("text", concat(lit("XYZXYZXYZXYZXYZ"), expr("substring(text, 16)")))
    base.unionAll(exact).unionAll(edited).cache()
  }

  test("exact dup groups finds exactly the 10 injected copies") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 10)
    assert(groups.forall(_.getLong(1) == 2)) // each group: original + copy
    assert(groups.map(_.getLong(2)).sorted.toSeq == (0L to 9L)) // keeper = min id
  }

  test("dropExactDuplicates keeps min-id row") {
    assert(Dedup.dropExactDuplicates(docs, "doc_id", "text").count() == docs.count() - 10)
  }

  test("minhash LSH finds exact and edited copies, not unrelated docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("est_jaccard")))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // all 10 exact pairs present with est_jaccard 1.0
    (0L to 9L).foreach(i => assert(pairSet.contains((i, i + 10000)), s"missing exact pair $i"))
    assert(pairs.filter(p => p._2 == p._1 + 10000).forall(_._3 == 1.0))
    // edited copies still similar (~90% of shingles shared)
    val editedHits = (10L to 19L).count(i => pairSet.contains((i, i + 20000)))
    assert(editedHits >= 8, s"only $editedHits/10 edited pairs found")
    // organic pairs between unrelated docs may legitimately appear — the
    // synthetic corpus draws from a ~30-word vocabulary, so two random docs
    // can share most shingles. Only require every reported pair to clear
    // the threshold.
    assert(pairs.forall(_._3 >= 0.6))
  }

  test("minhash estimate tracks exact jaccard (property)") {
    import graft.functions.HashFunctions._
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "the quick brown fox jumps over the lazy cat and runs far away home"
    def grams(s: String) = s.sliding(5).toSet
    val exact = grams(a).intersect(grams(b)).size.toDouble / grams(a).union(grams(b)).size
    val (sa, sb) = (minHashSignature(a, 5, 256), minHashSignature(b, 5, 256))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - exact) < 0.12, s"est $est vs exact $exact")
  }

  test("simhash blocking finds near-identical docs") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    (0L to 9L).foreach(i => assert(pairSet.contains((i, i + 10000))))
    assert(pairs.filter(p => p._2 == p._1 + 10000).forall(_._3 == 0)) // identical → distance 0
  }

  test("minhash banding finds every pair the brute force finds (full recall)") {
    import graft.functions.HashFunctions.minHashSignature
    // brute force over full signatures — the DuckDB oracle computes exactly
    // this, so banding recall < 1 would break the correctness gate
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), minHashSignature(r.getString(1), 5, 64)))
    val brute = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      a = rows(i); b = rows(j)
      n = a._2.zip(b._2).count { case (x, y) => x == y }
      if n >= 39 // ceil(0.6 * 64)
    } yield {
      val (x, y) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      (x, y)
    }).toSet
    val banded = Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, s"banding missed ${(brute -- banded).size} / extra ${(banded -- brute).size}")
  }

  test("duplicate clusters: transitive closure, min-id labels") {
    import spark.implicits._
    // 1-2-3-7 form a chain (no direct 1~7 pair); 10-11 separate
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicate clusters: distributed loop == driver union-find across the size gate") {
    import spark.implicits._
    // deterministic random-ish graph with chains, cycles, and singleton
    // pairs — both dispatch paths must label it identically
    val edges = (0 until 400).map { i =>
      val a = (i * 37) % 97; val b = (a + 1 + (i * 13) % 5).toLong
      (a.toLong, b)
    }
    val pairs = edges.toDF("a", "b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaDriver = toMap(Dedup.duplicateClusters(pairs)) // under the gate
    val viaLoop = toMap(Dedup.duplicateClusters(pairs, driverMaxEdges = 0L))
    assert(viaDriver == viaLoop)
    assert(viaDriver.nonEmpty)
  }

  test("ngram jaccard pairs: exact copies have jaccard 1") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val exactPairs = pairs.filter(p => p._2 == p._1 + 10000)
    assert(exactPairs.length == 10)
    exactPairs.foreach { case (_, _, inter, na, nb) =>
      assert(inter == na && na == nb) // identical gram sets
    }
    assert(pairs.count(p => p._2 == p._1 + 20000) >= 8) // edited still ≥0.5
  }

  test("ngram jaccard: prefix-filtered join == dense broadcast loop (lossless filter)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val dense = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(key).toSet
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(key).toSet
    assert(prefix == dense,
      s"prefix-only ${(prefix -- dense).size}, dense-only ${(dense -- prefix).size}")
    assert(dense.nonEmpty)
  }

  test("ngram jaccard: sparse inverted index == dense broadcast loop, pair for pair") {
    // the dispatcher's contract: both plans compute the same exact result,
    // so which one runs is purely a scale decision
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val dense = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(key).toSet
    val sparse = Dedup.ngramJaccardPairsSparse(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(key).toSet
    assert(dense == sparse,
      s"dense-only ${(dense -- sparse).size}, sparse-only ${(sparse -- dense).size}")
    assert(dense.nonEmpty)
  }

  test("embedding cosine pairs: scaled copies collide and verify") {
    import spark.implicits._
    val base = spark.read.parquet(sf("embeddings"))
    val copies = base.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 10000)
      .withColumn("embedding", expr("transform(embedding, x -> x * CAST(1.5 AS FLOAT))"))
    val aug = base.unionAll(copies)
    val pairs = Dedup.embeddingCosinePairs(aug, "vec_id", "embedding", threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 20)
    pairs.foreach { case (a, b, cos) =>
      assert(b == a + 10000)
      assert(cos > 0.999999)
    }
  }

  test("embedding incremental dedup: copies of reference vectors dropped, organics kept") {
    val base = spark.read.parquet(sf("embeddings"))
    val ref = base.filter(col("vec_id") < 250)
    val batch = base.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
      .unionAll(base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 20000).as("vec_id"),
          expr("transform(embedding, x -> x * CAST(1.5 AS FLOAT))").as("embedding")))
    val kept = Dedup.dropEmbeddingDupsAgainst(batch, ref, "vec_id", "embedding")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every scaled copy of a reference vector is dropped...
    assert(kept.forall(_ < 20000))
    // ...and every organic batch vector survives (random unit vectors
    // don't organically hit cos >= 0.98)
    assert(kept == (250L until base.count()).toSet)
  }

  test("incremental dedup == banding-semantics replay, including near-threshold pairs") {
    import spark.implicits._
    import graft.functions.HashFunctions.minHashSignature
    // Scattered single-char edits at increasing density sweep the
    // signature-agreement rate from 1.0 down THROUGH the t=0.6 boundary —
    // exactly where pure banding may lack a shared band. The contract
    // (share a full band AND n_match ≥ 39) must match an independent
    // replay at every edit level, so correctness is not data-dependent.
    val base = spark.read.parquet(sf("documents"))
    val ref = base.filter(col("doc_id") < 60)
    val refRows = ref.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batchRows = refRows.take(20).zipWithIndex.map { case ((id, text), k) =>
      val t = text.toCharArray
      var i = 3; var edited = 0
      while (edited < k * 4 && i < t.length) { t(i) = 'Q'; i += 5; edited += 1 }
      (id + 50000L, new String(t))
    }
    val batch = batchRows.toSeq.toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicatesAgainst(ref, batch, "doc_id", "text",
        threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent replay of the two-part contract from raw signatures
    val refSigs = refRows.map { case (_, t) => minHashSignature(t, 5, 64) }
    val expectDropped = batchRows.filter { case (_, t) =>
      val bs = minHashSignature(t, 5, 64)
      refSigs.exists { rs =>
        val m = bs.zip(rs).map { case (x, y) => x == y }
        val nMatch = m.count(identity)
        val sharesBand = (0 until 16).exists(b => (0 until 4).forall(r => m(b * 4 + r)))
        sharesBand && nMatch >= 39
      }
    }.map(_._1).toSet
    val dropped = batchRows.map(_._1).toSet -- kept
    assert(dropped == expectDropped,
      s"engine dropped ${dropped.size}, replay expects ${expectDropped.size}; " +
        s"diff ${(dropped.diff(expectDropped)).union(expectDropped.diff(dropped))}")
    // the sweep really crosses the boundary: some edited copies drop, some survive
    assert(expectDropped.nonEmpty && expectDropped.size < batchRows.length)
  }

  test("incremental dedup drops batch rows near-dup'ing the reference, keeps the rest") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("documents"))
    val ref = docs.filter(col("doc_id") < 100)
    // batch: an exact copy of ref doc 5, a lightly edited copy of ref
    // doc 7, and a clearly novel doc
    val batch = Seq(
      (9001L, docs.filter(col("doc_id") === 5).head().getAs[String]("text")),
      (9002L, "ZZZZZ" + docs.filter(col("doc_id") === 7).head().getAs[String]("text").drop(5)),
      (9003L, "completely unrelated content qqq www eee rrr ttt yyy uuu iii")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicatesAgainst(ref, batch, "doc_id", "text",
        threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(9001L)) // exact copy dropped
    assert(!kept.contains(9002L)) // near copy dropped
    assert(kept.contains(9003L))  // novel survives
    // reference-internal duplicates are irrelevant: batch vs EMPTY ref
    val all = Dedup.dropNearDuplicatesAgainst(
        ref.filter(col("doc_id") < 0), batch, "doc_id", "text")
      .count()
    assert(all == 3)
  }

  test("span dedup == string-exact brute force on the real corpus") {
    val k = 8
    val base = spark.read.parquet(sf("documents")).select("doc_id", "text")
    // brute force with STRING span identity (not hashes): also proves the
    // mod-P window hash is collision-free on this corpus
    val rows = base.collect().map(r => (r.getLong(0), r.getString(1)))
    val windows = rows.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(k).filter(_.length == k).map(w => (id, w.mkString(" ")))
    }
    val global = windows.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = windows.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.count(w => global(w._2) >= 2).toLong))
    }
    val got = Dedup.spanDupStats(base, "doc_id", "text", k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "corpus should contain dup spans")
  }

  test("keep best: longest member wins, ties break to min id, singletons kept") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L), (9L, 9L))
      .toDF("doc_id", "cluster")
    val docs = Seq(
      (1L, "short"), (2L, "the longest text here"), (3L, "mid text"),
      (7L, "equal len"), (8L, "equal le2"), // tie on length -> min id (7)
      (9L, "solo")
    ).toDF("doc_id", "text")
    val got = Dedup.keepBest(clusters, docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 2L, 21L)))
    assert(got(7L) == ((2L, 7L, 9L)))
    assert(got(9L) == ((1L, 9L, 4L)))
    // plan shape: argmax must be an aggregate, not a window sort
    val plan = Dedup.keepBest(clusters, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "keepBest must not use a window function")
  }

  test("line dedup rewrite == brute force on the real corpus") {
    val k = 8
    val base = spark.read.parquet(sf("documents")).select("doc_id", "text")
    val rows = base.collect().map(r => (r.getLong(0), r.getString(1)))
    val chunked = rows.map { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      id -> toks.grouped(k).map(_.mkString(" ")).toVector
    }.filter(_._2.nonEmpty)
    // duplicated = chunk string present in >= 2 DISTINCT docs
    val docsPerChunk = chunked.flatMap { case (id, cs) => cs.map(c => (c, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = chunked.map { case (id, cs) =>
      val kept = cs.filter(c => docsPerChunk(c) < 2)
      id -> ((cs.length.toLong, (cs.length - kept.length).toLong, kept.mkString(" ")))
    }.toMap
    val got = Dedup.lineDedupRewrite(base, "doc_id", "text", k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "corpus should contain dropped chunks")
    assert(got.values.exists(v => v._2 > 0 && v._3.nonEmpty),
      "some doc should survive partially rewritten")
  }

  test("line dedup: all-unique corpus is returned verbatim (tokenized)") {
    import spark.implicits._
    val d = (1L to 20L).map(i =>
      (i, (0 until 12).map(j => s"w${i}x$j").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.lineDedupRewrite(d, "doc_id", "text", k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    (1L to 20L).foreach { i =>
      val (dropped, clean) = got(i)
      assert(dropped == 0L)
      assert(clean == (0 until 12).map(j => s"w${i}x$j").mkString(" "))
    }
  }

  test("line dedup: cross-doc boilerplate dropped, within-doc repeat kept") {
    import spark.implicits._
    // exactly 8 tokens -> one aligned chunk shared by docs 1 and 2
    val boiler = "subscribe to our newsletter for updates every day"
    val d = Seq(
      (1L, s"$boiler unique alpha content one two three four five"),
      (2L, s"$boiler other beta content six seven eight nine ten"),
      // 8-token prefix + repeat x16 -> chunks 1 and 2 are identical
      // WITHIN the doc (digest seen twice, but in one distinct doc only)
      (3L, "solo gamma page one two three four five " +
           Seq.fill(16)("repeat").mkString(" "))
    ).toDF("doc_id", "text")
    val m = Dedup.lineDedupRewrite(d, "doc_id", "text", k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1/2: 16 tokens -> 2 chunks; the shared boilerplate chunk is
    // dropped, the unique chunk survives
    assert(m(1L) == ((2L, 1L, "unique alpha content one two three four five")))
    assert(m(2L) == ((2L, 1L, "other beta content six seven eight nine ten")))
    // doc 3 repeats a chunk WITHIN itself only -> nothing dropped
    assert(m(3L) == ((3L, 0L,
      "solo gamma page one two three four five " +
        Seq.fill(16)("repeat").mkString(" "))))
  }

  test("span dedup: injected shared span counted in both docs") {
    import spark.implicits._
    val phrase = "alpha bravo charlie delta echo foxtrot golf hotel"
    val d = Seq(
      (1L, s"one two three $phrase nine ten eleven twelve"),
      (2L, s"$phrase completely different trailing words here now"),
      (3L, "no shared content at all just singular tokens everywhere right")
    ).toDF("doc_id", "text")
    val m = Dedup.spanDupStats(d, "doc_id", "text", k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 15 tokens -> 8 windows, 1 duplicated (the shared phrase)
    assert(m(1L) == ((8L, 1L)))
    // doc2: 14 tokens -> 7 windows, 1 duplicated
    assert(m(2L) == ((7L, 1L)))
    assert(m(3L)._2 == 0L)
  }

  test("cdcChunks: boundary contract, exact coverage, shift robustness") {
    import spark.implicits._
    val P = graft.functions.HashFunctions.P
    val (w, mask) = (8, 64)
    // independent reference for the cut positions: direct w-term sum
    // (the operator maintains the hash incrementally — different code path)
    def refCuts(text: String): Seq[Int] =
      (w to text.length - 1).filter { i => // 1-based, full window, not last
        val h = (0 until w).map(j =>
          BigInt(text.charAt(i - 1 - j).toInt) * BigInt(131).pow(j)).sum % P
        h % mask == 0
      }
    // deterministic pseudo-random text long enough to contain cuts
    val rnd = new scala.util.Random(42) // seeded → deterministic fixture
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    assert(refCuts(base).nonEmpty, "fixture must produce at least one cut")
    val shifted = "XYZAB" + base // early insertion
    val df = Seq((1L, base), (2L, shifted), (3L, ""), (4L, "tiny")).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(df, "doc_id", "text", w, mask).collect()
      .groupBy(_.getLong(0))
    // cut positions match the reference: chunk starts are 1 + each cut
    val starts1 = out(1L).map(_.getLong(2)).sorted.toSeq
    assert(starts1 == (1L +: refCuts(base).map(_ + 1L)).sorted)
    // exact coverage: chunks tile the text; digests are the substrings' md5
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for ((id, text) <- Seq(1L -> base, 2L -> shifted, 4L -> "tiny")) {
      val chunks = out(id).sortBy(_.getLong(1))
      val rebuilt = chunks.map(r => text.substring(
        r.getLong(2).toInt - 1, r.getLong(2).toInt - 1 + r.getLong(3).toInt)).mkString
      assert(rebuilt == text, s"doc $id chunks must tile the text")
      chunks.foreach(r => assert(r.getString(4) == md5hex(text.substring(
        r.getLong(2).toInt - 1, r.getLong(2).toInt - 1 + r.getLong(3).toInt))))
    }
    // empty text → no chunks; short text → one whole-doc chunk
    assert(!out.contains(3L))
    assert(out(4L).length == 1 && out(4L).head.getLong(3) == 4L)
    // THE CDC property: after an early 5-char insertion, every chunk
    // beyond the first boundary keeps its digest (fixed-offset chunking
    // would shift every window). Allow only the head chunk(s) to differ.
    val d1 = out(1L).map(_.getString(4)).toSet
    val d2 = out(2L).map(_.getString(4)).toSet
    val shared = d1.intersect(d2).size
    assert(shared >= d1.size - 1,
      s"shift robustness: $shared shared of ${d1.size} (head may differ)")
    assert(d1.size > 2, "fixture must have several chunks for the property to bite")
  }

  test("spanDedupRewrite: keeper keeps its span, copies lose it, order preserved") {
    import spark.implicits._
    val span = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens
    val df = Seq(
      (1L, s"intro here $span and a tail"),   // keeper (lowest id with the span)
      (2L, s"other start $span different end"), // copy context, same span
      (3L, "fully distinct content with no shared windows at all"),
      (4L, span))                              // bare copy
      .toDF("doc_id", "text")
    val out = Dedup.spanDedupRewrite(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is the keeper: nothing scrubbed
    assert(out(1L)._2 == 0L && out(1L)._3 == s"intro here $span and a tail")
    // docs 2 and 4 lose exactly the 8 shared tokens
    assert(out(2L)._2 == 8L && out(2L)._3 == "other start different end")
    assert(out(4L) == ((8L, 8L, "")))
    // untouched doc
    assert(out(3L)._2 == 0L)
    // conservation: scrubbed + kept tokens = totals everywhere
    out.values.foreach { case (n, s2, clean) =>
      assert(clean.split(" ").count(_.nonEmpty) == n - s2)
    }
  }

  test("snapshot diff: added/removed/changed memberships, unchanged mass drops out") {
    import spark.implicits._
    val a = Seq((1L, "kept"), (2L, "edited soon"), (3L, "to be removed"),
      (4L, "also kept")).toDF("doc_id", "text")
    val b = Seq((1L, "kept"), (2L, "edited NOW"), (4L, "also kept"),
      (5L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(a, b, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // multi-column payload: a null vs non-null difference is a change,
    // and null payloads on both sides are equal (each column digests
    // separately, null as a fixed non-hex sentinel — never dropped)
    val a2 = Seq((1L, Some("x"), Some("y")), (2L, None: Option[String], Some("z")))
      .toDF("id", "p1", "p2")
    val b2 = Seq((1L, Some("x"), None: Option[String]), (2L, None: Option[String], Some("z")))
      .toDF("id", "p1", "p2")
    val got2 = Dedup.snapshotDiff(a2, b2, "id", Seq("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "changed"))
  }
}
