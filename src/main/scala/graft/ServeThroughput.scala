package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/**
 * Concurrent-serve throughput series (VERDICT r14 #7): the single-query
 * serve numbers say nothing about QPS under concurrency, which is the
 * other half of the 100-TB serve story — N clients share ONE process,
 * ONE SparkContext, and ONE materialized index (lexical BM25 segments +
 * the feature-hash IVF/PQ index), exactly the deployment shape of a
 * retrieval service embedded in a Spark driver.
 *
 * Harness: per client-count N, each of N threads issues `RoundsPerClient`
 * batch serves (bm25BatchTopK over 8 queries — one index probe per batch
 * by construction — and pqTopKServed over 8 probe vectors), count()-forced.
 * Work SCALES WITH N (total serves = N·rounds), so queries/sec is the
 * honest aggregate-throughput axis: flat line = pure serialization,
 * rising = real concurrency. Jobs interleave under Spark's default FIFO
 * scheduler — stages from different threads still run concurrently when
 * slots are free; no FAIR pools needed at this fan-out.
 *
 * Index builds happen ONCE before timing (build-once/serve-many); a
 * warm-up pass per mode absorbs first-plan codegen. Output: one JSON
 * line per (mode, N) with wall seconds and queries/sec.
 */
object ServeThroughput {
  private val BatchQueries = 8
  private val RoundsPerClient = 6

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-serve-throughput")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      // UTC pinned to match Verify/SparkTestBase: the calendar serves
      // (date_trunc bucketing) must bench the SAME plan they verify
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- build-once (excluded from all timings)
    val lexIdx = SparkEntry.ensureBm25Index(spark, sfDir)
    val (fhIdx, fhKey) = SparkEntry.ensureFhIvfIndex(spark, sfDir)

    val queryTexts = Seq(
      "dup sort query zzz", "table scan hash probe", "merge join window",
      "filter predicate pushdown", "shuffle partition skew",
      "broadcast dimension join", "rollup aggregate serve",
      "tokenize count documents")
    val lexBatch: Seq[(Long, String)] =
      queryTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    graft.functions.HashFunctions.register(spark)
    graft.functions.VectorFunctions.register(spark)
    val denseBatch = queryTexts.zipWithIndex.map { case (t, i) =>
      (-(i.toLong + 1), graft.functions.HashFunctions.featureHash(t, 64).toSeq)
    }.toDF("vec_id", "vec").cache()
    denseBatch.count()

    def lexServe(): Unit = {
      val n = graft.operators.TextAnalysis
        .bm25BatchTopK(spark, lexIdx, lexBatch, k = 10).count()
      require(n > 0, "lexical serve returned nothing")
    }
    def denseServe(): Unit = {
      val n = graft.operators.Similarity.pqTopKServed(spark, fhIdx,
        denseBatch, "vec_id", "vec", k = 10, indexKey = fhKey,
        nProbe = 8).count()
      require(n > 0, "dense serve returned nothing")
    }
    // wildcard scoring family (VERDICT r15 #8): 8 distinct prefixes per
    // serve() so queries/sec normalizes on the same BatchQueries axis as
    // the other modes. Each is a full MultiTermQuery rewrite — dictionary
    // band expansion + per-variant-idf scoring — the most driver-involved
    // serve shape (one bounded collect per segment per query), which is
    // exactly why it needs its own concurrency row.
    val wildcardPrefixes =
      Seq("s", "ta", "me", "fi", "sh", "br", "ro", "to")
    def wildcardServe(): Unit =
      wildcardPrefixes.foreach { p =>
        graft.operators.TextAnalysis
          .bm25ServePrefixTopK(spark, lexIdx, p, k = 10).count()
      }

    def series(mode: String, serve: () => Unit): Unit = {
      serve() // warm-up: plans compiled, trained state cached
      // 32 matches the local[32] slot count — the saturation point
      // where queued stages, not scheduling, set the ceiling
      for (n <- Seq(1, 2, 4, 8, 32)) {
        val pool = Executors.newFixedThreadPool(n)
        val start = new CountDownLatch(1)
        val done = new CountDownLatch(n)
        val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        (1 to n).foreach { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              start.await()
              try (1 to RoundsPerClient).foreach(_ => serve())
              catch { case t: Throwable => errors.add(t) }
              finally done.countDown()
            }
          })
        }
        val t0 = System.nanoTime()
        start.countDown()
        done.await(30, TimeUnit.MINUTES)
        val wall = (System.nanoTime() - t0) / 1e9
        pool.shutdownNow()
        if (!errors.isEmpty) throw errors.peek()
        val serves = n.toLong * RoundsPerClient
        val qps = serves * BatchQueries / wall
        println(f"""{"mode":"$mode","clients":$n,"serves":$serves,""" +
          f""""batch_queries":$BatchQueries,"wall_sec":$wall%.2f,""" +
          f""""queries_per_sec":$qps%.1f}""")
      }
    }

    series("bm25_batch_served", () => lexServe())
    series("ann_pq_served", () => denseServe())
    series("bm25_prefix_served", () => wildcardServe())
    spark.stop()
  }
}
