package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (north-star operator).
 *
 * Scale design: `bruteForceTopK` broadcasts the (small) query set and
 * scans the corpus once — the right plan when |queries| ≪ |corpus|, which
 * is the batch-retrieval shape; ranking is a per-query top-k window (the
 * corpus is never globally sorted). `lshTopK` is the scale path: corpus
 * bucketed once by hyperplane signs (reusable, like an IVF coarse
 * quantizer), queries probe their bucket plus all 1-bit-flip neighbors —
 * candidates shrink by ~2^planes while recall stays high for near
 * neighbors (they differ in few sign bits).
 */
object Similarity {

  /**
   * Process-wide registry of trained quantizer state (IVF centroids, PQ
   * codebooks) keyed by a caller-supplied corpus identity plus the training
   * parameters. An ANN index at 100 TB is built ONCE and served many times;
   * re-training per query inverts that cost model (measured r6: ann_ivf /
   * ann_pq / dedup_semantic each re-trained on every invocation — 2.7–4.6×
   * regression vs the untrained path). The registry holds only the trained
   * state itself — ≤ kMax·dim longs per entry, the same bounded size class
   * the search plans broadcast — never row data, so it is immune to
   * `spark.catalog.clearCache()` and its memory is bounded by construction.
   *
   * Callers opt in by passing `indexKey = Some(<corpus identity>)` — e.g.
   * the table path — because only the caller knows when two DataFrames
   * mean the same corpus; training methods fold their own parameters into
   * the final key, so the same corpus trained with different (stride,
   * iters, m) never collides. No key → train fresh (library default).
   */
  object TrainedIndex {
    // Holder indirection: computeIfAbsent only installs the (cheap) holder,
    // so the map's bin lock is never held across the multi-second Spark
    // training job; the lazy val serializes trainers of the SAME key only.
    // A failed training evicts its holder, so every call that arrives
    // AFTER the eviction installs a fresh thunk. A thread already blocked
    // on the failed holder's lazy val re-runs that holder's original
    // thunk (Scala lazy-val retry) — acceptable: the thunk is a pure
    // training job, so the retry either succeeds or fails the same way.
    private final class Holder(train: () => IndexedSeq[IndexedSeq[Long]]) {
      lazy val value: IndexedSeq[IndexedSeq[Long]] = train()
    }
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Holder]()
    def getOrTrain(key: Option[String])(
        train: => IndexedSeq[IndexedSeq[Long]]): IndexedSeq[IndexedSeq[Long]] =
      key match {
        case Some(k) =>
          val h = cache.computeIfAbsent(k, _ => new Holder(() => train))
          try h.value
          catch { case e: Throwable => cache.remove(k, h); throw e }
        case None => train
      }
    /** Drop every cached index (process-wide reset). Entry COUNT is
      * caller-managed: distinct keys accumulate for the process lifetime
      * unless invalidated — only each entry's SIZE is bounded (≤ kMax·dim
      * longs). */
    def invalidate(): Unit = { cache.clear(); AssignedCorpus.invalidate() }
    /** Drop one trained index (exact full key, as built by ivfKey/pqKey). */
    def invalidate(key: String): Unit = {
      cache.remove(key)
      AssignedCorpus.invalidate(s"cells:$key")
    }
    /** Entries currently trained (keys only; sizes are ≤ kMax·dim longs). */
    def keys: Seq[String] = {
      import scala.jdk.CollectionConverters._
      cache.keySet().asScala.toSeq.sorted
    }
    private[operators] def put(key: String, value: IndexedSeq[IndexedSeq[Long]]): Unit = {
      val h = new Holder(() => value)
      h.value // force, so concurrent getOrTrain never runs the thunk race
      cache.put(key, h)
      ()
    }
    private[operators] def get(key: String): Option[IndexedSeq[IndexedSeq[Long]]] =
      Option(cache.get(key)).map(_.value)

    /**
     * Persist trained indexes next to the data they index. At 100 TB an
     * index is built ONCE on the cluster and served by every later job —
     * which means it must survive the training process. The format is a
     * plain parquet table (key, pos, row) — engine-neutral, inspectable,
     * and tiny (each entry is ≤ kMax·dim longs, the same bounded size
     * class the search plans broadcast.) `save` writes the selected keys
     * (default: all); `load` re-populates the registry, returning the
     * loaded keys. Keys embed corpus identity + columns + parameters
     * (ivfKey/pqKey), so a loaded entry is served under exactly the same
     * conditions it was trained for.
     */
    def save(spark: org.apache.spark.sql.SparkSession, path: String,
        onlyKeys: Option[Seq[String]] = None): Int = {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val sel = onlyKeys.map(_.toSet)
      val rows = cache.entrySet().asScala.toSeq
        .filter(e => sel.forall(_.contains(e.getKey)))
        .sortBy(_.getKey)
        .flatMap { e =>
          e.getValue.value.zipWithIndex.map { case (r, i) =>
            Row(e.getKey, i, r)
          }
        }
      val schema = StructType(Seq(
        StructField("key", StringType, nullable = false),
        StructField("pos", IntegerType, nullable = false),
        StructField("row", ArrayType(LongType, containsNull = false), nullable = false)))
      spark.createDataFrame(rows.asJava, schema)
        .repartition(1).write.mode("overwrite").parquet(path)
      rows.map(_.getString(0)).distinct.size
    }

    def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] = {
      val rows = spark.read.parquet(path)
        .select("key", "pos", "row").collect() // bounded: index state, not data
      rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (k, rs) =>
        put(k, rs.sortBy(_.getInt(1)).map(_.getSeq[Long](2).toIndexedSeq).toIndexedSeq)
        k
      }
    }
    /** Drop every index trained on one corpus identity — the call for "my
      * corpus changed" (keys embed the corpus id right after the kind tag). */
    def invalidateCorpus(corpusKey: String): Unit = {
      cache.keySet().removeIf(k =>
        k.startsWith(s"ivf:$corpusKey:") || k.startsWith(s"pq:$corpusKey:"))
      AssignedCorpus.invalidatePrefix(s"cells:ivf:$corpusKey:")
      ()
    }
    def size: Int = cache.size()
  }

  /**
   * Process-wide cache of ASSIGNED corpora — the `(neighbor_id, vec, cell)`
   * projection that every IVF serve joins against. Centroid caching alone
   * (TrainedIndex) still leaves each serve paying a full-corpus assignment
   * scan (measured r11: the suite's only >2 s query, 4.5× at 10× corpus);
   * this cache is the in-memory counterpart of the on-disk index
   * (`writeIvfIndex`): assign once, serve many.
   *
   * Cost model — deliberately different from TrainedIndex: entries hold
   * CORPUS ROW data as a persisted (MEMORY_AND_DISK) DataFrame, i.e.
   * |corpus|·(dim+2) doubles of executor storage — the price of any
   * in-memory ANN index. Entries are range-clustered by cell before
   * persisting so serves that filter to their probed cells prune cached
   * batches via min/max stats instead of scanning the whole cache.
   * `spark.catalog.clearCache()` degrades entries to lineage recompute
   * (slower, never wrong). Entries are bound to the SparkSession that
   * built them; the key contract (caller-supplied corpus identity) is the
   * same as TrainedIndex's.
   */
  object AssignedCorpus {
    private final class Holder(build: () => DataFrame) {
      lazy val value: DataFrame = build()
    }
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Holder]()
    def getOrAssign(key: String)(build: => DataFrame): DataFrame = {
      val h = cache.computeIfAbsent(key, _ => new Holder(() => build))
      val df = try h.value
        catch { case e: Throwable => cache.remove(key, h); throw e }
      // self-heal: spark.catalog.clearCache() (or memory-pressure
      // eviction) silently degrades the entry to lineage recompute;
      // re-registering the persist here makes the NEXT action re-fill
      // the cache instead of paying the assignment scan forever after
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }
    private def drop(h: Holder): Unit =
      // unpersist only an already-built entry; forcing an unbuilt holder's
      // lazy val here would run the assignment job just to throw it away
      try h.value.unpersist() catch { case _: Throwable => () }
    def invalidate(): Unit = {
      import scala.jdk.CollectionConverters._
      cache.values().asScala.foreach(drop)
      cache.clear()
    }
    def invalidate(key: String): Unit =
      Option(cache.remove(key)).foreach(drop)
    private[operators] def invalidatePrefix(prefix: String): Unit = {
      import scala.jdk.CollectionConverters._
      cache.entrySet().asScala.filter(_.getKey.startsWith(prefix)).foreach { e =>
        Option(cache.remove(e.getKey)).foreach(drop)
      }
    }
    def size: Int = cache.size()
  }

  /** Full cache key for a trained IVF quantizer. idCol/vecCol are part of
    * the key because the centroids depend on WHICH column was trained on —
    * same corpus, different embedding column must never share an entry. */
  def ivfKey(corpusKey: String, idCol: String, vecCol: String,
      stride: Int, iters: Int): String =
    s"ivf:$corpusKey:$idCol:$vecCol:$stride:$iters"

  /** Full cache key for a trained PQ codebook (see ivfKey re idCol/vecCol). */
  def pqKey(corpusKey: String, idCol: String, vecCol: String,
      m: Int, stride: Int, iters: Int): String =
    s"pq:$corpusKey:$idCol:$vecCol:$m:$stride:$iters"

  /** Exact top-k by cosine for each query vector (self-matches excluded).
    * Returns (query_id, rank, neighbor_id, cos). */
  private val D = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.DoubleType)

  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // cast float→double ONCE per row, not once per pair inside the join
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).cast(D).as("qv")))
    val c = Par.ensureParallelism(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast(D).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /**
   * IVF-style ANN top-k: a coarse quantizer partitions the corpus into
   * cells; queries probe their `nProbe` closest cells and rank exact
   * cosine within the candidates. The quantizer here is training-free and
   * deterministic — centroids are the corpus vectors whose id divides
   * `centroidStride` — which keeps the whole operator SQL-replayable
   * (k-means would converge machine-dependently). Scale shape: centroids
   * broadcast (|corpus|/stride rows), assignment is one corpus pass, the
   * candidate join touches ~nProbe/nCells of the corpus per query — the
   * same access pattern as a trained IVF index.
   */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroidStride: Int = 20, nProbe: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    // centroid table to the driver: bounded by construction (|corpus|/stride
    // here; a trained IVF's nlist in general) — the same size class any
    // coarse quantizer must broadcast
    val centRows = corpus.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).cast("long"), col(vecCol).cast(D))
      .collect().sortBy(_.getLong(0))
    val cvLit = typedlit(centRows.map(_.getSeq[Double](1)).toSeq)
    val cidLit = typedlit(centRows.map(_.getLong(0)).toSeq)
    // cell assignment = one corpus pass through the centroid-closure
    // expression; zero shuffle (vs crossJoin + row_number, which exchanged
    // every vector — 2.4s → 0.6s on the sf0.1 bench)
    val cells = Par.ensureParallelism(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).cast(D).as("cvec"),
      element_at(vec_ivf_cells(col(vecCol), cvLit, cidLit, 1), 1).as("cell"))
    val probes = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast(D).as("qvec"),
      explode(vec_ivf_cells(col(vecCol), cvLit, cidLit, nProbe)).as("cell"))
    val scored = broadcast(probes).join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /**
   * Deterministic integer Lloyd k-means in the int8-quantized space — the
   * TRAINED coarse quantizer for `ivfTopK` (closing VERDICT r5 next #3:
   * stride-sampled centroids exercise the index shape but not a trained
   * index). Every quantity is an exact int64, so training replays
   * bit-for-bit in SQL despite being a convergent iteration:
   *
   *  - init: the int8-quantized corpus vectors whose id divides `stride`,
   *    centroid index = rank by id (the stride table, now just a seed);
   *  - assign: argmin integer squared-L2, ties to the smaller index
   *    (vec_ivf_cells_l2 — one corpus pass, zero shuffle);
   *  - update: element-wise TRUNCATING mean `sum / n` (Java long division
   *    == DuckDB `//`, both toward zero); empty cells keep their centroid;
   *  - fixed `iters` iterations — no convergence test, so the iteration
   *    count (and thus the result) is engine-independent.
   *
   * Scale shape: per iteration, one corpus pass for assignment plus a
   * k·dim-row aggregate to the driver (bounded by construction — the same
   * size class as the centroid broadcast itself). Float Lloyd would
   * converge machine-dependently; integer Lloyd loses < 1 quantization
   * step per update, which SimilaritySpec shows still recovers ≥ the
   * stride baseline's recall.
   */
  /** Effective sampling stride: widens the base stride so the centroid
    * count stays ≤ `kMax` — otherwise the stride construction ties k to
    * corpus size and training cost grows as n·k = n²/stride (measured:
    * ann_pq 4× at 10× corpus before the cap). Exactly replayable in SQL:
    * `stride * greatest(1, ceil(n / (stride·kMax)))`. */
  def effectiveStride(nCorpus: Long, stride: Int, kMax: Int = 256): Long =
    stride * math.max(1L, math.ceil(nCorpus.toDouble / (stride.toDouble * kMax)).toLong)

  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int = 20, iters: Int = 3): IndexedSeq[IndexedSeq[Long]] = {
    import org.apache.spark.sql.functions.typedlit
    val q = quantizeInt8(Par.ensureParallelism(corpus), idCol, vecCol).cache()
    try {
      val strideEff = effectiveStride(q.count(), stride)
      var cents: Array[Array[Long]] = q.filter(col("id") % strideEff === 0)
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1).toArray)
      for (_ <- 0 until iters) {
        val cbLit = typedlit(cents.map(_.toIndexedSeq).toIndexedSeq)
        val cidLit = typedlit(cents.indices.map(_.toLong).toIndexedSeq)
        // k·dim rows to the driver per iteration — bounded by construction
        val sums = q.select(
            element_at(vec_ivf_cells_l2(col("q"), cbLit, cidLit, 1), 1).as("cell"),
            posexplode(col("q")).as(Seq("pos", "v")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          // truncating division: Java long `/` == DuckDB `//`
          next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2) / r.getLong(3)
        }
        cents = next
      }
      cents.map(_.toIndexedSeq).toIndexedSeq
    } finally q.unpersist()
  }

  /**
   * IVF top-k with the TRAINED integer quantizer: identical plan shape to
   * `ivfTopK` (centroid closure as foldable literals → zero-shuffle
   * assignment; candidates = nProbe cells), but cells come from
   * `trainIvfCentroids` and assignment is integer L2 in the quantized
   * space. Final scoring is still exact float cosine on the ORIGINAL
   * vectors (per-pair fixed-order fold — deterministic cross-engine).
   */
  def ivfTopKTrained(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      stride: Int = 20, iters: Int = 3, nProbe: Int = 3,
      indexKey: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val fullIvfKey = indexKey.map(ik => ivfKey(ik, idCol, vecCol, stride, iters))
    val cents = TrainedIndex.getOrTrain(fullIvfKey)(
      trainIvfCentroids(corpus, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    // quantization rides along as an extra column — no join, one pass
    def assignCorpus(): DataFrame =
      withInt8(Par.ensureParallelism(corpus), vecCol)
        .select(col(idCol).as("neighbor_id"), col(vecCol).cast(D).as("cvec"),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
    val probes = withInt8(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).cast(D).as("qvec"),
        explode(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, nProbe)).as("cell"))
    // With a corpus identity, the assignment scan runs ONCE per
    // (corpus, quantizer) and later serves read the persisted projection —
    // range-clustered by cell so the probe filter below prunes cached
    // batches by min/max stats (the in-memory analog of the materialized
    // index's partition pruning). Without a key: library default, assign
    // fresh (VERDICT r11 #1 — this scan was the suite's only >2 s query).
    val cells = fullIvfKey match {
      case Some(fk) =>
        val assigned = AssignedCorpus.getOrAssign(s"cells:$fk")(
          assignCorpus()
            .repartitionByRange(col("cell"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // probed cells to the driver: bounded by |queries|·nProbe, the
        // same size class as the probe broadcast itself
        val probed = probes.select(col("cell")).distinct()
          .collect().map(_.getLong(0))
        assigned.filter(col("cell").isin(probed: _*))
      case None => assignCorpus()
    }
    val scored = broadcast(probes).join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /**
   * Materialized IVF index: the corpus written to `path` PARTITIONED BY
   * its coarse-quantizer cell, with the trained centroids persisted
   * alongside (under `_centroids`, ignored by parquet readers). This is
   * the missing half of IVF economics at 100 TB: `ivfTopKTrained` caches
   * the centroids but still pays a full-corpus assignment scan per
   * query, which the sf1 stress showed growing ~n·nCells (5.8 s at 20k
   * vectors). With assignments in the directory layout, serving reads
   * ONLY the probed cells — the posting-list access pattern of a real
   * IVF index — and the scan cost scales with nProbe/nCells of the
   * corpus, not the corpus.
   *
   * `indexKey` is required: an on-disk index IS a corpus identity.
   *
   * Zero-downtime rebuilds: publish into a Versioned root —
   * `Versioned.publish(spark, root)(dir => writeIvfIndex(corpus, …, dir, …))`
   * and serve `Versioned.resolve(spark, root)`. The old version stays
   * fully served until the pointer swap; a crashed rebuild strands only
   * an orphan version dir (SimilaritySpec "versioned index" pins this).
   */
  /** Cluster an assigned frame so each write task holds whole cells:
    * without it every upstream task emits a file per cell it touches —
    * tasks × cells files (measured 7,911 files / 250 cells on a 500k-row
    * build), and every serve then pays ~nProbe·32 file opens plus a
    * driver stat of the same list (VERDICT r14 #7: the concurrent-serve
    * collapse was exactly this). One hash shuffle on the cell id at
    * BUILD/maintenance time (build-once economics) yields one file per
    * cell per write — the posting-list layout every IVF engine uses. */
  private def clusterByCell(df: DataFrame): DataFrame =
    df.repartition(col("cell"))

  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, indexKey: String,
      stride: Int = 20, iters: Int = 3, pqM: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions.typedlit
    val spark = corpus.sparkSession
    val key = ivfKey(indexKey, idCol, vecCol, stride, iters)
    val cents = TrainedIndex.getOrTrain(Some(key))(
      trainIvfCentroids(corpus, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    val base = withInt8(Par.ensureParallelism(corpus), vecCol)
    // pqM: ALSO store each row's m int8-subspace PQ codes in the layout —
    // the serve-time ADC (pqTopKServed) then reads codes from the pruned
    // cells and never re-encodes the corpus (VERDICT r8 next #1: pqTopK
    // re-encoded per query run, the economics that cost ann_ivf 4.5× at
    // sf1 before ITS materialized index). One index dir serves both
    // modes: exact-cosine (vecCol) and ADC (codes).
    val (assigned, keys) = pqM match {
      case Some(m) =>
        val pk = pqKey(indexKey, idCol, vecCol, m, stride, iters)
        val cb = TrainedIndex.getOrTrain(Some(pk))(
          trainPqCodebook(corpus, idCol, vecCol, m, stride, iters))
        (base.select(col(idCol), col(vecCol),
          vec_pq_encode(col("__q"), typedlit(cb), m).as("codes"),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell")),
          Seq(key, pk))
      case None =>
        (base.select(col(idCol), col(vecCol),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell")),
          Seq(key))
    }
    clusterByCell(assigned).write.mode("overwrite").partitionBy("cell").parquet(path)
    TrainedIndex.save(spark, s"$path/_centroids", onlyKeys = Some(keys))
    writeCellMap(spark, path, dataSchema = Some(assigned.schema))
    // completeness marker LAST: parquet's own _SUCCESS appears before the
    // centroids exist, so a crash in between would otherwise leave a
    // torn index that looks servable — gate readers on THIS marker
    val ready = new org.apache.hadoop.fs.Path(s"$path/$ReadyMarker")
    ready.getFileSystem(spark.sessionState.newHadoopConf()).create(ready, true).close()
  }

  /** Name of the index's cell→files manifest. One small object listing
    * every data file per cell, rewritten by build and append. Serves read
    * it instead of running partition discovery over every `cell=` dir —
    * a fresh-session serve measured ~0.75 s of pure directory listing at
    * 256 cells locally, and object-store LIST calls at real scale. For
    * APPEND it is also the atomicity point: the appended files become
    * visible to manifest-reading serves only when the single-object
    * manifest write lands, so a crash mid-append leaves the previous
    * index view servable (single maintenance writer, like the rest of
    * the sink path). Serves fall back to directory discovery when the
    * manifest is absent (pre-manifest indexes stay readable). */
  val CellMapFile: String = "_cellmap"

  /** Header line prefix carrying the index's full Spark schema (data
    * columns + `cell` partition column) as DataType JSON. Serves read it to
    * skip parquet footer inference — the schema-inference pass was a whole
    * Spark job (~0.6 s fixed overhead per serve, any scale). The line has
    * no tab, so pre-schema readers' `contains('\t')` filter skips it —
    * old manifests and old readers interoperate both ways. */
  val CellMapSchemaPrefix: String = "#schema="

  /** Header line naming the index's LIVE trained-state directory
    * (relative to the index root). Absent = `_centroids`, the build-time
    * default — every pre-retrain index reads unchanged. Retraining swaps
    * centroids and cell files in ONE manifest commit by writing the new
    * state to a fresh generation dir and naming it here: a serve that
    * reads the manifest gets a CONSISTENT (centroids, files) pair on
    * either side of the swap, never new files probed with old centroids
    * (the silent-recall-corruption failure retraining would otherwise
    * open). The generation name also keys the process-wide centroid
    * cache, so a long-lived serve process self-heals after a retrain by
    * another process (see servedState). */
  val CellMapCentroidsPrefix: String = "#centroids="

  /** Default trained-state dir under the index root. */
  val DefaultCentroidsDir: String = "_centroids"

  /** Header line carrying the highest exactly-once-applied append batch
    * id (see [[appendToIvfIndexExactlyOnce]]). Riding the manifest makes
    * the fence atomic with the append's commit point for free: a crash
    * anywhere before the manifest write leaves BOTH the old file list
    * and the old fence, so the redelivered batch applies cleanly; after
    * it, both advance together and the redelivery skips. No tab → old
    * readers' `contains('\t')` filter skips it, like the other headers. */
  val CellMapBatchPrefix: String = "#last_batch="

  private def manifestLastBatchOf(txt: String): Option[Long] =
    txt.split('\n').find(_.startsWith(CellMapBatchPrefix))
      .flatMap(l => scala.util.Try(
        l.substring(CellMapBatchPrefix.length).trim.toLong).toOption)

  /** Highest exactly-once batch id the live manifest has committed. */
  def lastAppendBatchId(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[Long] =
    readManifest(spark, indexPath).flatMap(manifestLastBatchOf)

  private def manifestCentroidsDirOf(txt: String): Option[String] =
    txt.split('\n').find(_.startsWith(CellMapCentroidsPrefix))
      .map(_.substring(CellMapCentroidsPrefix.length).trim).filter(_.nonEmpty)

  /** The index's live trained-state dir (relative name). */
  private[graft] def centroidsDirOf(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): String =
    readManifest(spark, indexPath).flatMap(manifestCentroidsDirOf)
      .getOrElse(DefaultCentroidsDir)

  /** Resolve trained state for a serve/append against `indexPath`:
    * registry hit under the GENERATION-aware key, else one load from the
    * index's live trained-state dir. The cache key embeds the centroids
    * generation dir, so a retrain (which changes the dir name in the
    * manifest) is visible to every process on its next serve — a plain
    * `key`-only cache would keep serving pre-retrain centroids against
    * post-retrain cell files forever. */
  private[graft] def servedState(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, key: String): IndexedSeq[IndexedSeq[Long]] = {
    val cdir = centroidsDirOf(spark, indexPath)
    val genKey = s"$key@$indexPath/$cdir"
    TrainedIndex.get(genKey).getOrElse {
      TrainedIndex.load(spark, s"$indexPath/$cdir")
      val v = TrainedIndex.get(key).getOrElse(throw new IllegalStateException(
        s"index at $indexPath does not carry trained state for $key"))
      TrainedIndex.put(genKey, v)
      v
    }
  }

  // private[graft]: IvfAppendCrashSpec re-commits the manifest as the
  // post-crash recovery step (publishes stranded-but-job-committed files)
  private[graft] def writeCellMap(spark: org.apache.spark.sql.SparkSession,
      path: String,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None,
      centroidsDir: Option[String] = None,
      lastBatchId: Option[Long] = None): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val liveTxt = graft.sinks.Versioned
      .readSmallText(spark, new Path(root, CellMapFile))
    // schema header: from the writer when it has the frame in hand
    // (build/append), else preserved from the live manifest (compact
    // rewrites the file list but must not drop the schema)
    val schemaLine: Option[String] = dataSchema.map(s => CellMapSchemaPrefix + s.json)
      .orElse(liveTxt.flatMap(_.split('\n').find(_.startsWith(CellMapSchemaPrefix))))
    // centroids header: from the writer (retrain's commit), else
    // preserved — an append/compact after a retrain must not silently
    // point serves back at the GC'd default dir
    val centroidsLine: Option[String] = centroidsDir
      .map(CellMapCentroidsPrefix + _)
      .orElse(liveTxt.flatMap(_.split('\n').find(_.startsWith(CellMapCentroidsPrefix))))
    // batch-fence header: from the exactly-once append, else preserved —
    // a compact/retrain after a fenced append must not reset the fence
    // (a later redelivery would then double-apply)
    val batchLine: Option[String] = lastBatchId
      .map(CellMapBatchPrefix + _)
      .orElse(liveTxt.flatMap(_.split('\n').find(_.startsWith(CellMapBatchPrefix))))
    val sb = new StringBuilder
    schemaLine.foreach(l => sb.append(l).append('\n'))
    centroidsLine.foreach(l => sb.append(l).append('\n'))
    batchLine.foreach(l => sb.append(l).append('\n'))
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("cell=")).foreach { d =>
      val cell = d.getPath.getName.substring("cell=".length)
      fs.listStatus(d.getPath).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
          sb.append(cell).append('\t')
            .append(d.getPath.getName).append('/').append(n).append('\n')
      }
    }
    // the manifest is the append's COMMIT point, so its own write must be
    // atomic — a plain in-place create(overwrite) would leave a truncated
    // manifest on a crash mid-write, bricking every subsequent serve. The
    // write routes through the SAME committed primitive as the versioned
    // layout's pointer swap (Versioned.atomicOverwrite: temp object +
    // rename-with-overwrite on HDFS/POSIX, single-object PUT on stores
    // without one).
    graft.sinks.Versioned.atomicOverwrite(spark, new Path(root, CellMapFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Scan of the probed cells of a materialized index: via the manifest
    * when present (explicit file list + basePath, so the `cell` partition
    * column still materializes and NO per-cell-dir listing happens), else
    * via partition discovery + pruning filter. Both return only rows of
    * `probeCells`. */
  /** Parse the `#schema=` header of a manifest's text, if present. */
  private def manifestSchemaOf(txt: String)
      : Option[org.apache.spark.sql.types.StructType] =
    txt.split('\n').find(_.startsWith(CellMapSchemaPrefix)).flatMap { l =>
      scala.util.Try(org.apache.spark.sql.types.DataType
        .fromJson(l.substring(CellMapSchemaPrefix.length))
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
    }

  /** Read the live manifest's text, None when the index predates it. */
  private def readManifest(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[String] =
    graft.sinks.Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(indexPath, CellMapFile))

  /** Guards the monotonic threshold raise in readProbedCells (raises
    * only — never restores, so no set/restore window exists to
    * interleave; the lock just keeps the read-max-set step atomic). */
  private val discoveryConfLock = new Object

  /** Cap on the monotonic threshold raise (ADVICE r15): the raise is
    * session-global and never restored, so one pathological wide probe
    * must not permanently downgrade UNRELATED multi-path reads from a
    * distributed listing job to a sequential driver stat. Under the cap
    * the driver stat is cheap by construction (a compacted serve's list
    * is nProbe·|queries| committed cell files, well inside it); a read
    * past the cap keeps Spark's distributed listing — correct at that
    * scale anyway. */
  private[graft] val DiscoveryThresholdCap = 8192

  private def readProbedCells(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, probeCells: Array[Long]): DataFrame = {
    val fromManifest: Option[DataFrame] = readManifest(spark, indexPath).flatMap { txt =>
      val lines = txt.split('\n')
      // schema header (CellMapSchemaPrefix): with it the read skips parquet
      // footer inference — one whole Spark job of fixed serve overhead gone
      val manifestSchema = manifestSchemaOf(txt)
      // A serve's file list is bounded (nProbe cells' committed files), so
      // stat it on the driver: a distributed listing JOB (the >threshold
      // default for explicit multi-path reads) costs more in scheduling
      // than statting the bounded list ever does. Sprawl past that bound is
      // what compactIvfIndex is for.
      def readFiles(paths: Seq[String]): DataFrame = {
        val rd0 = spark.read.option("basePath", indexPath)
        val rd = manifestSchema.map(rd0.schema).getOrElse(rd0)
        val tKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
        // common case first: the list already fits under the session
        // threshold — no conf mutation at all, no lock contention
        if (paths.length <= spark.conf.get(tKey).toInt) rd.parquet(paths: _*)
        else {
          // MONOTONIC raise, never restored (VERDICT r14 #7): the old
          // set/RESTORE pair held this lock across the whole listing +
          // relation build, serializing every concurrent serve whose
          // file list crossed the threshold — the throughput series
          // measured the dense serve COLLAPSING 13.5 → 5.1 q/s from 2
          // to 8 clients on exactly this window. Raising without
          // restore shrinks the critical section to one conf write
          // (listing runs unlocked), and concurrent raises commute.
          // The session-wide effect — later >threshold multi-path reads
          // use a driver stat instead of a distributed listing job — is
          // the behavior every serve here wants anyway; a serve's list
          // is bounded by nProbe·|queries| committed cell files.
          // capped (ADVICE r15): bound the permanent session-global
          // effect — see DiscoveryThresholdCap
          val capped = math.min(paths.length, DiscoveryThresholdCap)
          discoveryConfLock.synchronized {
            val prev = spark.conf.get(tKey).toInt
            if (capped > prev) spark.conf.set(tKey, capped.toString)
          }
          rd.parquet(paths: _*)
        }
      }
      val want = probeCells.toSet
      // lines are `cell\trelpath`; anything malformed is skipped rather
      // than crashing the serve (the atomic manifest write makes torn
      // lines unreachable in practice, but a serve must not brick on one)
      val all = lines.iterator.filter(l => l.nonEmpty && l.contains('\t'))
        .map { line =>
          val i = line.indexOf('\t')
          (line.substring(0, i).toLong, s"$indexPath/${line.substring(i + 1)}")
        }.toSeq
      val files = all.collect { case (cell, f) if want(cell) => f }
      if (files.nonEmpty) Some(readFiles(files))
      else if (all.nonEmpty)
        // the manifest is authoritative: probed cells with no committed
        // files are EMPTY — falling back to directory discovery here
        // would surface files an append wrote but never committed (the
        // exact torn view the manifest gate exists to hide). Derive the
        // schema from any committed file and return zero rows.
        Some(readFiles(Seq(all.head._2)).filter(lit(false)))
      else None // degenerate empty index: nothing committed anywhere
    }
    fromManifest.getOrElse(
      spark.read.parquet(indexPath)
        .filter(col("cell").isin(probeCells.map(Long.box): _*)))
  }

  /**
   * Incremental index append — the ingest-side twin of
   * `dedup_incremental` (VERDICT r8 next #2). The batch is assigned to
   * the EXISTING centroids (loaded from the registry or the index's own
   * `_centroids`; never retrained) and appended as new cell-partitioned
   * files — no rebuild, so ingest cost is one batch pass instead of the
   * full-corpus training + rewrite (22.6 s at sf1). When the index was
   * built with `pqM`, pass the same value so appended rows carry codes.
   *
   * Crash safety: the append goes through Spark's file committer (a
   * failed job leaves only `_temporary` debris, which readers ignore),
   * and the index's centroids/marker are untouched — an interrupted
   * append leaves the PREVIOUS index fully servable.
   *
   * Semantics note: append-then-serve is EXACTLY rebuild-then-serve with
   * the same centroids (IvfAppendSpec pins it). Centroid QUALITY drifts
   * as the appended distribution diverges from the training corpus —
   * recall, not correctness; rebuild on a drift budget, like any IVF
   * deployment.
   */
  def appendToIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
      path: String, indexKey: String,
      stride: Int = 20, iters: Int = 3, pqM: Option[Int] = None): Unit =
    graft.sinks.Lease.withLease(batch.sparkSession, path) {
      appendToIvfIndexHooked(batch, idCol, vecCol, path, indexKey,
        stride, iters, pqM, () => ())
    }

  /**
   * Exactly-once append for streaming ingest (the [[graft.sinks.MergeTable.mergeExactlyOnce]]
   * design applied to the index): a redelivered foreachBatch micro-batch
   * (id ≤ the manifest's `#last_batch=` fence) is skipped without
   * touching disk; otherwise stranded files from a crashed prior attempt
   * are swept ([[vacuumUncommitted]] — the next manifest write would
   * publish them ALONGSIDE the retry's files, landing the batch twice)
   * and the append commits data + fence in the one atomic manifest
   * write. Requires monotonically increasing ids (Structured Streaming's
   * batchId is); single maintenance writer, like every append. Returns
   * true iff applied.
   */
  def appendToIvfIndexExactlyOnce(batch: DataFrame, idCol: String,
      vecCol: String, path: String, indexKey: String, batchId: Long,
      stride: Int = 20, iters: Int = 3, pqM: Option[Int] = None): Boolean =
    graft.sinks.Lease.withLease(batch.sparkSession, path) {
      if (lastAppendBatchId(batch.sparkSession, path)
          .exists(_ >= batchId)) false
      else {
        vacuumUncommitted(batch.sparkSession, path)
        appendToIvfIndexHooked(batch, idCol, vecCol, path, indexKey,
          stride, iters, pqM, () => (), batchId = Some(batchId))
        true
      }
    }

  /** The append with a test seam at its one crash window: `beforeCommit`
    * runs after the data-file job commits and before the `_cellmap`
    * manifest write. IvfAppendCrashSpec throws there to prove the
    * documented property — an append killed in that window leaves the
    * PREVIOUS index view fully served (the manifest is the commit
    * point), and a later manifest commit publishes the stranded files
    * exactly as a completed append would have. */
  private[graft] def appendToIvfIndexHooked(batch: DataFrame, idCol: String,
      vecCol: String, path: String, indexKey: String,
      stride: Int, iters: Int, pqM: Option[Int],
      beforeCommit: () => Unit, batchId: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions.typedlit
    val spark = batch.sparkSession
    requireIndexReady(spark, path)
    // the append's pqM must match how the index was BUILT: appending
    // code-less files to a PQ index would rank null ADC distances first
    // in every probed cell (nulls-first ascending), silently corrupting
    // top-k; the reverse mixes schemas. The stored layout is the truth —
    // read it from the manifest's schema header (one small GET) when
    // present; a full spark.read.parquet here would re-pay the footer
    // inference + listing jobs the serve path just shed.
    val hasCodes = readManifest(spark, path).flatMap(manifestSchemaOf)
      .map(_.fieldNames.contains("codes"))
      .getOrElse(spark.read.parquet(path).schema.fieldNames.contains("codes"))
    require(hasCodes == pqM.isDefined,
      if (hasCodes)
        s"index at $path stores PQ codes — pass the pqM it was built with"
      else
        s"index at $path has no codes column — appending with pqM would mix schemas")
    def served(key: String): IndexedSeq[IndexedSeq[Long]] =
      servedState(spark, path, key)
    val cents = served(ivfKey(indexKey, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    val base = withInt8(Par.ensureParallelism(batch), vecCol)
    val assigned = pqM match {
      case Some(m) =>
        val cb = served(pqKey(indexKey, idCol, vecCol, m, stride, iters))
        base.select(col(idCol), col(vecCol),
          vec_pq_encode(col("__q"), typedlit(cb), m).as("codes"),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
      case None =>
        base.select(col(idCol), col(vecCol),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
    }
    clusterByCell(assigned).write.mode("append").partitionBy("cell").parquet(path)
    beforeCommit()
    // manifest LAST: the appended files become visible to manifest-reading
    // serves only on this single-object write (see CellMapFile)
    writeCellMap(spark, path, dataSchema = Some(assigned.schema),
      lastBatchId = batchId)
  }

  /**
   * Recovery sweep for a crashed append: delete index data files the live
   * manifest does not name. An append killed between its data-job commit
   * and the manifest write strands job-committed files that serves ignore
   * — but the NEXT successful writeCellMap (any append or compaction)
   * lists directories and would PUBLISH them, so a retried append lands
   * its batch twice. Run this before retrying a failed append (or let a
   * scheduled janitor run it; single maintenance writer, like append —
   * never concurrently with one). A pre-manifest index is left untouched:
   * with no manifest there is no committed/uncommitted distinction, and
   * every file on disk is live to discovery serves. Returns the deleted
   * paths. IvfAppendCrashSpec proves crash → vacuum → retry == one clean
   * append.
   */
  def vacuumUncommitted(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = graft.sinks.Lease.withLease(spark, path) {
    import org.apache.hadoop.fs.Path
    val manifest = readManifest(spark, path)
    if (manifest.isEmpty) Seq.empty
    else vacuumUncommittedLeased(spark, path, manifest.get)
  }

  private def vacuumUncommittedLeased(
      spark: org.apache.spark.sql.SparkSession,
      path: String, manifestTxt: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val committed = manifestTxt.split('\n').iterator
      .filter(l => l.nonEmpty && l.contains('\t'))
      .map(l => l.substring(l.indexOf('\t') + 1)).toSet
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap { d =>
        fs.listStatus(d.getPath).filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            !committed(s"${d.getPath.getName}/$n")
        }.map(_.getPath)
      }
      .flatMap { p =>
        // report only deletes the FS confirmed: a failed delete
        // (permissions, concurrent removal) left the stranded file in
        // place, and a retried append after a partial sweep would
        // double-publish it — the caller must know the sweep was short
        if (fs.delete(p, false)) Some(p.toString)
        else throw new java.io.IOException(
          s"vacuumUncommitted: could not delete stranded file $p — " +
            "sweep incomplete, do not retry the append yet")
      }
      .toIndexedSeq
  }

  // ──────────────────────── row-level deletes ─────────────────────────

  /** Name of the index's tombstone set: ids deleted since the last purge.
    * One small object — a `#idcol=` header naming the id column, then one
    * decimal id per line — committed through the SAME atomic primitive as
    * the cell manifest, so a delete is a single-object swap and a crashed
    * delete leaves the previous tombstone set fully served. Serves
    * subtract the set with a broadcast anti-join (deletes never rewrite
    * data files — that is `purgeTombstones`' job), which is the
    * deletion-vector cost model: delete cost is O(ids), serve cost gains
    * one bounded broadcast, and the physical rewrite is deferred to
    * maintenance. The set is capped at `MaxTombstones` between purges —
    * past that the broadcast stops being "bounded" and the index OWES a
    * purge, so the delete fails loudly instead of degrading every serve. */
  val TombstoneFile: String = "_tombstones"

  private val TombstoneIdColPrefix = "#idcol="

  /** Tombstone-set size cap between purges (1M ids ≈ 8 MB broadcast). */
  val MaxTombstones: Int = 1000000

  /** The live tombstone set: (id column name, sorted ids). None when the
    * index has none (never deleted from, or purged clean). */
  private[graft] def readTombstones(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[(String, Array[Long])] =
    graft.sinks.Versioned.readSmallText(spark,
      new org.apache.hadoop.fs.Path(indexPath, TombstoneFile)).map { txt =>
      val lines = txt.split('\n')
      val idCol = lines.find(_.startsWith(TombstoneIdColPrefix))
        .map(_.substring(TombstoneIdColPrefix.length))
        .getOrElse(throw new IllegalStateException(
          s"tombstone set at $indexPath/$TombstoneFile has no " +
            s"$TombstoneIdColPrefix header"))
      val ids = lines.iterator
        .filter(l => l.nonEmpty && !l.startsWith("#")).map(_.toLong).toArray
      (idCol, ids)
    }

  /**
   * Delete rows from a materialized index by id — the missing verb of
   * the build/serve/append/compact lifecycle. No data file is touched:
   * the ids land in the `_tombstones` object (merged with any existing
   * set, committed atomically), every serve subtracts them from its
   * candidates, and the next `purgeTombstones` removes the rows
   * physically. Idempotent: deleting an id twice, or an id the corpus
   * never had, is a no-op in the merged set.
   *
   * Scale shape: O(|merged set|) driver work and one single-object
   * commit — no corpus scan, no shuffle, regardless of index size. The
   * cap (`MaxTombstones`) bounds what serves broadcast; a real
   * deployment purges on a cadence long before it.
   *
   * Caveat (standard for id-level tombstones): re-APPENDING a deleted id
   * resurfaces nothing until the set is purged — the tombstone masks the
   * new row too, and a later purge removes EVERY row of the id, the
   * re-appended copy included (IvfDeleteSpec pins both). Purge before
   * re-ingesting previously deleted ids.
   *
   * Returns the merged tombstone-set size.
   */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, ids: Iterable[Long]): Int =
      graft.sinks.Lease.withLease(spark, path) {
    requireIndexReady(spark, path)
    mergeTombstones(spark, path, idCol, ids)
  }

  /** Replace the tombstone set verbatim (delete the control object when
    * `ids` is empty) — the repair verb for stale residue: a compact that
    * crashed in its post-swap/pre-clear window leaves tombstones for ids
    * no longer in the base, which would silently mask a later re-append
    * of those ids. Caller holds the index lease and has PROVEN the
    * dropped ids are absent from the live view. */
  private[graft] def replaceTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, ids: Iterable[Long]): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(path, TombstoneFile)
    if (ids.isEmpty) {
      val fs = tombPath.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(tombPath, false)
    } else {
      val sb = new StringBuilder(TombstoneIdColPrefix).append(idCol)
        .append('\n')
      ids.toArray.sorted.foreach(id => sb.append(id).append('\n'))
      graft.sinks.Versioned.atomicOverwrite(spark, tombPath,
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The shared tombstone-merge step ([[deleteFromIvfIndex]] and the
    * HNSW delete): merge `ids` into the existing set, enforce the id
    * column and the [[MaxTombstones]] cap, commit the one control
    * object atomically. Caller holds the index lease. Returns the
    * merged size. */
  private[graft] def mergeTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, ids: Iterable[Long]): Int = {
    val existing = readTombstones(spark, path)
    existing.foreach { case (prev, _) =>
      require(prev == idCol,
        s"index at $path already carries tombstones keyed by '$prev' — " +
          s"refusing to mix in ids keyed by '$idCol'")
    }
    val merged: Array[Long] =
      (existing.map(_._2.toSet).getOrElse(Set.empty[Long]) ++ ids)
        .toArray.sorted
    require(merged.length <= MaxTombstones,
      s"tombstone set at $path would reach ${merged.length} ids " +
        s"(cap $MaxTombstones) — run purgeTombstones before deleting more")
    val sb = new StringBuilder(TombstoneIdColPrefix).append(idCol).append('\n')
    merged.foreach(id => sb.append(id).append('\n'))
    graft.sinks.Versioned.atomicOverwrite(spark,
      new org.apache.hadoop.fs.Path(path, TombstoneFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    merged.length
  }

  /** Subtract the index's live tombstones from a serve's candidate frame
    * (columns include `neighbor_id`). A broadcast LEFT ANTI join, not an
    * IN-list literal: the set can be up to `MaxTombstones` ids, and a
    * million-entry `isin` would dominate analysis/codegen while the
    * anti-join stays one bounded broadcast hash join. No tombstones → the
    * frame passes through untouched (the common case pays nothing). */
  private def withoutTombstones(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, cand: DataFrame): DataFrame =
    readTombstones(spark, indexPath) match {
      case Some((_, dead)) if dead.nonEmpty =>
        val deadDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            dead.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__dead_id",
              org.apache.spark.sql.types.LongType))))
        cand.join(broadcast(deadDf),
          cand("neighbor_id").cast("long") === col("__dead_id"), "left_anti")
      case _ => cand
    }

  /**
   * Physically remove tombstoned rows and clear the tombstone set. The
   * commit discipline is the append's, inverted: rewrite every committed
   * file minus the dead rows into NEW uniquely-named files (Spark's file
   * committer — a crashed job leaves only ignorable debris), then
   * atomically swap the manifest to name ONLY the new files, then GC the
   * old files and the tombstone object. A crash before the manifest swap
   * leaves the previous index view fully served (the new files are
   * uncommitted; `vacuumUncommitted` sweeps them before a retry — this
   * function runs that sweep itself on entry); a crash after the swap
   * leaves the purged view served and only garbage to collect. A crash
   * between the swap and the tombstone delete is harmless: serves
   * subtract ids the purged files no longer contain.
   *
   * Cost: one full rewrite of the committed data — bytes ∝ corpus, which
   * is what a physical purge costs anywhere; tombstones exist precisely
   * to amortize it across many deletes. (A finer purge would consult
   * per-file id min/max stats to rewrite only files that can contain
   * dead ids — the manifest has room for stat columns; not needed until
   * a workload shows clustered deletes.) Single maintenance writer, like
   * append/compact. Returns the number of tombstoned ids cleared.
   */
  def purgeTombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
      graft.sinks.Lease.withLeaseHeartbeat(spark, path) {
    purgeTombstonesHooked(spark, path, () => ())
  }

  /** The purge with a test seam at its one crash window: `beforeCommit`
    * runs after the rewrite job commits and before the manifest swap —
    * the same seam shape as `appendToIvfIndexHooked`. */
  private[graft] def purgeTombstonesHooked(
      spark: org.apache.spark.sql.SparkSession, path: String,
      beforeCommit: () => Unit): Int = {
    import org.apache.hadoop.fs.Path
    requireIndexReady(spark, path)
    val tomb = readTombstones(spark, path)
    if (tomb.forall(_._2.isEmpty)) return 0
    val (idCol, dead) = tomb.get
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // the manifest is this purge's commit point — a pre-manifest index
    // gets one first (its full on-disk file set, which for such an index
    // IS the committed set)
    if (readManifest(spark, path).isEmpty) writeCellMap(spark, path)
    // start from committed-only disk state: stranded files from a crashed
    // append (or a crashed previous purge) must not ride into the
    // post-purge manifest
    vacuumUncommitted(spark, path)
    val txt = readManifest(spark, path).get
    val schema = manifestSchemaOf(txt)
    val committed: Seq[String] = txt.split('\n').iterator
      .filter(l => l.nonEmpty && l.contains('\t'))
      .map(l => l.substring(l.indexOf('\t') + 1)).toSeq
    val tombPath = new Path(root, TombstoneFile)
    if (committed.isEmpty) { fs.delete(tombPath, false); return dead.length }
    val rd0 = spark.read.option("basePath", path)
    val rd = schema.map(rd0.schema).getOrElse(rd0)
    val df = rd.parquet(committed.map(f => s"$path/$f"): _*)
    val deadDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dead.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__dead_id",
          org.apache.spark.sql.types.LongType))))
    val keep = df.join(broadcast(deadDf),
      df(idCol).cast("long") === col("__dead_id"), "left_anti")
    clusterByCell(keep).write.mode("append").partitionBy("cell").parquet(path)
    beforeCommit()
    // manifest swap: name ONLY the files this rewrite produced — on-disk
    // files minus the pre-purge committed set (disk == committed ∪ new,
    // by the vacuum above)
    val old = committed.toSet
    val sb = new StringBuilder
    schema.foreach(s => sb.append(CellMapSchemaPrefix).append(s.json).append('\n'))
    // preserve the live trained-state generation (a purge rewrites rows,
    // never centroids — pointing serves back at a GC'd default dir would
    // brick them after any retrain)
    manifestCentroidsDirOf(txt).foreach(d =>
      sb.append(CellMapCentroidsPrefix).append(d).append('\n'))
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("cell=")).foreach { d =>
      val cell = d.getPath.getName.substring("cell=".length)
      fs.listStatus(d.getPath).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            !old(s"${d.getPath.getName}/$n"))
          sb.append(cell).append('\t')
            .append(d.getPath.getName).append('/').append(n).append('\n')
      }
    }
    graft.sinks.Versioned.atomicOverwrite(spark, new Path(root, CellMapFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // GC: the old files are now uncommitted garbage. Best-effort — a
    // failed delete leaves debris the next vacuumUncommitted sweeps, it
    // cannot resurface rows (serves read only the manifest's files).
    old.foreach(f => fs.delete(new Path(root, f), false))
    fs.delete(tombPath, false)
    dead.length
  }

  /**
   * Retrain a materialized index IN PLACE on its current live contents
   * (VERDICT r13 next #3). `appendToIvfIndex` assigns batches to the
   * centroids the index was BUILT with — under distribution drift the
   * new mass crams into whichever old cells are nearest, cells
   * unbalance, and recall decays (probing nProbe cells misses more of
   * the true neighborhood every batch). This is the index-quality twin
   * of `MergeTable.rebucket`: re-derive the layout from current data
   * under the same single-object commit discipline, no service window.
   *
   * Protocol (the purge's manifest-swap pattern, plus a trained-state
   * generation): train fresh centroids (and PQ codebook, when the index
   * stores codes) on the LIVE committed rows, re-assign and rewrite
   * every row as new cell files, persist the new trained state to a
   * fresh `_centroids-<gen>` dir, then COMMIT by swapping the manifest
   * to name ONLY the new files and the new generation (one atomic
   * single-object write). A serve reads (centroids, files) from one
   * manifest view, so it can never probe new files with old centroids
   * or vice versa; a crash anywhere before the swap leaves the old
   * index fully served and only uncommitted debris (IvfRetrainSpec
   * crash-injects the window). Old files and the old generation dir are
   * GC'd best-effort after the swap.
   *
   * Tombstones are carried, not resolved: `_tombstones` filtering is
   * id-based and cell-independent, so the rewrite keeps dead rows
   * masked exactly as before (run `purgeTombstones` first to shed them
   * physically). Single maintenance writer, like append/purge/compact.
   */
  def retrainIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, indexKey: String,
      stride: Int = 20, iters: Int = 3, pqM: Option[Int] = None): Unit =
    graft.sinks.Lease.withLeaseHeartbeat(spark, path) {
      retrainIvfIndexHooked(spark, path, idCol, vecCol, indexKey,
        stride, iters, pqM, () => ())
    }

  /** The retrain with a test seam at its one crash window: `beforeCommit`
    * runs after the rewrite job and the new trained-state dir land,
    * before the manifest swap — the same seam shape as append/purge. */
  private[graft] def retrainIvfIndexHooked(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, vecCol: String, indexKey: String,
      stride: Int, iters: Int, pqM: Option[Int],
      beforeCommit: () => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.typedlit
    requireIndexReady(spark, path)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // schema parity with the stored layout, exactly append's contract
    val hasCodes = readManifest(spark, path).flatMap(manifestSchemaOf)
      .map(_.fieldNames.contains("codes"))
      .getOrElse(spark.read.parquet(path).schema.fieldNames.contains("codes"))
    require(hasCodes == pqM.isDefined,
      if (hasCodes)
        s"index at $path stores PQ codes — pass the pqM it was built with"
      else
        s"index at $path has no codes column — retraining with pqM would mix schemas")
    // start from committed-only disk state (pre-manifest indexes get one)
    if (readManifest(spark, path).isEmpty) writeCellMap(spark, path)
    vacuumUncommitted(spark, path)
    val txt = readManifest(spark, path).get
    val schema = manifestSchemaOf(txt)
    val liveGen = manifestCentroidsDirOf(txt).getOrElse(DefaultCentroidsDir)
    // GC generations no manifest names (debris of crashed retrains) —
    // the _centroids-* analog of vacuumUncommitted's cell-file sweep
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$DefaultCentroidsDir-") &&
        s.getPath.getName != liveGen)
      .foreach(s => fs.delete(s.getPath, true))
    val committed: Seq[String] = txt.split('\n').iterator
      .filter(l => l.nonEmpty && l.contains('\t'))
      .map(l => l.substring(l.indexOf('\t') + 1)).toSeq
    require(committed.nonEmpty, s"cannot retrain an empty index at $path")
    val rd0 = spark.read.option("basePath", path)
    val rd = schema.map(rd0.schema).getOrElse(rd0)
    val corpus = rd.parquet(committed.map(f => s"$path/$f"): _*)
      .select(col(idCol), col(vecCol))
    // fresh training on the live corpus — never the registry: stale
    // cached state is exactly what a retrain exists to replace
    val key = ivfKey(indexKey, idCol, vecCol, stride, iters)
    val cents = trainIvfCentroids(corpus, idCol, vecCol, stride, iters)
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    val base = withInt8(Par.ensureParallelism(corpus), vecCol)
    val (assigned, newState) = pqM match {
      case Some(m) =>
        val pk = pqKey(indexKey, idCol, vecCol, m, stride, iters)
        val cb = trainPqCodebook(corpus, idCol, vecCol, m, stride, iters)
        (base.select(col(idCol), col(vecCol),
          vec_pq_encode(col("__q"), typedlit(cb), m).as("codes"),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell")),
          Seq(key -> cents, pk -> cb))
      case None =>
        (base.select(col(idCol), col(vecCol),
          element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell")),
          Seq(key -> cents))
    }
    clusterByCell(assigned).write.mode("append").partitionBy("cell").parquet(path)
    // new trained-state generation: written BEFORE the commit so the
    // manifest never names a dir that does not exist
    val gen = s"$DefaultCentroidsDir-${java.util.UUID.randomUUID().toString.take(8)}"
    newState.foreach { case (k, v) => TrainedIndex.put(k, v) }
    TrainedIndex.save(spark, s"$path/$gen", onlyKeys = Some(newState.map(_._1)))
    newState.foreach { case (k, v) => TrainedIndex.put(s"$k@$path/$gen", v) }
    // the in-memory assigned-corpus cache was built with the OLD
    // centroids — paired invalidation, same discipline as invalidate(key)
    AssignedCorpus.invalidate(s"cells:$key")
    beforeCommit()
    // COMMIT: one atomic manifest swap naming only the rewrite's files
    // and the new trained-state generation
    val old = committed.toSet
    val sb = new StringBuilder
    sb.append(CellMapSchemaPrefix).append(assigned.schema.json).append('\n')
    sb.append(CellMapCentroidsPrefix).append(gen).append('\n')
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("cell=")).foreach { d =>
      val cell = d.getPath.getName.substring("cell=".length)
      fs.listStatus(d.getPath).foreach { f =>
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            !old(s"${d.getPath.getName}/$n"))
          sb.append(cell).append('\t')
            .append(d.getPath.getName).append('/').append(n).append('\n')
      }
    }
    graft.sinks.Versioned.atomicOverwrite(spark, new Path(root, CellMapFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // GC: old files and the outgoing generation are now unreferenced.
    // Best-effort — failures leave debris for vacuumUncommitted / the
    // next retrain's generation sweep, never resurrectable rows.
    old.foreach(f => fs.delete(new Path(root, f), false))
    if (liveGen != gen) fs.delete(new Path(root, liveGen), true)
  }

  /**
   * Compact a materialized index in place. `appendToIvfIndex` adds one
   * file set per append per cell, so a steadily-ingesting index sprawls
   * toward many small files — the classic streaming-sink pathology, here
   * on the index layout. This bin-packs each cell's sub-threshold files
   * (Compactor.compactParquetSelective per cell dir: bytes rewritten ∝
   * sprawl, healthy files renamed not rewritten) and then re-commits the
   * cell manifest so serves see the packed file set. Single maintenance
   * writer, like append; a manifest-reading serve racing the compaction
   * can observe vanished files and should retry — zero-downtime
   * maintenance belongs to the Versioned layout (sinks/Versioned.scala).
   */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long = 128L * 1024 * 1024)
      : graft.sinks.Compactor.CompactResult =
      graft.sinks.Lease.withLeaseHeartbeat(spark, path) {
    import graft.sinks.Compactor
    requireIndexReady(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val results = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(d => Compactor.compactParquetSelective(
        spark, d.getPath.toString, targetBytes))
    writeCellMap(spark, path)
    results.foldLeft(Compactor.CompactResult(0, 0, 0L, 0L)) { (a, b) =>
      Compactor.CompactResult(a.filesBefore + b.filesBefore,
        a.filesAfter + b.filesAfter, a.bytes + b.bytes, a.rows + b.rows)
    }
  }

  /** Marker file whose presence means a materialized IVF index is
    * COMPLETE (corpus partitions + centroids). Check this, not parquet's
    * `_SUCCESS`, before serving from an index directory. */
  val ReadyMarker: String = "_graft_index_ready"

  /** Fail fast (and clearly) on a torn index — a crash between the corpus
    * write and the `_centroids` write leaves a directory that parquet's
    * own `_SUCCESS` calls complete; every serve/append entry point gates
    * on the engine's marker instead. */
  private def requireIndexReady(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$indexPath/$ReadyMarker")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker))
      throw new IllegalStateException(
        s"index at $indexPath is incomplete: no $ReadyMarker — " +
          "writeIvfIndex did not finish (or the path is not an index)")
  }

  /**
   * Serve top-k from a materialized IVF index (see `writeIvfIndex`).
   * Probe cells are computed from the (small) query set and collected to
   * a LITERAL IN-list, so the index scan partition-prunes statically —
   * the plan touches nProbe cells' directories and nothing else. Exact
   * float cosine on the original vectors within the candidates, so
   * results are identical to `ivfTopKTrained` with the same parameters
   * (SimilaritySpec pins the equality). Centroids come from the
   * process registry, loading from the index's own `_centroids` table on
   * a cold process — no retraining anywhere on the serve path.
   */
  /** Driver-side replica of IvfCellsL2 (VectorFunctions.scala) — top-n
    * cell ids by (int-L2 asc, centroid index asc), output ordered by
    * distance. The served paths assign their QUERY vectors (tiny by
    * contract) here instead of planting a centroid-table literal (up to
    * 256×64 longs) in the Catalyst plan: analysis + codegen of that
    * literal tree dominated warm serve time (measured ~1 s/plan at 256
    * cells), and the arithmetic is bit-identical either way. */
  private def probeCellsLocal(q: Array[Long],
      cents: IndexedSeq[IndexedSeq[Long]], nProbe: Int): Array[Long] = {
    val n = math.min(nProbe, cents.length)
    val topD = Array.fill(n)(Long.MaxValue)
    val topCid = new Array[Long](n)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(q.length, cv.length)
      var d = 0L
      var i = 0
      while (i < m) { val t = q(i) - cv(i); d += t * t; i += 1 }
      var p = n
      while (p > 0 && d < topD(p - 1)) p -= 1
      if (p < n) {
        var j = n - 1
        while (j > p) { topD(j) = topD(j - 1); topCid(j) = topCid(j - 1); j -= 1 }
        topD(p) = d; topCid(p) = c.toLong
      }
      c += 1
    }
    var filled = 0
    while (filled < n && topD(filled) != Long.MaxValue) filled += 1
    java.util.Arrays.copyOf(topCid, filled)
  }

  /** `candidateFilter` (round 17 — the ES `knn` + `filter` shape): an
    * id frame (any frame carrying `idCol`) restricting the CANDIDATE
    * side before ranking. Semantics mirror the BM25 filter context —
    * cell assignment, probes and cosine ranking are unchanged, the
    * filter only removes candidates, and it lands BEFORE the rank
    * window so filtered-out vectors are never scored into the top-k.
    * The join is a semi-join the optimizer sizes (a selective filter
    * broadcasts; a broad one shuffles with the cells — both correct). */
  def ivfTopKServed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, indexKey: String,
      nProbe: Int = 3, stride: Int = 20, iters: Int = 3,
      candidateFilter: Option[DataFrame] = None): DataFrame = {
    requireIndexReady(spark, indexPath)
    val key = ivfKey(indexKey, idCol, vecCol, stride, iters)
    val cents = servedState(spark, indexPath, key)
    // the query set is the small (broadcast) side by CONTRACT, so it is
    // evaluated ONCE, on the driver: the collected rows provide both the
    // literal probe-cell list (static partition pruning on the index
    // scan) and the broadcast probe table — re-deriving the quantization
    // subtree for the join would double the per-serve query-side work.
    // Cell assignment happens driver-side (probeCellsLocal) so the
    // collect plan carries no centroid literal.
    val probeRows = withInt8(queries, vecCol)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast(D).as("qvec"), col("__q"))
      .collect()
      .flatMap { r =>
        val q = r.getSeq[Long](2).toArray
        probeCellsLocal(q, cents, nProbe)
          .map(cell => org.apache.spark.sql.Row(r.get(0), r.get(1), cell))
      }
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qvec", D),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType)))
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows.toIndexedSeq, 1), probeSchema)
    val probeCells = probeRows.map(_.getLong(2)).distinct.sorted
    val alive = withoutTombstones(spark, indexPath,
      readProbedCells(spark, indexPath, probeCells)
        .select(col("cell").cast("long").as("cell"),
          col(idCol).as("neighbor_id"), col(vecCol).cast(D).as("cvec")))
    val cand = candidateFilter match {
      case None => alive
      case Some(p) => alive.join(
        p.select(col(idCol).cast("long").as("neighbor_id")),
        Seq("neighbor_id"), "left_semi")
    }
    val scored = broadcast(probes).join(cand, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /**
   * Serve PQ top-k from a materialized index written with
   * `writeIvfIndex(..., pqM = Some(m))` — the ADC twin of
   * `ivfTopKServed`, and the missing half of the PQ economics at 100 TB:
   * `pqTopKTrained` caches the codebook but still re-encodes the whole
   * corpus per query run; here the codes were computed ONCE at
   * write/append time and live in the cell-partitioned layout, so a
   * serve reads only the probed cells' (id, codes) columns — no vector
   * column, no encode pass, candidate bytes = m longs per row.
   *
   * Plan: probe cells + per-query integer distance tables are both
   * derived from the (small, by contract) query set on the driver; the
   * cell list becomes a literal IN-filter (static partition pruning on
   * the index scan) and the tables broadcast. ADC is the native PqAdc
   * expression over the stored codes. Ranking ascends (pq_dist,
   * neighbor_id) — all integers, so results replay exactly in SQL.
   */
  def pqTopKServed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, indexKey: String,
      nProbe: Int = 3, m: Int = 8, stride: Int = 20, iters: Int = 3): DataFrame = {
    val (scored, _) = pqAdcScored(spark, indexPath, queries, idCol, vecCol,
      indexKey, nProbe, m, stride, iters)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("pq_dist"))
  }

  /** The shared ADC stage of pqTopKServed / pqTopKReranked: (per-pair
    * frame with `query_id, neighbor_id, pq_dist`, the probed cell list —
    * the reranker's exact pass scans exactly those cells again). */
  private def pqAdcScored(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, indexKey: String,
      nProbe: Int, m: Int, stride: Int, iters: Int): (DataFrame, Array[Long]) = {
    requireIndexReady(spark, indexPath)
    def served(key: String): IndexedSeq[IndexedSeq[Long]] =
      servedState(spark, indexPath, key)
    val cents = served(ivfKey(indexKey, idCol, vecCol, stride, iters))
    val cb = served(pqKey(indexKey, idCol, vecCol, m, stride, iters))
    val ksub = cb.length / m
    val sub = cb.head.length
    // query side evaluated ONCE on the driver (broadcast side by
    // contract): each collected row carries the query's integer
    // sub-distance table plus one probed cell. Both the dtable and the
    // cell assignment are computed driver-side from the served codebook —
    // the previous spelling planted the whole codebook (m·ksub·sub longs)
    // as a typedlit in the plan, and Catalyst analysis + codegen of that
    // literal tree cost ~seconds per serve. Integer math is identical:
    // dtable[ci] = Σ_j (q[(ci div ksub)·sub + j] − cb[ci][j])², exactly
    // the SQL replay in annPqServedSql.
    val qRows = withInt8(queries, vecCol)
      .select(col(idCol).cast("long").as("query_id"), col("__q"))
      .collect()
      .flatMap { r =>
        val q = r.getSeq[Long](1).toArray
        val dtable = new Array[Long](cb.length)
        var ci = 0
        while (ci < cb.length) {
          val cv = cb(ci)
          val off = (ci / ksub) * sub
          var s0 = 0L
          var j = 0
          while (j < sub) { val d = q(off + j) - cv(j); s0 += d * d; j += 1 }
          dtable(ci) = s0
          ci += 1
        }
        val dseq: Seq[Long] = dtable.toIndexedSeq
        probeCellsLocal(q, cents, nProbe)
          .map(cell => org.apache.spark.sql.Row(r.getLong(0), dseq, cell))
      }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dtable",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType)))
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows.toIndexedSeq, 1), qSchema)
    val probeCells = qRows.map(_.getLong(2)).distinct.sorted
    val cand = withoutTombstones(spark, indexPath,
      readProbedCells(spark, indexPath, probeCells)
        .select(col("cell").cast("long").as("cell"),
          col(idCol).as("neighbor_id"), col("codes")))
    val scored = broadcast(probes).join(cand, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("pq_dist", vec_pq_adc(col("codes"), col("dtable"), ksub))
    (scored, probeCells)
  }

  /**
   * Two-stage PQ retrieval: ADC shortlists, EXACT int8 cosine re-ranks
   * (VERDICT r12 next #2 — the standard fix for ADC distortion; the r12
   * recall table measured PQ-ADC recall@10 = 0.168 vs IVF 0.486 at
   * nProbe=16 on the random-vector worst case). Stage 1 is
   * `pqTopKServed`'s plan verbatim — codes-only scan of the probed
   * cells, broadcast dtables, integer ADC — but keeps the top `candC`
   * candidates per query instead of k. Stage 2 recomputes the exact
   * int8 cosine for just those candidates (the index rows carry the raw
   * vector beside the codes, so the exact pass re-quantizes
   * candC·|queries| vectors — bounded, never a corpus scan) and
   * re-ranks to k.
   *
   * Why cosine and not int8 L2: the int8 representation is PER-VECTOR
   * scaled (qᵢ = xᵢ·127/max|x|), so ‖q_a − q_b‖² = s_a² + s_b² −
   * 2·s_a·s_b·cosθ is dominated by the scale spread — measured on the
   * sf1 random-vector corpus, exact int8 L2 re-ranking plateaued at
   * recall@10 ≈ 0.23 while the scale-invariant cosine reaches the IVF
   * exact line. Dot and both norms are INTEGER (exact, ≤ d·127² —
   * double-representable), so the final cos = dot/(√na·√nb) is the
   * same IEEE double in any engine and the rank order replays exactly
   * in SQL (`ann_pq_reranked` oracle: served-PQ CTEs + this re-rank).
   *
   * The economics at 100 TB: ADC reads m bytes/row over the probed
   * cells; the exact pass touches only candC rows/query. candC trades
   * recall against that second-stage cost — the BASELINE.md recall
   * table records the measured ADC→reranked lift.
   */
  def pqTopKReranked(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, indexKey: String, candC: Int,
      nProbe: Int = 3, m: Int = 8, stride: Int = 20, iters: Int = 3): DataFrame = {
    require(candC >= k, s"shortlist candC=$candC must be >= k=$k")
    val (scored, probeCells) = pqAdcScored(spark, indexPath, queries,
      idCol, vecCol, indexKey, nProbe, m, stride, iters)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_dist"), col("neighbor_id"))
    // the shortlist is pairs only — ids, no vectors; tombstones were
    // already subtracted inside the ADC stage
    val shortlist = scored.withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= candC)
      .select(col("query_id"), col("neighbor_id"))
    // exact pass: re-scan the SAME probed cells (partition-pruned — never
    // the whole index) for id+vector only, keep the shortlisted rows via
    // a broadcast join, re-quantize those candC·|queries| vectors to int8
    // and compute the true squared L2 — all integers
    val candVecs = withInt8(
      readProbedCells(spark, indexPath, probeCells)
        .select(col(idCol).as(idCol), col(vecCol)), vecCol)
      .select(col(idCol).cast("long").as("neighbor_id"), col("__q").as("nvec"))
    val queryQ = withInt8(queries, vecCol)
      .select(col(idCol).cast("long").as("query_id"), col("__q").as("qvec"))
    val exact = candVecs.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(queryQ), Seq("query_id"))
      .withColumn("__dot", expr(
        "aggregate(zip_with(qvec, nvec, (a, b) -> a * b), 0L, (s, v) -> s + v)"))
      .withColumn("__qn", expr("aggregate(qvec, 0L, (s, v) -> s + v * v)"))
      .withColumn("__nn", expr("aggregate(nvec, 0L, (s, v) -> s + v * v)"))
      .withColumn("cos_i8", col("__dot").cast("double") /
        (sqrt(col("__qn").cast("double")) * sqrt(col("__nn").cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_i8").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_i8"), 4).as("cos_i8"))
  }

  /**
   * Per-vector int8 quantization: q_i = floor(x_i·127/max|x| + 0.5) —
   * round-half-up spelled as floor so both engines agree on exact .5
   * boundaries (SQL round() is banker's). 4× smaller than float32, and
   * every downstream dot product is INTEGER arithmetic, so similarity
   * scores are bit-exact across engines. Built from codegen'd higher-order
   * functions — no custom expression needed.
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    withInt8(df, vecCol).select(col(idCol).as("id"), col("__q").as("q"))

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
   * partition the corpus with the trained k-means coarse quantizer, then
   * drop every vector whose cosine to ANY lower-id vector in the SAME
   * cell is ≥ `threshold`.
   *
   * Precise drop rule — deliberately NOT the paper's survivor-relative
   * greedy: a row is dropped even when the lower-id row that kills it
   * was itself dropped. On chain-shaped duplicate clusters (a≈b, b≈c,
   * a≉c) this over-drops relative to SemDeDup, which would keep c once b
   * is gone; on clique-shaped clusters (the overwhelming case at the
   * paper's 0.96+ thresholds, where near-dups are mutually similar) the
   * two rules coincide — min id survives, rest drop. The any-lower-id
   * rule is chosen because it is ONE distributed pass (survivor-relative
   * is a sequential fixpoint per cell, O(chain length) rounds) and
   * replays exactly as a single SQL anti-join, keeping the operator
   * oracle-checkable. Survivor choice is deterministic either way.
   *
   * Scale shape: this is the paper's point — the O(n²) cosine check
   * becomes Σ|cell|² by clustering first. The only join is the
   * within-cell self-join; centroid closure rides as foldable literals
   * (zero-shuffle assignment, ≤ 256 centroids by `effectiveStride`), and
   * the anti-join key is the id alone. The assigned projection is cached:
   * it feeds both self-join sides and the survivor anti-join.
   *
   * Returns survivors as (vec_id, cell).
   */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.98, stride: Int = 20, iters: Int = 3,
      indexKey: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val cents = TrainedIndex.getOrTrain(
      indexKey.map(ik => ivfKey(ik, idCol, vecCol, stride, iters)))(
      trainIvfCentroids(corpus, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    val assigned = withInt8(Par.ensureParallelism(corpus), vecCol)
      .select(col(idCol).as("vec_id"), col(vecCol).cast(D).as("v"),
        element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
      .cache()
    val l = assigned.select(col("cell"), col("vec_id").as("a"), col("v").as("va"))
    val r = assigned.select(col("cell"), col("vec_id").as("b"), col("v").as("vb"))
    val dups = l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .filter(vec_cosine(col("va"), col("vb")) >= threshold)
      .select(col("b").as("vec_id")).distinct()
    assigned.join(dups, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /**
   * INTEGER-exact semantic dedup over integer vectors (the feature-hash
   * bridge's dedup half): same SemDeDup cell-bounded shape as
   * [[semanticDedup]], but the cosine test is pure int64 —
   * `cos(u,v) ≥ tNum/tDen ⇔ dot > 0 ∧ dot²·tDen² ≥ tNum²·|u|²·|v|²` —
   * so keep/drop decisions are bit-identical cross-engine with NO float
   * boundary anywhere (the float variant documents why its threshold
   * must sit far from the data; this one needs no such care). Zero
   * vectors (empty docs) never match: cosine is undefined there.
   *
   * Overflow bound (documented contract): |coord| ≤ C and dim d need
   * d²·C⁴·tDen² < 2⁶³ — feature-hash coords are bounded by per-doc token
   * counts, so d=64, C≤4k, tDen≤8 is safe by orders of magnitude.
   */
  def semanticDedupInt(corpus: DataFrame, idCol: String, vecCol: String,
      tNum: Long = 4, tDen: Long = 5, stride: Int = 20, iters: Int = 3,
      indexKey: Option[String] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "need 0 < tNum/tDen <= 1")
    import org.apache.spark.sql.functions.typedlit
    val cents = TrainedIndex.getOrTrain(
      indexKey.map(ik => ivfKey(ik, idCol, vecCol, stride, iters)))(
      trainIvfCentroids(corpus, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    val assigned = withInt8(Par.ensureParallelism(corpus), vecCol)
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"),
        vec_doti(col(vecCol), col(vecCol)).as("nrm"),
        element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
      .cache()
    val l = assigned.select(col("cell"), col("vec_id").as("a"),
      col("v").as("va"), col("nrm").as("na"))
    val r = assigned.select(col("cell"), col("vec_id").as("b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dot = vec_doti(col("va"), col("vb"))
    val dups = l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .filter(col("na") > 0 && col("nb") > 0)
      .filter(dot > 0 &&
        dot * dot * lit(tDen * tDen) >= lit(tNum * tNum) * col("na") * col("nb"))
      .select(col("b").as("vec_id")).distinct()
    assigned.join(dups, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /**
   * Cluster-balanced selection: cap how many documents any one embedding
   * cluster contributes to the curated set. Web-scale corpora are
   * cluster-skewed (boilerplate families, template farms); capping
   * per-cluster mass is the standard balancing move after semantic dedup
   * (the SemDeDup/DataComp curation recipe's balancing step). Cells are
   * the SAME trained integer-k-means quantizer the ANN/semantic-dedup
   * family uses (registry-shared under `indexKey`), so one training pays
   * for dedup, search, and balancing.
   *
   * Returns every corpus row as (vec_id, cell, rank_in_cell, kept):
   * rank is the deterministic id-order position within the row's cell,
   * kept ⇔ rank ≤ cap. Scale shape: one narrow assignment map (literal
   * centroid table, no join), one exchange keyed by cell for the
   * per-cell window — partition count follows the cell count, never an
   * unpartitioned window.
   */
  def clusterBalance(corpus: DataFrame, idCol: String, vecCol: String,
      cap: Long, stride: Int = 20, iters: Int = 3,
      indexKey: Option[String] = None): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.functions.{row_number, typedlit}
    val cents = TrainedIndex.getOrTrain(
      indexKey.map(ik => ivfKey(ik, idCol, vecCol, stride, iters)))(
      trainIvfCentroids(corpus, idCol, vecCol, stride, iters))
    val cbLit = typedlit(cents)
    val cidLit = typedlit(cents.indices.map(_.toLong))
    withInt8(Par.ensureParallelism(corpus), vecCol)
      .select(col(idCol).as("vec_id"),
        element_at(vec_ivf_cells_l2(col("__q"), cbLit, cidLit, 1), 1).as("cell"))
      .withColumn("rank_in_cell", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("vec_id"))).cast("long"))
      .withColumn("kept", col("rank_in_cell") <= cap)
  }

  /** Adds the int8 quantization as column `__q`, keeping every other
    * column — so callers that need both the raw and quantized vector
    * (ivfTopKTrained) don't pay a self-join to reunite them. */
  private def withInt8(df: DataFrame, vecCol: String): DataFrame =
    // max|x| hoisted into its own column: inside the transform lambda the
    // aggregate re-evaluates PER ELEMENT (no CSE across HOF lambdas —
    // O(d²) per vector, measured ~2× on the sf0.1 bench). Consumed twice
    // below, so CollapseProject keeps it materialized.
    df.withColumn("__ma", expr(
        s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
      .withColumn("__q",
        expr(s"""CASE WHEN __ma = 0.0
                 THEN transform($vecCol, x -> CAST(0 AS BIGINT))
                 ELSE transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                   / __ma + 0.5) AS BIGINT))
                 END"""))
      .drop("__ma")

  /**
   * Johnson–Lindenstrauss random projection over the int8-quantized
   * vectors (Achlioptas 2003: ±1 sign matrices preserve pairwise
   * distances in expectation) — the embedding COMPRESSION primitive:
   * d float32 coordinates → k int64 coordinates (k ≪ d) for cheap
   * pre-filter/storage tiers. The sign matrix is s(d,j) = +1 iff
   * (((d·64 + j + 1)·2654435761) mod P) is even — the same affine
   * mod-P mix quality_classify's weights use (a plain parity of an
   * affine form would collapse to a rank-2 checkerboard), so the DuckDB
   * oracle regenerates the matrix bit-for-bit and every projected
   * coordinate is an exact int64 (|q| ≤ 127, ≤ 4096 dims — no
   * overflow). One narrow codegen'd map: no join, no shuffle.
   */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    val P = graft.functions.HashFunctions.P
    withInt8(df, vecCol).select(col(idCol), expr(
      s"""transform(sequence(0, ${k - 1}), j ->
         |  aggregate(zip_with(__q, sequence(0, size(__q) - 1),
         |    (q, d) -> q * IF((((d * 64 + j + 1) * 2654435761) % ${P}L) % 2 = 0,
         |                     1, -1)),
         |    CAST(0 AS BIGINT), (a, x) -> a + x))""".stripMargin).as("proj"))
  }

  /** Brute-force top-k over int8-quantized vectors: integer dots + integer
    * norms, cosine formed only for ranking (deterministically, from exact
    * integers). Same broadcast-queries/scan-corpus shape as the float path. */
  def quantizedTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms depend only on the vector — compute them once per row here,
    // NOT inside the pair join (per-pair norms would redo |corpus|·|q|
    // aggregate passes instead of |corpus| + |q|)
    def withNorm(df: DataFrame): DataFrame =
      df.withColumn("qn", vec_doti(col("q"), col("q")))
    val q = broadcast(withNorm(quantizeInt8(queries, idCol, vecCol))
      .select(col("id").as("query_id"), col("q").as("qv"), col("qn").as("qna")))
    val c = withNorm(quantizeInt8(Par.ensureParallelism(corpus), idCol, vecCol))
      .select(col("id").as("neighbor_id"), col("q").as("cv"), col("qn").as("qnb"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      // zero-norm guard: 0/0 would rank NaN first (Spark sorts NaN as the
      // largest double, engines disagree) — zero vectors simply can't match
      .filter(col("qna") > 0 && col("qnb") > 0)
      // native codegen'd integer dot — the zip_with/aggregate HOF spelling
      // evaluated interpreted per candidate pair
      .withColumn("qdot", vec_doti(col("qv"), col("cv")))
      .withColumn("qcos", col("qdot") / (sqrt(col("qna")) * sqrt(col("qnb"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("qdot"))
  }

  /**
   * Product-quantization ANN top-k (Jégou et al., TPAMI 2011), composed
   * with the int8 path so every number is an INTEGER and the whole
   * operator — codebook, codes, distance table, ADC scores — replays
   * bit-exact in SQL (a float k-means codebook would converge
   * machine-dependently):
   *
   *  1. int8-quantize corpus + queries (quantizeInt8: exact cross-engine);
   *  2. codebook = the quantized corpus vectors whose id divides
   *     `centroidStride`, split into `m` subvectors (training-free
   *     deterministic, same trick as ivfTopK's coarse quantizer);
   *  3. corpus encodes once: m codes/vector via the PqEncode expression
   *     — after this the scan carries m longs instead of the vector
   *     (m/dim compression, 8× here; memory is the point of PQ);
   *  4. each query precomputes its integer sub-distance table (m·ksub
   *     entries, built with codegen-friendly HOFs over the codebook
   *     literal) and broadcasts; ADC per pair is the PqAdc expression —
   *     m table lookups, native codegen, no vector math in the loop.
   *
   * Scale shape: codebook + query tables broadcast (bounded by
   * construction); the corpus is scanned once for encoding and once for
   * ADC — no shuffle of vectors at all. Ranking ascends by (pq_dist,
   * neighbor_id), both integers, so cross-engine order is exact.
   */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, centroidStride: Int = 20): DataFrame = {
    val cents = quantizeInt8(corpus.filter(col(idCol) % centroidStride === 0),
        idCol, vecCol)
      .collect().sortBy(_.getLong(0)) // bounded: |corpus|/stride rows
    val ksub = cents.length
    val dim = cents.head.getSeq[Long](1).length
    val sub = dim / m
    val cb: IndexedSeq[IndexedSeq[Long]] =
      (for (j <- 0 until m; c <- 0 until ksub)
        yield cents(c).getSeq[Long](1).slice(j * sub, (j + 1) * sub).toIndexedSeq).toIndexedSeq
    pqSearch(queries, corpus, idCol, vecCol, k, m, ksub, sub, cb)
  }

  /**
   * Trained per-subspace integer PQ codebook: the same deterministic
   * Lloyd recipe as `trainIvfCentroids`, run independently in each of the
   * m subspaces (assignment = PqEncode's exact integer sub-L2 argmin,
   * update = truncating integer mean, empty codes keep their entry, fixed
   * iterations). Returns the flattened j·ksub + c layout PqEncode/PqAdc
   * consume. Bit-replayable in SQL for the same reasons as the IVF
   * trainer.
   */
  def trainPqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, stride: Int = 20, iters: Int = 3): IndexedSeq[IndexedSeq[Long]] = {
    import org.apache.spark.sql.functions.typedlit
    val q = quantizeInt8(Par.ensureParallelism(corpus), idCol, vecCol).cache()
    try {
      val init = q.filter(col("id") % effectiveStride(q.count(), stride) === 0)
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1).toArray)
      val ksub = init.length
      val dim = init.head.length
      val sub = dim / m
      var cb: Array[Array[Long]] =
        (for (j <- 0 until m; c <- 0 until ksub)
          yield init(c).slice(j * sub, (j + 1) * sub)).toArray
      for (_ <- 0 until iters) {
        val cbLit = typedlit(cb.map(_.toIndexedSeq).toIndexedSeq)
        // m·ksub·sub rows to the driver per iteration — bounded
        val sums = q.select(vec_pq_encode(col("q"), cbLit, m).as("codes"),
            posexplode(col("q")).as(Seq("pos", "v")))
          .withColumn("j", expr(s"CAST(pos div $sub AS INT)"))
          .withColumn("c", element_at(col("codes"), col("j") + 1))
          .groupBy(col("j"), col("c"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cb.map(_.clone())
        sums.foreach { r =>
          val j = r.getInt(0); val c = r.getLong(1).toInt; val pos = r.getInt(2)
          // truncating division: Java long `/` == DuckDB `//`
          next(j * ksub + c)(pos - j * sub) = r.getLong(3) / r.getLong(4)
        }
        cb = next
      }
      cb.map(_.toIndexedSeq).toIndexedSeq
    } finally q.unpersist()
  }

  /** PQ top-k over the TRAINED codebook — same search plan as `pqTopK`,
    * codebook from `trainPqCodebook`. */
  def pqTopKTrained(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, stride: Int = 20, iters: Int = 3,
      indexKey: Option[String] = None): DataFrame = {
    val cb = TrainedIndex.getOrTrain(
      indexKey.map(ik => pqKey(ik, idCol, vecCol, m, stride, iters)))(
      trainPqCodebook(corpus, idCol, vecCol, m, stride, iters))
    val ksub = cb.length / m
    val sub = cb.head.length
    pqSearch(queries, corpus, idCol, vecCol, k, m, ksub, sub, cb)
  }

  /** Shared PQ search stage: encode corpus once, broadcast per-query
    * distance tables, ADC + rank (see pqTopK scaladoc for the plan). */
  private def pqSearch(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int, ksub: Int, sub: Int, cb: IndexedSeq[IndexedSeq[Long]]): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val cbLit = typedlit(cb)
    val encoded = quantizeInt8(Par.ensureParallelism(corpus), idCol, vecCol)
      .select(col("id").as("neighbor_id"), vec_pq_encode(col("q"), cbLit, m).as("codes"))
    val qq = quantizeInt8(queries, idCol, vecCol)
      .withColumn("__cb", cbLit)
      .select(col("id").as("query_id"), expr(
        s"""transform(__cb, (cv, idx) ->
           |  aggregate(zip_with(slice(q, (idx div $ksub) * $sub + 1, $sub), cv,
           |    (a, b) -> (a - b) * (a - b)), 0L, (s, v) -> s + v))""".stripMargin)
        .as("dtable"))
    val scored = broadcast(qq).crossJoin(encoded)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("pq_dist", vec_pq_adc(col("codes"), col("dtable"), ksub))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("pq_dist"))
  }

  /** LSH-bucketed ANN top-k: probe own bucket + 1-bit-flip neighbors. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val c = Par.ensureParallelism(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast(D).as("cv"),
        vec_lsh_bucket(col(vecCol), planes, seed).as("bucket"))
    // each query probes its bucket and every bucket at Hamming distance 1
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast(D).as("qv"),
      vec_lsh_bucket(col(vecCol), planes, seed).as("qb"))
      .withColumn("flip", explode(sequence(lit(0), lit(planes)))) // planes = no flip
      .withColumn("bucket",
        when(col("flip") === planes, col("qb"))
          .otherwise(expr(s"int(qb) ^ shiftleft(1, flip)")))
      .select(col("query_id"), col("qv"), col("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vec_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
