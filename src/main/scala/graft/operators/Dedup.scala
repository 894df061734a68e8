package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._

/**
 * Deduplication operators for large text/embedding corpora (north-star
 * pipeline ops). Every method is a pure DataFrame transform designed for
 * the 100 TB shape:
 *
 *  - exact: hash-groupBy — one shuffle on a 16-byte digest, never on the
 *    full text.
 *  - MinHash+LSH: signature is a one-pass expression; banding explodes to
 *    b rows/doc (not n²); the only join is band-bucket equality, so work is
 *    proportional to colliding candidates, not pairs.
 *  - SimHash: 4×16-bit band blocking finds all pairs within Hamming
 *    distance 3 (pigeonhole) with the same candidate-join shape.
 *  - n-gram Jaccard: exact, via distinct (doc, gram) inverted index —
 *    shuffle bounded by corpus token count; a length-ratio prefilter keeps
 *    the pair count down.
 *  - embedding cosine: signed-random-projection buckets (parallel vectors
 *    collide with probability 1), exact cosine verify inside buckets only.
 */
object Dedup {

  import Par.ensureParallelism

  /** Exact duplicate groups by content digest: (hash, n, keeper). The
    * keeper is the minimum id — deterministic survivor selection. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))
      .filter(col("n") > 1)

  /** Drop exact duplicates, keeping the min-id row per digest. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * MinHash+LSH near-dup pairs. The CONTRACT is banding semantics, stated
   * exactly: a pair is returned iff (1) it shares at least one full band
   * (all `rowsPerBand` signature components of some band equal — the LSH
   * candidate test) AND (2) its full signatures agree in ≥ ⌈threshold·m⌉
   * components (the verify test). Both conditions are deterministic
   * functions of the two signatures, so the result is data-independent
   * and exactly SQL-replayable — the oracle applies the same two tests.
   * Recall RELATIVE TO BRUTE FORCE over condition (2) alone is the
   * standard LSH probability 1−(1−s^r)^b (s = true signature agreement
   * rate): ≈ 1 for pairs well above threshold, ~84% for a pair exactly
   * AT t = 0.6 with 16×4 banding — that gap is inherent to LSH and is
   * what makes the plan O(colliding candidates) instead of O(n²);
   * DedupSpec audits it empirically on the bench corpus.
   *
   * `bands` × `rowsPerBand` must equal the signature length. Returns
   * (a, b, n_match, est_jaccard) with a < b, deduplicated across bands;
   * `n_match` is the exact integer count of agreeing signature components
   * (= est_jaccard · m) so cross-engine comparison stays float-free.
   */
  def minHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingle: Int = 5,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val m = bands * rowsPerBand
    // integer match threshold: n_match/m ≥ t  ⇔  n_match ≥ ⌈t·m⌉
    val minMatch = math.ceil(threshold * m - 1e-9).toInt
    // cache: the signature table feeds BOTH sides of the self-join — without
    // the boundary each side recomputes every signature from the raw text
    val sigs = ensureParallelism(df)
      .select(col(idCol).as("id"), minhash_sig(col(textCol), shingle, m).as("sig"))
      .cache()
    // band key: hash of the signature slice → (band, key) bucket join
    val banded = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
    val l = banded.select(col("band"), col("bucket"), col("id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("b"), col("sig").as("sig_b"))
    // verify BEFORE dedup: a candidate seen in k bands recomputes the
    // (cheap, codegen'd) component count k times, but the distinct then
    // shuffles only the surviving (a, b, n_match) triples instead of every
    // candidate's two m-long signature arrays
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .withColumn("n_match",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"))
      .filter(col("n_match") >= minMatch)
      .select(col("a"), col("b"), col("n_match")).distinct()
      .withColumn("est_jaccard", col("n_match") / lit(m.toDouble))
  }

  /**
   * Incremental-ingest near-dedup: drop every `batch` row that is a
   * banding-semantics near-dup of some `reference` row — same two-part
   * contract as minHashPairs (shares ≥ 1 full band AND agrees in ≥
   * ⌈threshold·m⌉ signature components; see that scaladoc for the
   * recall-vs-brute-force statement). The daily-batch shape: the
   * reference side is just a signature table (precompute/persist it
   * once; new batches never rescan the reference TEXT), and the join is
   * strictly cross-set, so reference-internal duplicates cost nothing.
   * Same signature/banding spec as minHashPairs → the oracle replays
   * both tests exactly.
   */
  def dropNearDuplicatesAgainst(
      reference: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.6, shingle: Int = 5,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val m = bands * rowsPerBand
    val minMatch = math.ceil(threshold * m - 1e-9).toInt
    def sigs(df: DataFrame) = ensureParallelism(df)
      .select(col(idCol).as("id"), minhash_sig(col(textCol), shingle, m).as("sig"))
      .cache()
    def banded(s: DataFrame) = s
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
    val dupIds = banded(sigs(batch))
      .select(col("band"), col("bucket"), col("id").as("b_id"), col("sig").as("b_sig"))
      .join(banded(sigs(reference))
        .select(col("band"), col("bucket"), col("sig").as("r_sig")),
        Seq("band", "bucket"))
      .withColumn("n_match",
        expr("size(filter(zip_with(b_sig, r_sig, (x, y) -> x = y), v -> v))"))
      .filter(col("n_match") >= minMatch)
      .select(col("b_id")).distinct()
    batch.join(dupIds, batch(idCol) === dupIds("b_id"), "left_anti")
  }

  /** SimHash near-dup pairs within `maxHamming` (≤ bandCount-1 for full
    * recall by pigeonhole: 4 bands of 16 bits catch any ≤3-bit diff). */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = ensureParallelism(df)
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
      .cache()
    val bands = 4
    val banded = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("piece",
        expr("(sig >> (band * 16)) & 65535"))
    val l = banded.select(col("band"), col("piece"), col("id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("piece"), col("id").as("b"), col("sig").as("sig_b"))
    // hamming filter before dedup — the distinct shuffles only final pairs
    l.join(r, Seq("band", "piece")).filter(col("a") < col("b"))
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming")).distinct()
  }

  /**
   * Exact character-n-gram Jaccard similarity — dense-corpus plan: one
   * sorted gram-set per document (computed once), pair join with a
   * length-ratio prefilter (jaccard ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ t),
   * then a linear-merge intersect expression per surviving pair. Work is
   * O(pairs × set size) with zero per-pair allocation; the inverted-index
   * variant below degenerates to Σ n_g² rows when grams are corpus-common
   * (measured 280 s vs ~2 s on the shared-vocabulary bench corpus).
   * Returns (a, b, inter, na, nb); jaccard = inter / (na + nb - inter).
   *
   * DRIVER-BOUND BY DESIGN: this plan collects one (id, gram-set) row
   * per doc to the driver and broadcasts it — correct only while the set
   * table is broadcast-sized. Do not call it directly on unbounded
   * corpora; call `ngramJaccardPairsAuto`, which size-gates the choice
   * between this and the sparse inverted index.
   */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // gram sets are computed distributed (one pass over the corpus), then
    // broadcast: ~|docs| × |set| longs. All-pairs similarity over a dense
    // corpus is inherently O(n²) in PAIRS but only O(n) in DATA — a join
    // would copy both arrays into every output row (~60 GB of row traffic
    // on the 5k-doc bench corpus, measured 60 s); broadcasting the 12 MB
    // set table and looping per partition does the same work in ~2 s.
    // For corpora too big to broadcast, use ngramJaccardPairsSparse (the
    // inverted index) or minHashPairs + exact verify.
    val sets = df.select(col(idCol).cast("long").as("id"),
        ngram_sorted_set(col(textCol), n).as("gs"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(sets)
    val nDocs = sets.length
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("inter", LongType), StructField("na", LongType),
      StructField("nb", LongType)))
    val slices = math.max(spark.sparkContext.defaultParallelism * 2, 8)
    // deterministic shuffle of indices: contiguous ranges would give the
    // low-index partitions quadratically more pairs (i pairs with all j>i)
    val striped = (0 until nDocs).sortBy(i => graft.functions.HashFunctions.mix64(i.toLong))
    val rows = spark.sparkContext
      .parallelize(striped, math.min(slices, math.max(nDocs, 1)))
      .mapPartitionsWithIndex { (_, idxs) =>
        val all = bc.value
        idxs.flatMap { i =>
          val (ida, ga) = all(i)
          Iterator.range(i + 1, nDocs).flatMap { j =>
            val (idb, gb) = all(j)
            val (na, nb) = (ga.length, gb.length)
            if (math.min(na, nb) < math.max(na, nb) * minJaccard) None
            else {
              // J ≥ t ⟺ inter ≥ t(na+nb)/(1+t); floor makes the bound an
              // UNDER-estimate, so the early exit below can only fire on
              // pairs that provably miss the threshold — the emitted pair
              // set is bit-identical to the full merge (final check is
              // still the exact ratio). Disjoint-ish pairs — the vast
              // majority under all-pairs — now abort after ~⅓ of the
              // merge instead of walking na+nb steps.
              val req = math.floor(minJaccard * (na + nb) / (1.0 + minJaccard)).toInt
              var x = 0; var y = 0; var inter = 0
              var live = true
              while (live && x < na && y < nb) {
                if (ga(x) == gb(y)) { inter += 1; x += 1; y += 1 }
                else {
                  if (ga(x) < gb(y)) x += 1 else y += 1
                  if (inter + math.min(na - x, nb - y) < req) live = false
                }
              }
              if (live && inter.toDouble / (na + nb - inter) >= minJaccard)
                Some(Row(ida, idb, inter.toLong, na.toLong, nb.toLong))
              else None
            }
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /**
   * Size-gated dispatcher over the two n-gram Jaccard plans: estimate the
   * total gram-set footprint from one cheap aggregate (Σ text length ·
   * 8 bytes/hash + per-doc overhead — an upper bound on the broadcast
   * payload, since a doc has ≤ |text| distinct grams), and pick the
   * dense broadcast-loop only when that bound fits `broadcastMaxBytes`.
   * Above the gate the prefix-filtered join runs instead (see
   * ngramJaccardPairsPrefix; the plain inverted index remains available
   * for corpora whose gram-frequency skew defeats prefixes): neither
   * collects the corpus to the driver, so a 100× corpus cannot OOM the
   * job before it starts. All plans compute the same exact pair set
   * (dense compares 64-bit gram hashes, sparse raw grams; a divergence
   * needs an xxhash-scale collision — ~2⁻⁶⁴/pair, and DedupSpec pins
   * equality on the bench corpus), so dispatch is invisible to callers
   * and to the oracle.
   */
  def ngramJaccardPairsAuto(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      broadcastMaxBytes: Long = 256L << 20): DataFrame = {
    val est = df.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L)).as("chars")).head()
    val estBytes = est.getLong(1) * 8L + est.getLong(0) * 64L
    if (estBytes <= broadcastMaxBytes) ngramJaccardPairs(df, idCol, textCol, n, minJaccard)
    else ngramJaccardPairsPrefix(df, idCol, textCol, n, minJaccard)
  }

  /**
   * Prefix-filtered set-similarity join (the PPJoin family: Chaudhuri et
   * al. ICDE'06, Xiao et al. WWW'08) — the textbook SCALE plan for exact
   * Jaccard: candidates only form when two docs share a gram inside
   * their PREFIXES (each doc's |X| − ⌈t·|X|⌉ + 1 globally-rarest grams,
   * ordered by corpus frequency). Lossless: J ≥ t implies an overlap of
   * ⌈t·|X|⌉ with BOTH sets, so some shared gram must sit in both
   * prefixes. Against the plain inverted index this shrinks the
   * candidate join from Σ n_g² over ALL grams to Σ n_g² over prefix
   * (rare) grams — on sparse corpora, orders of magnitude. The verify
   * step intersects the full sorted hash arrays with the codegen'd
   * linear-merge expression, exactly like the dense loop.
   */
  def ngramJaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      verifyBroadcastMaxBytes: Long = 1L << 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // grams carry 8-byte xxhash64 values, not strings: every downstream
    // exchange (distinct, the freq window, the candidate equi-join)
    // shuffles fixed-width longs — the narrower-types lever. The prefix
    // theorem needs only a CONSISTENT total order over grams, so
    // (gf, hash) orders as correctly as (gf, string); a cross-gram
    // hash collision merging two grams is the same ~2⁻⁶⁴/pair risk
    // class the dense plan's ngram_sorted_set arrays already accept
    // (the exact verify below intersects those arrays — its own 64-bit
    // hash domain — so the operator's collision exposure is unchanged).
    val grams = df
      .select(col(idCol).cast("long").as("id"),
        explode(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> xxhash64(substring($textCol, i, $n)))"))
          .as("g"))
      .distinct().cache()
    // gram frequency via groupBy(g) + equi-join, NOT a window over g
    // (ADVICE r21): count().over(partitionBy(g)) buffers EVERY row of a
    // gram's partition group in one task — a hyper-frequent gram (a
    // stopword trigram present in most docs) concentrates ~N rows into
    // one window task with no remedy, since AQE's skew handling splits
    // JOIN partitions only, never window groups. The aggregate reduces
    // map-side to one row per gram before anything wide moves (its
    // exchange carries partial counts, not the gram table), and the
    // join back is AQE-skew-splittable — or a plain broadcast when the
    // distinct-gram table is small. Measured FASTER at bench scale too
    // (same-JVM min-of-3: 3.18 s window vs 2.43 s join — the broadcast
    // replaces the window's per-partition sort); the skew ceiling is gone.
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("gf"))
    val ranked = grams
      .join(freq, Seq("g"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("id"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gf"), col("g"))))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * minJaccard) + 1)
      .select(col("id"), col("g"))
    val cand = ranked.select(col("id").as("a"), col("g"))
      .join(ranked.select(col("id").as("b"), col("g")), Seq("g"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // verify on the full sorted gram-hash arrays — the arrays are only
    // materialized per CANDIDATE, which the prefix filter has bounded.
    // BROADCAST the set table when it fits (same Σ-chars upper bound the
    // Auto dispatcher uses): a sort-merge join here SORTS candidate rows
    // CARRYING a ~|set|·8-byte array through shuffle spill — measured
    // > 45 GB of spill (disk exhaustion) at 50k zipf docs, where the
    // broadcast verify streams candidates through two in-memory hash
    // joins and shuffles only (a, b, counts). Past broadcast scale the
    // wide join is unavoidable — but at that corpus size it runs on a
    // cluster whose aggregate spill isn't one laptop disk.
    val est = df.agg(coalesce(sum(length(col(textCol)).cast("long")), lit(0L)),
      count(lit(1))).head()
    val estBytes = est.getLong(0) * 8L + est.getLong(1) * 64L
    val sets = df.select(col(idCol).cast("long").as("id"),
      ngram_sorted_set(col(textCol), n).as("gs")).cache()
    def side(alias: String, arr: String): DataFrame = {
      val s = sets.select(col("id").as(alias), col("gs").as(arr))
      if (estBytes <= verifyBroadcastMaxBytes) broadcast(s) else s
    }
    cand
      .join(side("a", "gsa"), Seq("a"))
      .join(side("b", "gsb"), Seq("b"))
      .withColumn("inter", sorted_intersect_count(col("gsa"), col("gsb")).cast("long"))
      .withColumn("na", size(col("gsa")).cast("long"))
      .withColumn("nb", size(col("gsb")).cast("long"))
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
  }

  /**
   * Inverted-index variant of the same computation — the right plan for
   * SPARSE vocabularies (real web corpora), where Σ n_g² ≪ n²: shuffle is
   * bounded by corpus token count and no all-pairs join ever forms.
   */
  def ngramJaccardPairsSparse(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    // grams as xxhash64 longs, not strings (same rationale and collision
    // class as the prefix plan above): the inverted-index join's
    // Σ n_g² candidate rows and the distinct's exchange all carry
    // fixed 8-byte keys, and the join's equality test is a long compare
    val grams = df
      .select(col(idCol).cast("long").as("id"), // schema parity with the dense plan
        explode(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> xxhash64(substring($textCol, i, $n)))"))
          .as("g"))
      .distinct()
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val l = grams.select(col("id").as("a"), col("g"))
    val r = grams.select(col("id").as("b"), col("g"))
    val inter = l.join(r, Seq("g")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "nb"), "b")
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
  }

  /**
   * Connected components over a near-dup pair list: every node gets the
   * minimum reachable id as its cluster label — the step that turns
   * pairwise matches into "keep one per cluster" decisions. Min-label
   * propagation with a driver convergence loop: O(component diameter)
   * rounds (dup clusters are shallow), each one join + partial-aggregated
   * groupBy; `localCheckpoint` truncates the growing lineage so round N
   * doesn't replay rounds 1..N-1. For graphs with deep chains swap the
   * propagation rule for large-star/small-star (Kiveris et al., SoCC'14) —
   * same loop skeleton.
   */
  def duplicateClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      driverMaxEdges: Long = 1000000L): DataFrame = {
    // Iterative graph propagation is the one genuine RDD case in this
    // engine: a DataFrame loop builds a NEW plan (and pays codegen) every
    // round, while co-partitioned RDD joins make each round a narrow
    // dependency with one small reduceByKey shuffle (8s → ~2s at sf0.1,
    // where ~all the remaining time is computing the input pairs).
    //
    // Size gate (same pattern as ngramJaccardPairsAuto): the DUP-PAIR
    // graph is orders of magnitude smaller than the corpus, and for
    // graphs under `driverMaxEdges` (~16 MB of longs at the default) a
    // driver-side union-find finishes in milliseconds where the
    // distributed loop pays seconds of per-round scheduling — identical
    // output (component min-label == transitive-closure min). Corpora
    // whose pair graph outgrows the gate take the loop below, which
    // never materializes the graph on the driver.
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    // count/collect through the DATAFRAME: df.rdd compiles a non-adaptive
    // plan, so forcing the pair computation through it pays the full
    // static-partition join again (~2.4 s at sf0.1) where the AQE plan +
    // cache costs ~1.2 s once
    val edgeDf = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .cache()
    val nEdges = edgeDf.count()
    if (nEdges <= driverMaxEdges) {
      val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      edgeDf.unpersist(false)
      val parent = mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN root: the label IS the min id
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keys.toArray.sorted
        .map(n => org.apache.spark.sql.Row(n, find(n)))
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq,
          math.max(1, rows.length / 500000)),
        StructType(Seq(StructField("id", LongType, nullable = false),
          StructField("cluster", LongType, nullable = false))))
    }
    // loop path: the RDD lineage now reads the cached edge table, so the
    // non-AQE conversion never recomputes the pair join
    val raw = edgeDf.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // shuffle width sized to the pair graph (≪ corpus): 1 partition/100k edges
    val width = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nEdges / 100000L + 1L)).toInt
    val part = new HashPartitioner(width)
    val edges = raw
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .distinct(width)
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.keys.distinct(width).map(n => (n, n))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var prev: Option[org.apache.spark.rdd.RDD[_]] = None
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges.join(labels) // co-partitioned: narrow
        .map { case (_, (dst, lab)) => (dst, lab) }
        .reduceByKey(part, (x: Long, y: Long) => math.min(x, y)) // the round's one (tiny) shuffle
      val merged = labels.leftOuterJoin(nbrMin)
        .mapValues { case (l, nl) => (l, math.min(l, nl.getOrElse(l))) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = merged.filter { case (_, (l, nx)) => nx < l }.count()
      prev.foreach(_.unpersist(false))
      prev = Some(merged)
      labels = merged.mapValues(_._2)
    }
    raw.unpersist(false)
    edgeDf.unpersist(false)
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.createDataFrame(
      labels.map { case (n, l) => org.apache.spark.sql.Row(n, l) },
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("cluster", LongType, nullable = false))))
  }

  /**
   * Embedding near-duplicate pairs with cosine ≥ `threshold`: LSH bucket
   * by hyperplane signs, exact cosine verify within buckets. Parallel
   * (scaled-copy) vectors share buckets with probability 1.
   */
  /**
   * Cross-corpus embedding near-dedup (the vector twin of
   * `dropNearDuplicatesAgainst`): drop batch vectors whose cosine vs SOME
   * reference vector is ≥ `threshold`. The reference side is an
   * LSH-bucketed signature table — in a daily-ingest pipeline it is
   * precomputed once and reused, and the join is strictly cross-set (the
   * batch never scans reference content, only bucket-colliding
   * candidates). Same recall contract as `embeddingCosinePairs`: parallel
   * (scaled-copy) vectors share buckets with probability 1.
   */
  def dropEmbeddingDupsAgainst(
      batch: DataFrame, reference: DataFrame,
      idCol: String, vecCol: String,
      threshold: Double = 0.98, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val D = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val rb = reference.select(
      vec_lsh_bucket(col(vecCol), planes, seed).as("bucket"),
      col(vecCol).cast(D).as("rv"))
    val bb = batch.select(col(idCol),
      vec_lsh_bucket(col(vecCol), planes, seed).as("bucket"),
      col(vecCol).cast(D).as("bv"))
    val dup = bb.join(rb, Seq("bucket"))
      .filter(vec_cosine(col("bv"), col("rv")) >= threshold)
      .select(col(idCol)).distinct()
    batch.join(dup, Seq(idCol), "left_anti")
  }

  /**
   * Per-document duplicated k-token-span statistics — span-level exact
   * substring dedup (the signal behind "dedup repeated 50-token spans"
   * in training-data pipelines; reference has no analog, engine-required
   * north-star op). A corpus-global suffix array is inherently serial
   * and memory-bound at 100 TB, so every k-token sliding window is
   * instead identified by the md5 of its joined token string — the same
   * 128-bit digest `exactDupGroups` shuffles, collision-free at any
   * corpus size (a 30-bit mod-P window hash already false-positives at
   * sf0.001). Duplicated windows are found with one hash-groupBy, and
   * per-doc stats with one join + one more groupBy.
   *
   * Scale shape: shuffle traffic is (doc_id, digest) only — no text or
   * array payload ever moves. The (doc_id, h) projection is cached
   * because it feeds both the global count and the per-doc join (lineage
   * would otherwise re-tokenize the corpus twice, and Catalyst re-inlines
   * deterministic expressions into self-join branches). md5 is identical
   * in DuckDB, so the oracle replays digests bit-for-bit.
   *
   * Returns (idCol, n_spans, n_dup): total k-token windows per doc and
   * how many of them have a digest occurring ≥ 2 times corpus-wide
   * (catches cross-doc AND within-doc repetition).
   */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    // span_digests: one native pass per doc (tokenize + per-window
    // incremental md5) — the HOF slice/join/md5 formulation paid
    // interpreted-lambda cost per window (9.4 s -> ~0.6 s at sf0.1)
    val base = ensureParallelism(docs)
      .select(col(idCol), span_digests(col(textCol), k).as("wh"))
    // explode_outer, NOT explode: plain explode plants a `size(wh) > 0`
    // filter that Catalyst pushes below the repartition, re-inlining the
    // digest expression into the un-parallelized scan (computed twice,
    // once serially — PlanAuditSpec pins this). The null filter on the
    // exploded column is cheap and cannot be pushed past the Generate.
    val spans = base.select(col(idCol), explode_outer(col("wh")).as("h"))
      .filter(col("h").isNotNull).cache()
    // duplicated digests only as the build side (the line_dedup shape,
    // r22): the decision per span is one bit, so the join needs the
    // c ≥ 2 set — usually tiny vs the full per-digest count table
    val dups = spans.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("h"), lit(true).as("__dup"))
    spans.join(dups, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup"))
  }

  /**
   * Canonical-document selection per near-dup cluster ("keep best"): the
   * curation step after clustering — each cluster keeps its
   * highest-quality member (here: longest text, the common LLM-corpus
   * heuristic; ties broken by min id so the survivor is deterministic).
   *
   * Scale shape: the argmax is a single hash aggregation on a
   * `max(struct(score, -id))` — partial aggregation happens map-side, so
   * the shuffle carries one struct per (partition, cluster), never the
   * member list. No window function: a row_number-over-cluster
   * formulation would shuffle every member row to sort it, then discard
   * all but one.
   *
   * `clusters` is (idCol, cluster) as produced by [[duplicateClusters]];
   * `docs` supplies the text being scored. Returns
   * (cluster, n_members, keeper, keeper_len).
   */
  def keepBest(clusters: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val scored = clusters.join(
      docs.select(col(idCol), length(col(textCol)).cast("long").as("len")), idCol)
    scored.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("len"), (-col(idCol)).as("nid"))).as("best"))
      .select(col("cluster"), col("n_members"),
        (-col("best.nid")).as("keeper"), col("best.len").as("keeper_len"))
  }

  /**
   * Line-level dedup with rewrite (the C4/CCNet "remove duplicated
   * lines" pass, e.g. c4 drops any line seen ≥ 2 times in the corpus).
   * The driver corpus has no newlines, so a "line" here is a fixed
   * non-overlapping k-token chunk (documented divergence; the operator
   * is separator-agnostic — swap the chunking expression for
   * `split(text, '\n')` on a corpus with real lines). Unlike
   * `spanDupStats` (which only REPORTS duplicated-window counts), this
   * rewrites: chunks whose md5 digest appears in ≥ 2 distinct docs are
   * dropped and the surviving chunks are re-joined in order.
   *
   * Scale shape: one explode to n/k chunk rows, a digest groupBy
   * (shuffle key = 16-byte md5 + doc id for the distinct), an equi-join
   * back on digest, and a final per-doc groupBy whose payload is the
   * kept chunk text — the same data that must appear in the output, so
   * no amplification. The chunk projection is cached because it feeds
   * both the global count and the rewrite join.
   *
   * Returns (idCol, n_chunks, n_dropped, clean_text).
   */
  def lineDedupRewrite(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val chunks = ensureParallelism(docs)
      .select(col(idCol),
        expr(s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> t != '')")
          .as("ts"))
      .filter(size(col("ts")) > 0)
      // O(n) total HOF work per doc (n/k chunks × k-token slice) — the
      // interpreted-lambda cost that forced span_digests native is the
      // O(n·k) sliding-window shape, not this one
      .selectExpr(idCol,
        s"""posexplode(transform(
           |  sequence(0, cast(ceil(size(ts) / $k.0) AS INT) - 1),
           |  i -> array_join(slice(ts, i * $k + 1, $k), ' '))) AS (chunk, ctext)"""
          .stripMargin)
      .withColumn("h", md5(col("ctext")))
      .cache()
    // ≥ 2 *distinct docs*: within-doc repetition is span_dedup's signal;
    // the rewrite only removes cross-document boilerplate.
    // Join the chunks against ONLY the duplicated digests (nd ≥ 2), not
    // the full count table (r22, guide §3.2/§8): the old equi-join on h
    // re-shuffled every chunk's TEXT by digest just to attach nd, where
    // the decision needs one bit. The dup-digest side is the
    // boilerplate set — small on real corpora, so the join broadcasts
    // and the payload crosses exactly one exchange (the final per-doc
    // groupBy); past broadcast scale it is still a build side of
    // |duplicated digests|, not |chunks|.
    val dups = chunks.groupBy("h").agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(true).as("__dup"))
    chunks.join(dups, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          expr("transform(array_sort(collect_list(" +
            "CASE WHEN __dup IS NULL THEN struct(chunk, ctext) END)), x -> x.ctext)"),
          " ").as("clean_text"))
  }

  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.98, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val D = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    // float→double cast happens here, once per row — not per joined pair
    val b = df.select(col(idCol).as("id"), col(vecCol).cast(D).as("v"),
      vec_lsh_bucket(col(vecCol), planes, seed).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", vec_cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /**
   * Corpus snapshot diff — the dataset-versioning primitive every
   * curation pipeline needs once corpora are rebuilt on a cadence: given
   * snapshots A (old) and B (new) keyed by `idCol`, emit one row per id
   * whose membership or payload changed, with status `added` (in B
   * only), `removed` (in A only), or `changed` (both, different
   * payload). Unchanged ids — the overwhelming mass of a 100-TB
   * re-crawl — drop out before any wide output.
   *
   * Scale shape: each side projects to (id, 16-byte digest) BEFORE the
   * join, so the single shuffle carries digests, never payloads (same
   * contract as exact dedup above); the full-outer join is an equi-join
   * on the id. Pairs naturally with `Versioned` snapshots — diff two
   * resolved version dirs to audit what a rebuild changed.
   */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    // injection-proof combination: digest each column SEPARATELY (null
    // digests as "-", which no 32-hex md5 can equal), then hash the
    // fixed-width concatenation. An in-band separator scheme is forgeable
    // — web-scraped payloads legitimately contain ANY byte, so values
    // could straddle column boundaries or imitate a null sentinel; with
    // per-column digests there is no boundary to forge.
    def digested(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat(payloadCols.map(c =>
        coalesce(md5(col(c).cast("string")), lit("-"))): _*)).as(as))
    digested(a, "__da").join(digested(b, "__db"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__da").isNull, lit("added"))
          .when(col("__db").isNull, lit("removed"))
          .when(col("__da") =!= col("__db"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /**
   * Exact duplicated-span REWRITE (the Lee et al. 2022 "Deduplicating
   * Training Data Makes Language Models Better" signal as surgery,
   * suffix-array-free): every k-token window duplicated across ≥ 2
   * DISTINCT documents keeps its lowest-id occurrence and is excised
   * everywhere else — the keep-first twin of [[lineDedupRewrite]]
   * (which drops fixed chunks from every copy) at sliding-window
   * granularity, and the corpus-internal twin of
   * TextAnalysis.decontaminateScrub (same coverage machinery, the
   * "eval set" here being each span's keeper doc).
   *
   * Returns docs with ≥1 token as (idCol, n_tokens, n_scrubbed,
   * clean_text). Scale shape: window digests shuffle as (doc, digest)
   * pairs only; the per-digest (count, keeper) aggregate is digest-
   * bounded; coverage expands to ≤ hits·k positions (explode, never a
   * range join); text crosses no shuffle.
   */
  def spanDedupRewrite(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val base = ensureParallelism(docs)
      .select(col(idCol).as("doc"), col(textCol).as("__t"))
      .withColumn("ts", expr(s"filter(split(lower(__t), '[^a-z0-9]+'), x -> x != '')"))
      .filter(size(col("ts")) > 0)
      .cache()
    val wins = base.select(col("doc"),
      posexplode(span_digests(col("__t"), k)).as(Seq("w", "h")))
    val agg = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("nd"), min(col("doc")).as("keeper"))
    val starts = wins.join(agg, "h")
      .filter(col("nd") >= 2 && col("doc") =!= col("keeper"))
    scrubTokens(base, starts, idCol, k)
  }

  /** Shared scrub tail for the window-rewrite family (spanDedupRewrite,
    * TextAnalysis.decontaminateScrub): expand contaminated window starts
    * `(doc, w)` to ≤ hits·k covered positions (explode, never a range
    * join), excise those tokens from `(doc, ts)` and reassemble the rest
    * in order. Returns (idCol, n_tokens, n_scrubbed, clean_text). */
  private[graft] def scrubTokens(docsTs: DataFrame, winStarts: DataFrame,
      idCol: String, k: Int): DataFrame = {
    val scrubPos = winStarts
      .select(col("doc"), explode(expr(s"sequence(w, w + ${k - 1})")).as("p"))
      .distinct()
      .withColumn("__hit", lit(1))
    docsTs.select(col("doc"), posexplode(col("ts")).as(Seq("p", "tok")))
      .join(scrubPos, Seq("doc", "p"), "left")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_scrubbed"),
        array_join(expr("transform(array_sort(collect_list(" +
          "CASE WHEN __hit IS NULL THEN struct(p, tok) END)), x -> x.tok)"),
          " ").as("clean_text"))
  }

  /**
   * Content-defined chunking (the LBFS/rsync/FastCDC family): split each
   * document at rolling-hash boundaries (`HashFunctions.cdcCuts`) and
   * digest every chunk. Boundaries depend only on a `w`-char local
   * window, so an insertion or deletion early in a document perturbs
   * only the chunks containing the edit — every later chunk keeps its
   * content AND its digest, which is exactly what fixed-offset chunking
   * (doc_chunk, span windows) cannot give you. That makes the chunk
   * digest table the shift-robust dedup/delta primitive: join it to
   * itself on `digest` to find shared runs between near-identical
   * documents regardless of alignment.
   *
   * Returns (idCol, chunk_id, c_start, c_len, digest): 1-based char
   * offsets, md5 hex of the chunk substring. Scale shape: one narrow
   * codegen'd pass per doc (the cuts expression) + one explode stage —
   * output rows ≈ corpus_bytes / mask, no shuffle, no join.
   */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, mask: Int = 64): DataFrame = {
    require(w > 0 && mask > 0)
    graft.functions.HashFunctions.register(df.sparkSession)
    df.select(col(idCol), col(textCol).as("__t"),
        concat(array(lit(0)), cdc_cuts(col(textCol), w, mask),
          array(length(col(textCol)))).as("__b"))
      .select(col(idCol), col("__t"), col("__b"),
        explode(sequence(lit(0), size(col("__b")) - 2)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        (element_at(col("__b"), col("chunk_id") + 1) + 1).cast("long").as("c_start"),
        (element_at(col("__b"), col("chunk_id") + 2) -
          element_at(col("__b"), col("chunk_id") + 1)).cast("long").as("c_len"),
        md5(expr("substring(__t, element_at(__b, CAST(chunk_id AS INT) + 1) + 1, " +
          "element_at(__b, CAST(chunk_id AS INT) + 2) - element_at(__b, CAST(chunk_id AS INT) + 1))"))
          .as("digest"))
      .filter(col("c_len") > 0)
  }
}
