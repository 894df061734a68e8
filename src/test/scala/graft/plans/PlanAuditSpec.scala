package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/**
 * Executable form of docs/PLANS.md: the physical-plan properties the
 * 100 TB design relies on, pinned so a refactor that silently degrades a
 * plan (dropped pushdown, broadcast flipped to shuffle, an extra exchange
 * in a hot path) fails CI instead of only showing up in the benchmark.
 */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q6_filter: predicates and projection reach the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters on the scan")
    assert(p.contains("l_quantity"), "filter column missing from scan")
    // pruned read schema: none of the 12 unprojected lineitem columns
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
      "scan reads columns the query never uses")
  }

  test("q2_join: dimension joins broadcast at test SF, no cartesian") {
    val p = plan("q2_join")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dimension joins")
    assert(!p.contains("CartesianProduct"), "accidental cartesian product")
  }

  test("q3_topk: top-k compiles to TakeOrderedAndProject, no global sort") {
    val p = plan("q3_topk")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort not fused to top-k")
  }

  test("bucketed_join: the join itself is shuffle-free (co-located buckets)") {
    // force the sort-merge path (broadcast would hide whether bucketing
    // removed the exchange) and inspect the bare join, pre-aggregation
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bspec_").toString
      import org.apache.spark.sql.functions._
      graft.sources.BucketedTable.write(s,
        s.read.parquet(sf("lineitem")).select(col("l_orderkey"), col("l_quantity")),
        "graft_li_bspec", "l_orderkey", 4, s"$tmp/li")
      graft.sources.BucketedTable.write(s,
        s.read.parquet(sf("orders")).select(col("o_orderkey"), col("o_orderstatus")),
        "graft_o_bspec", "o_orderkey", 4, s"$tmp/o")
      val join = s.table("graft_li_bspec")
        .join(s.table("graft_o_bspec"), col("l_orderkey") === col("o_orderkey"))
      val p = join.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // and it computes the same rows as the unbucketed join
      val raw = s.read.parquet(sf("lineitem")).select(col("l_orderkey"))
        .join(s.read.parquet(sf("orders")).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(join.count() == raw)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("profile_table_approx: no distinct expansion, bounded exchanges, partial aggs") {
    val p = plan("profile_table_approx")
    // the exact profile pays one Expand + a distinct shuffle per column;
    // the approx shape must have NO Expand and no distinct aggregate
    assert(!p.contains("Expand"), s"distinct expansion leaked into the plan:\n$p")
    assert(!p.toLowerCase.contains("distinct"), "exact distinct in the approx profile")
    // both aggregation levels are partial before their exchange, so every
    // exchange carries ≤ |cols|·(m+1) rows per map partition
    assert(p.contains("partial"), "no map-side partial aggregation")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"more exchanges than the two agg levels + sort:\n$p")
  }

  test("q1_agg: partial (map-side) aggregation before the exchange") {
    val p = plan("q1_agg")
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // plans print top-down: the FINAL agg appears first, the exchange
    // between it and the partial agg below — partial must exist after it
    assert(p.indexOf("HashAggregate", exchange) > exchange,
      "no map-side partial aggregation below the shuffle")
  }

  test("ann_ivf: cell assignment adds no exchange; probes broadcast; top-k is partial") {
    val p = plan("ann_ivf")
    assert(p.contains("BroadcastHashJoin"), "probe join must broadcast")
    assert(p.contains("WindowGroupLimit"), "per-query top-k not pushed into WindowGroupLimit")
    assert(!p.contains("SortMergeJoin"), "candidate join degraded to sort-merge")
    // the serve reads the REGISTRY-CACHED assignments (r12: assign once
    // per corpus identity, serve many — the r11 full-corpus rescan fix)
    assert(p.contains("InMemoryTableScan"),
      "corpus assignment must come from the AssignedCorpus cache")
    // exactly: broadcast exchange (probes), hash exchange (top-k final),
    // range exchange (output order) — plus the cache BUILD's one-time
    // range-clustering exchange, which lives below the InMemoryRelation
    // and is paid once per (corpus, quantizer), never per serve
    val exchanges = "(?m)^\\s*(?:[:+\\- ]*)Exchange ".r.findAllIn(p).length +
      "BroadcastExchange".r.findAllIn(p).length
    assert(exchanges <= 5, s"unexpected exchanges in plan ($exchanges)")
  }

  test("dedup_minhash: signatures computed before banding explode, not after") {
    val p = plan("dedup_minhash")
    val gen = p.indexOf("Generate explode")
    assert(gen >= 0, "banding explode missing")
    assert(p.indexOf("minhash_sig", gen) > gen || p.contains("InMemoryTableScan"),
      "signature must be computed below the explode (once per doc, not per band)")
  }

  test("range_join: band join stays an equi-join — no nested-loop fallback") {
    val p = plan("range_join")
    assert(!p.contains("CartesianProduct"), "band join degraded to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "band join degraded to nested loop — the θ-condition must ride the bucket equi-join")
    assert(p.contains("Generate explode"), "left-side bucket explode missing")
  }

  test("cms_topk: probe join broadcasts, never cartesian") {
    val p = plan("cms_topk")
    assert(p.contains("BroadcastHashJoin"), "probe↔sketch join must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("tfidf_top: tf table cached once, both join sides read the cache") {
    val p = plan("tfidf_top")
    assert(p.contains("InMemoryTableScan"),
      "tf cache boundary missing — both join sides would re-run the explode")
  }

  test("stratified_sample: scan prunes the text column, filter needs no shuffle") {
    val q = SparkEntry.queries("stratified_sample")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("text"), "sampling filter must not read the text column")
  }

  test("bottomk_sample: rank filter pushed below the exchange (WindowGroupLimit)") {
    val p = plan("bottomk_sample")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune map-side — each partition ships at most k rows/group")
  }

  test("skew_join: salted join spreads keys without changing the aggregate") {
    val p = plan("skew_join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"), "right-side salt replication missing")
  }

  test("ngram jaccard dispatcher: the large-corpus path never collects gram sets to the driver") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // above-gate dispatch (gate forced to 0): pure DataFrame plan — no
    // parallelized-from-driver scan, which is the dense plan's signature
    val sparse = Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text",
      broadcastMaxBytes = 0L)
    val sp = sparse.queryExecution.executedPlan.toString
    assert(!sp.contains("Scan ExistingRDD"),
      "large-corpus dispatch still builds a driver-broadcast RDD plan")
    assert(sp.contains("SortMergeJoin") || sp.contains("ShuffledHashJoin") ||
      sp.contains("BroadcastHashJoin"), "sparse plan lost its inverted-index join")
    // below-gate dispatch: the dense broadcast loop (driver-bounded by
    // the gate) shows up as a parallelized RDD scan
    val dense = Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text",
      broadcastMaxBytes = Long.MaxValue)
    assert(dense.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
      "small-corpus dispatch should take the dense broadcast loop")
  }

  test("ngram_jaccard_prefix: verify step broadcasts the set table under the gate") {
    val p = plan("ngram_jaccard_prefix")
    // r6 finding: sort-merge verify sorts ~KB gram arrays through shuffle
    // spill (disk exhaustion at 50k docs) — under the 1 GB gate both
    // verify joins must be broadcast hash joins over the cached sets
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2,
      s"verify joins must broadcast the set table (saw $broadcasts broadcast joins)")
    assert(p.contains("InMemoryTableScan"), "set table must be cached")
  }

  test("budget_sample: global prefix sum never uses an unpartitioned window") {
    val p = plan("budget_sample")
    // the whole point of tokenBudgetSample: cum-sum windows are
    // partitioned by __pid; an Exchange SinglePartition means the naive
    // global window snuck back in and one task processes the corpus
    assert(!p.contains("SinglePartition"),
      "budget_sample degraded to a single-partition global window")
    assert(p.contains("Window"), "cumulative-sum window missing")
  }

  test("bigram_novelty: shared explode lineage cached — both branches read the cache") {
    val p = plan("bigram_novelty")
    assert(p.contains("InMemoryTableScan"),
      "bigram cache boundary missing — vocab and probe branches would re-run the explode")
  }

  test("ann_pq: vectors never shuffle; top-k pushes into WindowGroupLimit") {
    val p = plan("ann_pq")
    // the ONLY join is the intended broadcast cross-scan (queries × corpus,
    // like the brute-force baseline); codes/dtable ride the scan
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "PQ scan degraded to a shuffled or cartesian join")
    assert(p.contains("WindowGroupLimit"), "per-query top-k not map-side limited")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 1, s"PQ plan grew $hashExchanges hash exchanges — " +
      "corpus vectors must not shuffle (only the final window may)")
  }

  test("contamination_overlap: eval fingerprints broadcast; probe side reads the fp cache") {
    val p = plan("contamination_overlap")
    assert(p.contains("BroadcastHashJoin"), "eval fp set must broadcast into the probe join")
    assert(p.contains("InMemoryTableScan"),
      "fingerprint explode must be cached — eval and probe branches share it")
    assert(!p.contains("CartesianProduct"))
  }

  test("quality_classify: one narrow codegen'd map — no join, no agg, pruned scan") {
    val p = plan("quality_classify")
    assert(!p.contains("Join"), "classifier must not join anything")
    assert(!p.contains("HashAggregate"), "classifier must not aggregate")
    // the only exchanges are the small-input RoundRobin spread (a no-op at
    // real scale, see Par.ensureParallelism) and the output orderBy —
    // the scoring itself never shuffles
    val ex = "Exchange".r.findAllIn(p).size
    assert(ex <= 2, s"classifier plan has $ex exchanges:\n$p")
    assert(p.contains("rangepartitioning"), "missing the output-sort exchange")
    // scan prunes to the two columns the classifier reads
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan reads columns the classifier never uses")
    // the score is evaluated inside a Project (whole-stage codegen), not
    // a fallback wrapper
    assert(p.linesIterator.exists(l =>
      l.contains("quality_score(") && l.contains("Project [")),
      "quality_score not evaluated in a projection")
  }

  test("tokenize_bpe: one narrow codegen'd encode stage — no join, no agg, pruned scan") {
    // real BPE is a per-row map: the merge loop runs inside the fused
    // projection (memo-cached per executor), never as a UDF or a shuffle
    val p = plan("tokenize_bpe")
    assert(!p.contains("Join"), "tokenizer must not join anything")
    assert(!p.contains("HashAggregate"), "tokenizer must not aggregate")
    val ex = "Exchange".r.findAllIn(p).size
    assert(ex <= 1, s"tokenize plan has $ex exchanges (only the output sort is allowed):\n$p")
    assert(p.contains("rangepartitioning"), "missing the output-sort exchange")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan reads columns the tokenizer never uses")
    assert(p.linesIterator.exists(l =>
      l.contains("bpe_encode(") && l.contains("Project [")),
      "bpe_encode not evaluated in a projection")
  }

  test("ann_pq_reranked: both stages broadcast the bounded side; no cartesian; pruned cells") {
    val p = plan("ann_pq_reranked")
    assert(!p.contains("CartesianProduct"), "accidental cartesian product")
    // stage 1 broadcasts the probe table, stage 2 the shortlist + queries:
    // every join in the serve is a BroadcastHashJoin (the index side is
    // never shuffled)
    assert(!p.contains("SortMergeJoin"),
      s"a serve join fell back to sort-merge — an index-side shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast serve joins")
  }

  test("multimodal_audio: one narrow decode stage — no join, no agg, bounded exchanges") {
    // the audio featurizer is the same 100-TB shape as the image path: a
    // row-linear mapPartitions decode whose only exchanges are the
    // small-input spread and the output sort — audio features of N rows
    // must never shuffle N payloads
    val p = plan("multimodal_audio")
    assert(!p.contains("Join"), "audio featurizer must not join anything")
    assert(!p.contains("HashAggregate"), "audio featurizer must not aggregate")
    val ex = "Exchange".r.findAllIn(p).size
    assert(ex <= 2, s"audio plan has $ex exchanges:\n$p")
    assert(p.contains("MapPartitions"), "decode stage missing from the plan")
  }

  test("events_anomaly: aggregation to hourly grain runs below the window") {
    val p = plan("events_anomaly")
    // the hourly HashAggregate must sit under the Window operator, so the
    // window pass covers |types|·|hours| rows, never raw events
    val win = p.indexOf("Window")
    assert(win >= 0, "missing window operator")
    assert(p.indexOf("HashAggregate", win) > win,
      "no aggregate below the window — the window would scan raw events")
    assert(!p.contains("Join"), "anomaly detection must not join")
    assert(p.contains("TakeOrderedAndProject"), "top-20 not fused to top-k")
  }

  test("pipeline_pretrain: chunk stage carries source — no join to recover it") {
    val p = plan("pipeline_pretrain")
    assert(!p.contains("Join"),
      "pipeline must thread source through chunking, not join it back")
    assert(p.contains("Generate"), "missing the chunk explode")
    assert(p.contains("quality_score("), "missing the classifier gate")
  }

  test("cdc_chunks: one cuts pass + one explode — no join, no exchange") {
    val p = plan("cdc_chunks")
    assert(!p.contains("Join"), "chunking must not join")
    assert(p.contains("Generate"), "missing the chunk explode")
    // the only exchange allowed is the final presentation orderBy's
    // range partitioning — nothing hash-partitions
    assert(!p.contains("hashpartitioning"),
      "chunking introduced a hash shuffle")
  }

  test("text_normalize: a pure projection — no explode, no agg, no exchange beyond the sort") {
    val p = plan("text_normalize")
    assert(!p.contains("Join") && !p.contains("Generate") &&
      !p.contains("HashAggregate"), "normalize must stay a narrow map")
    assert(!p.contains("hashpartitioning"), "normalize introduced a shuffle")
  }

  test("lm_score: corpus scoring is joins-free (literal ratio table), one narrow map") {
    val p = plan("lm_score")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastHashJoin"),
      "lm_score scoring must read the ratio table as a literal, not join it")
    assert(!p.contains("Generate"),
      "scoring must not explode the code arrays (aggregate() folds in place)")
  }

  test("cluster_balance: one narrow assignment map + one cell-keyed window, no join") {
    val p = plan("cluster_balance")
    assert(!p.contains("Join"), "assignment must use the literal centroid table")
    assert(p.contains("Window"), "missing the per-cell rank window")
    assert(p.contains("vec_ivf_cells_l2"), "missing the quantizer assignment")
  }

  test("repetition_stats: pure two-level aggregation — no join, partial agg below the shuffle") {
    val p = plan("repetition_stats")
    assert(!p.contains("Join"), "repetition stats must not join anything")
    val exchange = p.indexOf("Exchange")
    assert(exchange >= 0 && p.indexOf("HashAggregate", exchange) > exchange,
      "no map-side partial aggregation below the shuffle")
  }

  test("span_dedup: only (doc_id, digest) cross shuffles; both consumers read the cache") {
    val p = plan("span_dedup")
    // the digest expression must be computed exactly once per doc, in a
    // Project above the parallelizing repartition — never re-inlined into
    // a Filter (plain explode's size(wh)>0 pruning did exactly that,
    // running the digest loop twice with one pass on the serial scan)
    p.linesIterator.filter(_.contains("span_digests(")).foreach { l =>
      assert(l.contains("Project ["),
        s"span_digests re-inlined outside a projection: $l")
    }
    // ...and that Project sits above the RoundRobin spread, so the
    // CPU-heavy loop runs on all cores, not the single-row-group scan
    val proj = p.indexOf("span_digests(")
    val rr = p.indexOf("RoundRobinPartitioning", proj)
    assert(proj >= 0 && rr > proj,
      "digest projection not above the parallelizing repartition")
    // the (doc_id, h) projection is cached and feeds BOTH the global
    // count and the per-doc join (no double tokenization)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      "span pairs not cached for both consumers")
  }

  test("line_dedup: equi-join on digest, chunk cache feeds both consumers, no cartesian") {
    val p = plan("line_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "line_dedup fell back to a non-equi join")
    // the exploded chunk projection is cached and read by BOTH the
    // distinct-doc count and the rewrite join (no double tokenization)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      "chunk projection not cached for both consumers")
  }

  test("events_funnel: conditional mins aggregate partially before the exchange") {
    val p = plan("events_funnel")
    // both groupBys (per-user mins, stage counts) must show a partial
    // aggregation below their exchange — the map-side combine is what
    // keeps the shuffle user-count-sized at 100 TB
    val partials = "partial_min|partial_count".r.findAllIn(p).size
    assert(partials >= 2, s"missing partial aggregation:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("partition_prune: the lang filter is a PartitionFilter, not a row filter") {
    val p = plan("partition_prune")
    assert(p.contains("PartitionFilters"), "no partition filters on the scan")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("lang"), s"lang not pruned at partition level: $pf")
  }

  test("dedup_semantic: cell self-join is an equi-join; anti-join carries ids only") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell check fell back to an all-pairs join")
    assert(p.contains("LeftAnti"), "survivor selection must be a left-anti join")
    // centroid closure is a foldable literal — assignment adds no exchange
    // beyond the parallelizing spread + the self-join/anti-join pair
    assert(p.contains("InMemoryTableScan"),
      "assigned projection not cached across self-join sides")
  }

  test("ivf serve: the index scan's file list is the _cellmap manifest, not discovery") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val s = spark
    Similarity.TrainedIndex.invalidate()
    val emb = s.read.parquet(sf("embeddings"))
    val idx = java.nio.file.Files.createTempDirectory("graft_manifestpin_")
      .toString + "/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", idx,
      indexKey = "pin-manifest")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(s.sessionState.newHadoopConf())
    // plant an UNCOMMITTED data file in every cell dir — the exact debris
    // an append killed before its manifest write leaves behind: present on
    // disk, absent from _cellmap
    val planted = new java.io.File(idx).listFiles
      .filter(_.getName.startsWith("cell="))
      .map { d =>
        val src = d.listFiles.filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(d, s"part-uncommitted-${d.getName}.parquet")
        java.nio.file.Files.copy(src.toPath, dst.toPath)
        dst.toString
      }
    assert(planted.nonEmpty)
    val q = emb.filter(col("vec_id") < 5)
    val served = Similarity.ivfTopKServed(s, idx, q, "vec_id", "embedding",
      k = 3, indexKey = "pin-manifest")
    // 1) the executed scan reads ONLY manifest-committed files
    val manifestFiles = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$idx/${Similarity.CellMapFile}"))
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      txt.split('\n').filter(l => l.nonEmpty && l.contains('\t'))
        .map(l => s"$idx/${l.substring(l.indexOf('\t') + 1)}").toSet
    }
    val scanned = served.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned.nonEmpty)
    assert(!scanned.exists(_.contains("uncommitted")),
      s"serve scanned an uncommitted file: ${scanned.find(_.contains("uncommitted"))}")
    assert(scanned.subsetOf(manifestFiles),
      s"scan reads files outside the manifest: ${scanned.diff(manifestFiles).take(3)}")
    // 2) the manifest header carries the schema, so building the serve
    // plan costs no footer-inference or listing job
    val in2 = fs.open(new org.apache.hadoop.fs.Path(s"$idx/${Similarity.CellMapFile}"))
    val txt2 = try scala.io.Source.fromInputStream(in2).mkString finally in2.close()
    assert(txt2.startsWith(Similarity.CellMapSchemaPrefix),
      "manifest must lead with its schema header")
    // 3) non-vacuity: without the manifest, directory discovery DOES see
    // the planted files — proving the committed view above was the
    // manifest's doing, not the debris being invisible
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/${Similarity.CellMapFile}"), false)
    val fallback = Similarity.ivfTopKServed(s, idx, q, "vec_id", "embedding",
      k = 3, indexKey = "pin-manifest")
    assert(fallback.inputFiles.exists(_.contains("uncommitted")),
      "fallback discovery should surface the planted debris")
    Similarity.TrainedIndex.invalidate()
  }

  test("dsir_select: score stage is a narrow map (no join); bucket counts pre-aggregate map-side") {
    import org.apache.spark.sql.functions.{col, explode}
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the per-doc score plan: a literal ratio table folded in a map — any
    // Join here would mean the 256-entry table was joined, not planted
    val out = TextAnalysis.dsirSelect(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 16)
    // the final frame joins scores with the kept set (one broadcast) —
    // but NO SortMergeJoin anywhere: every join in the operator must stay
    // broadcast (batch keys / kept ids are the bounded sides)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      "dsir_select must not sort-merge anything — bounded sides broadcast")
    // the distribution estimate: explode → partial agg BELOW the exchange
    // (256-bounded shuffle), the shape that keeps 10M bigrams from
    // crossing the wire
    graft.functions.HashFunctions.register(spark)
    val counts = docs
      .select(explode(graft.functions.HashFunctions.bigram_buckets(
        col("text"), 16)).as("bkt"))
      .groupBy(col("bkt")).count()
    val cp = counts.queryExecution.executedPlan.toString
    val exchange = cp.indexOf("Exchange")
    assert(exchange >= 0 && cp.indexOf("HashAggregate", exchange) > exchange,
      "bucket counts must partially aggregate before the shuffle")
  }

  test("merge readKeys / tombstone serve: bounded sides stay broadcast or pushed") {
    // merge_lookup at sf0.001 has ≤64 keys → the In predicate must reach
    // the parquet scan (second-level pruning via key-sorted row groups);
    // larger key sets switch to a broadcast semi-join — never sort-merge
    val p = plan("merge_lookup")
    assert(p.contains("PushedFilters: [In(doc_id") ||
      p.contains("BroadcastHashJoin"),
      "key probe must push down or broadcast")
    assert(!p.contains("SortMergeJoin"), "lookup must not sort-merge the table")
    // ann_ivf_deleted: the tombstone mask is a broadcast LEFT ANTI join
    val pd = plan("ann_ivf_deleted")
    assert(pd.contains("LeftAnti"), "tombstone mask missing from the serve plan")
    assert(!pd.contains("SortMergeJoin"),
      "tombstone mask must broadcast, not sort-merge")
  }

  test("merge_range: zone-pruned scan reads a strict file subset; bounds push to parquet") {
    // the zone map is manifest-level skipping ABOVE parquet's own stats:
    // the executed scan must read only zone-overlapping files, and the
    // exact BETWEEN must still reach the scan so row-group stats skip
    // within the survivors (the key-sorted layout's second level)
    val df = SparkEntry.queries("merge_range")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ") && p.contains("GreaterThanOrEqual(doc_id")
      && p.contains("LessThanOrEqual(doc_id"),
      "range bounds did not push to the parquet scan")
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }).sum
    // the merged table holds 16 base buckets + the merge's rewrites; the
    // [300, 10000100] range must exclude at least the low-id-only files
    val root = new java.io.File(System.getProperty("java.io.tmpdir")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_merge_v5_") &&
        f.getName.contains("sf0_001"))
      .maxBy(_.lastModified).toString
    val all = graft.sinks.MergeTable.rangeFiles(spark, root, None, None).size
    assert(scanned < all,
      s"zone map pruned nothing: scanned $scanned of $all manifest files")
  }

  test("bm25_bool_served: MUST seeds broadcast semi-join, MUST_NOT anti-joins, top-k fuses") {
    val p = plan("bm25_bool_served")
    assert(p.contains("LeftSemi"), "MUST seed semi-join missing")
    assert(p.contains("LeftAnti"), "MUST_NOT exclusion anti-join missing")
    assert(p.contains("TakeOrderedAndProject"),
      "boolean top-k must fuse limit+sort")
    assert(!p.contains("CartesianProduct"), "accidental cartesian")
    // the idf table rides as a broadcast, never a shuffle side
    assert(p.contains("BroadcastHashJoin"), "idf join must broadcast")
  }

  test("bm25_not_served / dismax / msm: one aggregate, broadcast idf, fused top-k") {
    Seq("bm25_not_served", "bm25_dismax_served", "bm25_msm_served")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("TakeOrderedAndProject"), s"$q: top-k not fused")
        assert(p.contains("BroadcastHashJoin"), s"$q: idf join must broadcast")
        assert(!p.contains("CartesianProduct"), s"$q: accidental cartesian")
      }
  }

  test("search_response: page decorate is a point lookup — ids pushed to the corpus scan") {
    val p = plan("search_response")
    // r17 shape: the bounded page collects once and its ids push down to
    // the documents scan as an In filter (row-group zone-map pruning),
    // so the decorate/snippet stages read ~one row group per hit at any
    // corpus size — the flat-per-page contract (BASELINE.md r17)
    assert(p.contains("PushedFilters: [In(doc_id"),
      "page ids must push into the corpus parquet scan")
    assert(p.contains("BroadcastHashJoin"),
      "the 10-hit page must broadcast into the decoration joins")
    assert(!p.contains("CartesianProduct"), "accidental cartesian")
  }

  test("prefix_search_deleted: corrections join broadcasts; no postings scan in the plan") {
    val df = SparkEntry.queries("prefix_search_deleted")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "dead-term corrections must ride a broadcast join")
    assert(!df.inputFiles.exists(_.contains("/postings/")),
      "tombstoned wildcard count read postings — dictionary path lost")
  }

  test("suggest_complete: dictionary-only (no postings), top-k via TakeOrdered not a global sort") {
    val df = SparkEntry.queries("suggest_complete")(spark, sfDir)
    assert(!df.inputFiles.exists(_.contains("/postings/")),
      "completion suggester read postings — the dictionary path lost")
    val unpartitioned = allPlanNodes(df.queryExecution.executedPlan)
      .collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
    assert(unpartitioned.isEmpty, "completion ranked through a global window")
  }

  test("bm25_filtered_served: the filter joins the candidate set via docvals, never the corpus") {
    val df = SparkEntry.queries("bm25_filtered_served")(spark, sfDir)
    // the structured predicate reads the doc-values sidecar only — the
    // corpus parquet (documents.parquet) must be absent from the scan set
    assert(df.inputFiles.exists(_.contains("/docvals/")),
      "filter must read the docvals sidecar")
    assert(!df.inputFiles.exists(_.contains("documents.parquet")),
      "filtered serve scanned the CORPUS — the filter context must stay " +
        "on the index")
    // the semi-join intersects candidates BEFORE the scoring aggregate
    // (optimizedPlan prints top-down: Aggregate above the LeftSemi)
    val opt = df.queryExecution.optimizedPlan.toString
    val semiAt = opt.indexOf("LeftSemi")
    val aggAt = opt.indexOf("Aggregate")
    assert(semiAt >= 0 && aggAt >= 0 && aggAt < semiAt,
      s"filtered-out docs must never reach the scoring aggregate:\n$opt")
    // and the predicate pushes down to the docvals parquet scan
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(lang)"),
      "docvals predicate must push to the parquet scan")
  }

  test("bm25_multifield_served: per-field frames broadcast idf; combiner adds one exchange, no corpus scan") {
    val df = SparkEntry.queries("bm25_multifield_served")(spark, sfDir)
    assert(!df.inputFiles.exists(_.contains("documents.parquet")),
      "multi-field serve must read only the two field indexes")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "idf joins must broadcast (bounded query-term side)")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "no cross-field cartesian")
  }

  test("search_collapsed: windows run over candidates only — no corpus scan, docvals for the key") {
    val df = SparkEntry.queries("search_collapsed")(spark, sfDir)
    // the candidates frame is PERSISTED (it feeds the top-groups
    // collect and the final join — two actions that cannot share a
    // ReusedExchange), so the file evidence sits inside the cached
    // plan, not df.inputFiles — and AQE hides everything from a naive
    // collect, hence allPlanNodes
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    val imts = nodes.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        => s
    }
    assert(imts.nonEmpty, "the collapse serve must reuse the cached " +
      "candidates frame (two actions over one scoring pass)")
    // file evidence from the scan nodes themselves (toString truncates
    // locations): allPlanNodes already descended into the cached plan
    val scanPaths = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scanPaths.exists(_.contains("docvals")),
      s"collapse key must come from the docvals sidecar, scans: $scanPaths")
    assert(!scanPaths.exists(_.contains("documents.parquet")) &&
      !df.inputFiles.exists(_.contains("documents.parquet")),
      "collapse scanned the CORPUS — the response path must stay on " +
        "the index")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the top-groups join must broadcast (≤ k rows)")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "no cartesian in the collapse path")
    // group ranking must be TakeOrdered+driver-rank, never a global
    // row_number: an unpartitioned WindowExec pushes one row per
    // distinct collapse key through a single task — checked through
    // AQE wrappers AND the cached candidates plan
    val unpartitioned = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"collapse executed an UNPARTITIONED window: $unpartitioned")
    // the per-key window IS there (partitioned) — proof the traversal
    // actually sees through the AQE/cache wrappers
    assert(nodes.exists {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.nonEmpty
      case _ => false
    }, "traversal failed to reach the per-key inner_rank window")
  }

  test("cross_fields / synonym serves: candidates only, broadcast blends, no corpus scan") {
    Seq("bm25_multifield_cross_served", "bm25_synonym_served").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(!df.inputFiles.exists(_.contains("documents.parquet")),
        s"$q read the corpus — blending must stay on the indexes")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the idf/group join must broadcast (bounded term side)")
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q: no cartesian")
    }
  }

  test("search_geo_distance: bbox pushes to the docvals scan, top-k fuses, no corpus read") {
    val df = SparkEntry.queries("search_geo_distance")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "geo distance top-k must fuse, never a global sort")
    assert(df.inputFiles.exists(_.contains("/docvals/")),
      "coordinates must come from the docvals sidecar")
    assert(!df.inputFiles.exists(_.contains("documents.parquet")),
      "geo serve scanned the CORPUS — coordinates live on the index")
    // the conservative bounding box is a plain range predicate and must
    // reach the sidecar's parquet scan (row-group pruning at scale)
    assert(p.contains("GreaterThanOrEqual(lat") ||
      p.contains("PushedFilters: [IsNotNull(lat"),
      s"bbox must push down to the docvals scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "no cartesian")
    // geo_bbox / grid / rings: index-only reads
    Seq("search_geo_bbox", "search_geohash_grid").foreach { q =>
      val d = SparkEntry.queries(q)(spark, sfDir)
      assert(!d.inputFiles.exists(_.contains("documents.parquet")),
        s"$q read the corpus — the serve must stay on the index")
    }
  }

  test("phrase_prefix / explain / agg-family additions: index-only reads, no corpus scan") {
    Seq("phrase_prefix_served", "search_explain",
      "search_cardinality_agg", "search_filters_agg",
      "search_composite_agg", "search_adjacency_matrix",
      "search_histogram_pipeline", "search_date_histogram",
      "search_date_histogram_week", "search_moving_agg",
      "span_not_served", "span_or_served", "search_serial_diff",
      "search_bucket_script", "search_bucket_selector",
      "search_date_range", "search_multi_terms", "search_rare_terms",
      "search_distance_feature", "search_percentile_ranks",
      "search_intervals", "search_geo_centroid",
      "search_matrix_stats", "search_rank_feature",
      "search_more_like_this", "search_after",
      "search_geo_distance_agg", "search_date_histogram_offset",
      "search_date_histogram_tz",
      "search_date_histogram_bounds").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(!df.inputFiles.exists(_.contains("documents.parquet")),
        s"$q read the corpus — the serve must stay on the index")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q: no cartesian")
    }
  }

  test("query_string serves: bool shape holds (seed semi, exclusion anti, broadcast idf, fused top-k), no corpus scan") {
    Seq("query_string_served", "query_string_group_served",
      "query_string_fields_served").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(!df.inputFiles.exists(_.contains("documents.parquet")),
        s"$q read the corpus — the parse lowering must stay on the index")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("LeftSemi"), s"$q: MUST seed semi-join missing")
      assert(p.contains("LeftAnti"), s"$q: exclusion anti-join missing")
      assert(p.contains("BroadcastHashJoin"), s"$q: idf join must broadcast")
      assert(p.contains("TakeOrderedAndProject"), s"$q: top-k not fused")
      assert(!p.contains("CartesianProduct"), s"$q: accidental cartesian")
    }
  }

  test("match-set aggs: postings probe + docvals join only — the corpus text never read") {
    Seq("search_range_agg", "search_histogram_agg", "search_stats_agg",
      "search_terms_stats_agg", "search_top_hits_agg").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      // scan evidence via allPlanNodes, not inputFiles: the collapse
      // serve persists its candidates frame, and the cache manager
      // substitutes that InMemoryRelation into ANY later plan sharing
      // the scored⋈docvals subtree — the docvals scan then lives
      // inside the cached plan, invisible to inputFiles
      val paths = allPlanNodes(df.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
      assert(paths.exists(_.contains("docvals")),
        s"$q must read the docvals sidecar, scans: $paths")
      assert(!paths.exists(_.contains("documents.parquet")) &&
        !df.inputFiles.exists(_.contains("documents.parquet")),
        s"$q scanned the corpus — aggs must stay on the index")
    }
  }

  test("search_rescored: window ids push into the positional read as In filters") {
    val df = SparkEntry.queries("search_rescored")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the rescore stage reads postings restricted to the collected
    // window — the In(doc_id, ...) literal reaches the parquet scan,
    // so the phrase fold's input is window-bounded at any corpus size
    assert(p.contains("In(doc_id") || p.contains("doc_id IN"),
      s"window ids must reach the postings scan as a literal filter:\n$p")
    assert(!df.inputFiles.exists(_.contains("documents.parquet")),
      "rescore must stay on the index")
    assert(!p.contains("CartesianProduct"), "accidental cartesian")
  }
}
