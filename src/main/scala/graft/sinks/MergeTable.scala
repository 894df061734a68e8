package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Keyed versioned table with copy-on-write MERGE at bucket granularity —
 * the upsert/delete verb the engine's corpus stores were missing, shaped
 * like the table-format pattern (Delta/Iceberg): immutable shared data
 * files + per-version FILE MANIFESTS, so a merge rewrites only the hash
 * buckets its batch touches and every other file is CARRIED by name into
 * the new version. Bytes rewritten ∝ touched buckets ≈ batch spread, not
 * corpus — the property that makes row-level updates viable at 100 TB,
 * where `Versioned.writeVersioned` (whole-dataset versions) would pay a
 * full rewrite per batch. Because a merge rewrites touched buckets
 * WHOLESALE (never appends within one), the live manifest is
 * self-compacting: it holds ≤ nBuckets files forever, and the only
 * sprawl is dead files from superseded versions — `vacuumData`'s job,
 * not a compaction pass's (MergeTableSpec pins this).
 *
 * Layout:
 * ```
 * root/
 *   _current           <- Versioned pointer: the live version name
 *   data/bucket=<b>/   <- shared immutable part files, all versions
 *   v-<uuid>/_files    <- manifest: schema + bucket count + file list
 * ```
 *
 * Commit discipline is exactly the Versioned layout's: data files land
 * first (Spark's file committer; unreferenced until a manifest names
 * them), the new version dir materializes its `_files` manifest, and the
 * pointer swap through `Versioned.commit` is the single atomic commit
 * point. A crash anywhere before the swap leaves the previous version
 * fully served; stranded data files are swept by [[vacuumData]] (never
 * at commit time — old versions keep reading until `Versioned.vacuum`).
 * Single maintenance writer, like every sink in this package; CAS
 * deployments plug `Versioned.setConditionalPut`.
 *
 * Bucketing is `pmod(xxhash64(key), nBuckets)` — deterministic across
 * runs and engines, so batch keys locate their buckets without touching
 * the base table. `nBuckets` is set at [[publish]] time and recorded in
 * every manifest; a table that outgrows it is re-laid-out in place by
 * [[rebucket]] (a full rewrite under the same manifest-swap commit — the
 * old bucketing stays servable through any crash).
 */
object MergeTable {

  val ManifestFile = "_files"
  private val SchemaPrefix = "#schema="
  private val BucketsPrefix = "#buckets="
  private val KeyPrefix = "#key="
  private val LayoutPrefix = "#layout="

  /** Streaming watermark: the highest `mergeExactlyOnce` batch id folded
    * in, stored INSIDE each version dir so id and data commit atomically
    * on the pointer swap (the Rollup.refreshExactlyOnce discipline).
    * Plain merges CARRY the live version's id forward, so interleaving
    * ad-hoc maintenance with a CDC stream cannot reopen replay windows. */
  private val BatchIdFile = "_batchid"

  /** Highest streaming batch id in the live version, if the table is
    * (or ever was) fed by [[mergeExactlyOnce]]. */
  def lastBatchId(spark: SparkSession, root: String): Option[Long] =
    Versioned.currentVersion(spark, root).flatMap(v =>
      Versioned.readSmallText(spark, new Path(s"$root/$v", BatchIdFile))
        .map(_.trim.toLong))

  /** What a merge did: `filesCarried` is the untouched majority (the
    * scale term), `filesWritten` the touched-bucket rewrite. */
  final case class MergeStats(version: String, filesCarried: Int,
      filesWritten: Int, bucketsTouched: Int)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def bucketOf(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong))

  /** List data files currently on disk, as `bucket=<b>/<name>` rel paths. */
  private def dataFilesOnDisk(spark: SparkSession, root: String): Set[String] = {
    val dataP = new Path(root, "data")
    val f = fs(spark, dataP)
    if (!f.exists(dataP)) return Set.empty
    f.listStatus(dataP)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .flatMap { d =>
        f.listStatus(d.getPath).collect {
          case s if s.isFile && !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith(".") =>
            s"${d.getPath.getName}/${s.getPath.getName}"
        }
      }.toSet
  }

  private final case class Manifest(schema: org.apache.spark.sql.types.StructType,
      nBuckets: Int, files: Seq[(Long, String)],
      keyCol: Option[String] = None,
      zones: Map[String, (String, String)] = Map.empty,
      layout: String = LayoutHash)

  /** Rows land in `pmod(xxhash64(key), n)` buckets — point lookups route
    * by hash; per-file zones span the key space (pruning from row-group
    * stats only). The default, and the only layout merges accept. */
  val LayoutHash = "hash"
  /** Rows land range-partitioned and key-sorted — per-file zones are
    * TIGHT key bands, so range scans AND point lookups prune at the
    * MANIFEST level (VERDICT r14 #8: the sorted-dictionary layout).
    * Immutable by contract: no merge/delete/rebucket — republish. */
  val LayoutRange = "range"

  // ---------------------------------------------------------- zone maps
  // Per-file key min/max recorded in the manifest at write time (VERDICT
  // r13 next #4): bucket pruning serves POINT lookups (hash routing), but
  // a RANGE predicate on the key hashes everywhere and scanned every
  // bucket. Zone entries are the Delta/Iceberg data-skipping half of the
  // layout: a range read keeps only files whose [min,max] overlaps the
  // predicate. Conservative by construction — files without an entry
  // (pre-zone manifests, unsupported key types) are always scanned, and
  // the exact predicate is re-applied after the pruned read, so zones can
  // only skip work, never rows.

  /** Escape a zone value for the tab-separated manifest line. */
  private def zEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
  private def zUnesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Key types zones are recorded for; anything else stays zone-less
    * (correct, just unpruned). Comparison happens in the parsed domain. */
  private def zoneParser(dt: org.apache.spark.sql.types.DataType)
      : Option[(String => Any, (Any, Any) => Int)] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(((s: String) => s.toLong,
          (a: Any, b: Any) => java.lang.Long.compare(
            a.asInstanceOf[Long], b.asInstanceOf[Long])))
      // FloatType zones were written from Float.toString (the shortest
      // string that round-trips to the SAME float) — parse them back
      // through the FLOAT domain and only then widen, so the stored
      // bound equals the file's true min/max exactly. Parsing straight
      // to double ("0.1".toDouble = 0.1d ≠ 0.1f.toDouble =
      // 0.10000000149d) made a file whose max EQUALS the query's lower
      // bound prunable — dropping rows, violating the zones-only-skip-
      // work contract (ADVICE r14 medium). Query bounds widen exactly
      // (Float.toDouble is lossless), so comparing in double is safe
      // once the zone string round-trips through toFloat.
      case FloatType =>
        Some(((s: String) => s.toFloat.toDouble,
          (a: Any, b: Any) => java.lang.Double.compare(
            a.asInstanceOf[Double], b.asInstanceOf[Double])))
      case DoubleType =>
        Some(((s: String) => s.toDouble,
          (a: Any, b: Any) => java.lang.Double.compare(
            a.asInstanceOf[Double], b.asInstanceOf[Double])))
      case StringType =>
        Some(((s: String) => s,
          (a: Any, b: Any) => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])))
      case _ => None
    }
  }

  /** One column-pruned job over freshly written files → rel path →
    * (min, max) of the key, as manifest strings. Files whose key is all
    * null (possible only for exotic schemas) get no entry. */
  private def zonesFor(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType, keyCol: String,
      relFiles: Seq[String]): Map[String, (String, String)] = {
    if (relFiles.isEmpty || zoneParser(schema(keyCol).dataType).isEmpty)
      return Map.empty
    val basePath = s"$root/data"
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    spark.read.option("basePath", basePath).schema(schema)
      .parquet(relFiles.map(f => s"$basePath/$f"): _*)
      .groupBy(input_file_name().as("__f"))
      .agg(fmin(col(keyCol)).as("__mn"), fmax(col(keyCol)).as("__mx"))
      .collect() // bounded: one row per new file
      .flatMap { r =>
        val uri = r.getString(0)
        // input_file_name is a URI over basePath — recover the rel path
        relFiles.find(rel => uri.endsWith(rel)).flatMap { rel =>
          (Option(r.get(1)), Option(r.get(2))) match {
            case (Some(mn), Some(mx)) => Some(rel -> (mn.toString, mx.toString))
            case _ => None
          }
        }
      }.toMap
  }

  private def readManifest(spark: SparkSession, root: String,
      version: String): Manifest = {
    val txt = Versioned.readSmallText(spark,
      new Path(s"$root/$version", ManifestFile)).getOrElse(
      throw new IllegalStateException(
        s"version $version under $root has no $ManifestFile manifest"))
    val lines = txt.split('\n')
    val schema = lines.find(_.startsWith(SchemaPrefix)).map(l =>
      org.apache.spark.sql.types.DataType.fromJson(
        l.substring(SchemaPrefix.length))
        .asInstanceOf[org.apache.spark.sql.types.StructType]).getOrElse(
      throw new IllegalStateException(s"manifest of $version has no schema"))
    val nBuckets = lines.find(_.startsWith(BucketsPrefix)).map(
      _.substring(BucketsPrefix.length).toInt).getOrElse(
      throw new IllegalStateException(s"manifest of $version has no bucket count"))
    // data lines: `bucket\trel` (pre-zone) or `bucket\trel\tmin\tmax`
    // (zone-mapped). Mixed manifests are normal — e.g. evolved tables
    // whose old files predate zone recording.
    val parsed = lines.iterator.filter(l => l.nonEmpty && l.contains('\t'))
      .map(_.split('\t')).toSeq
    val files = parsed.map(p => (p(0).toLong, zUnesc(p(1))))
    val zones = parsed.collect {
      case p if p.length >= 4 => zUnesc(p(1)) -> (zUnesc(p(2)), zUnesc(p(3)))
    }.toMap
    val keyCol = lines.find(_.startsWith(KeyPrefix))
      .map(_.substring(KeyPrefix.length))
    val layout = lines.find(_.startsWith(LayoutPrefix))
      .map(_.substring(LayoutPrefix.length)).getOrElse(LayoutHash)
    Manifest(schema, nBuckets, files, keyCol, zones, layout)
  }

  private def writeManifestText(m: Manifest): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(SchemaPrefix).append(m.schema.json).append('\n')
    sb.append(BucketsPrefix).append(m.nBuckets).append('\n')
    m.keyCol.foreach(k => sb.append(KeyPrefix).append(k).append('\n'))
    if (m.layout != LayoutHash)
      sb.append(LayoutPrefix).append(m.layout).append('\n')
    m.files.foreach { case (b, f) =>
      sb.append(b).append('\t').append(zEsc(f))
      m.zones.get(f).foreach { case (mn, mx) =>
        sb.append('\t').append(zEsc(mn)).append('\t').append(zEsc(mx))
      }
      sb.append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def readFiles(spark: SparkSession, root: String,
      m: Manifest, rel: Seq[String]): DataFrame = {
    val basePath = s"$root/data"
    spark.read.option("basePath", basePath).schema(m.schema)
      .parquet(rel.map(f => s"$basePath/$f"): _*)
  }

  /**
   * First publish of a keyed table: bucket the rows, land the data files,
   * commit version 1's manifest. Returns the version name.
   *
   * CONCURRENCY CONTRACT (lease audit, VERDICT r16 #7): first publishes
   * are SINGLE-CREATOR by contract and deliberately unleased — there is
   * no prior state to lose, and leasing here would double-pay on every
   * BM25 segment publish (each lands in a fresh UUID dir under the
   * parent index's lease, which already serializes same-index writers).
   * The files-snapshot diff below does mean two creators racing ONE root
   * could cross-attribute data files — that is the single-creator
   * contract's boundary, not a supported mode; mutation after creation
   * goes through merge/rebucket/vacuumData, which are leased.
   */
  def publish(df: DataFrame, root: String, keyCol: String,
      nBuckets: Int = 64): String = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    val before = dataFilesOnDisk(spark, root)
    val bucketed = df.withColumn("bucket", bucketOf(keyCol, nBuckets))
    // one shuffle to ~one partition per bucket BEFORE the write: without
    // it every write task emits a file per bucket it sees — tasks ×
    // buckets files (measured 1,338 on a sharded 500k-row corpus), and
    // every lookup pays the open/schedule cost of all of them. Key-sorted
    // within each bucket: parquet row-group min/max stats then skip row
    // groups for pushed key predicates — the second pruning level under
    // the bucket manifest (readKeys' isin path rides it)
    bucketed.repartition(nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col(keyCol))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$root/data")
    val files = (dataFilesOnDisk(spark, root) -- before).toSeq.sorted
      .map(f => (f.substring("bucket=".length, f.indexOf('/')).toLong, f))
    val m = Manifest(bucketed.schema, nBuckets, files, Some(keyCol),
      zonesFor(spark, root, bucketed.schema, keyCol, files.map(_._2)))
    Versioned.publish(spark, root) { dir =>
      val p = new Path(dir, ManifestFile)
      val out = fs(spark, p).create(p, true)
      try out.write(writeManifestText(m)) finally out.close()
    }
  }

  /**
   * First publish of a RANGE-layout keyed table (VERDICT r14 #8): rows
   * are range-partitioned and key-sorted, so every data file covers one
   * tight key band and the manifest's per-file zones become a sorted
   * DICTIONARY over the key space — range scans (`readRange`) and point
   * lookups (`readKeys`) both prune to the overlapping files at the
   * MANIFEST level, where the hash layout's alphabet-spanning zones
   * prune nothing and lean on row-group stats alone. The trade: no hash
   * routing means no `merge`/`delete`/`rebucket` (those require the
   * hash layout and refuse loudly) — a range table is an immutable
   * published artifact, republished to change, which is exactly the
   * shape of a per-segment term dictionary. Returns the version name.
   */
  def publishRange(df: DataFrame, root: String, keyCol: String,
      nParts: Int = 16): String = {
    require(nParts > 0, "nParts must be positive")
    val spark = df.sparkSession
    val before = dataFilesOnDisk(spark, root)
    // partition id doubles as the manifest "bucket": meaningless for
    // routing (layout=range readers never hash), but it keeps the
    // data-file naming, vacuum, and time-travel machinery identical
    val parted = df.repartitionByRange(nParts, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .withColumn("bucket",
        org.apache.spark.sql.functions.spark_partition_id().cast("long"))
    parted.write.mode("append").partitionBy("bucket")
      .parquet(s"$root/data")
    val files = (dataFilesOnDisk(spark, root) -- before).toSeq.sorted
      .map(f => (f.substring("bucket=".length, f.indexOf('/')).toLong, f))
    val m = Manifest(parted.schema, nParts, files, Some(keyCol),
      zonesFor(spark, root, parted.schema, keyCol, files.map(_._2)),
      layout = LayoutRange)
    Versioned.publish(spark, root) { dir =>
      val p = new Path(dir, ManifestFile)
      val out = fs(spark, p).create(p, true)
      try out.write(writeManifestText(m)) finally out.close()
    }
  }

  /** Read the live version (data columns only — the bucket is layout). */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version")))

  /** "AS OF" time travel: the manifest view that was live at `ts` (epoch
    * millis) — `Versioned.versionAsOf` picks the version, this reads it.
    * Throws when every retained version postdates `ts` (the caller asked
    * for a state that predates the table or was vacuumed away). */
  def readAsOf(spark: SparkSession, root: String, ts: Long): DataFrame =
    readVersion(spark, root, Versioned.versionAsOf(spark, root, ts)
      .getOrElse(throw new IllegalArgumentException(
        s"no retained version of $root is as old as $ts — retention " +
          s"horizon: ${Versioned.retention(spark, root)
            .fold("none declared")(_.describe)}; older versions were " +
          "vacuumed (or the table postdates the timestamp)")))

  /** Time travel: read any retained version's manifest view. */
  def readVersion(spark: SparkSession, root: String,
      version: String): DataFrame = {
    val m = readManifest(spark, root, version)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          m.schema.filterNot(_.name == "bucket")))
    else readFiles(spark, root, m, m.files.map(_._2)).drop("bucket")
  }

  /**
   * MERGE a batch into the live version: rows of `batch` REPLACE base
   * rows with the same key (upsert), rows where `deleteFlagCol` is true
   * DELETE their key, and new keys insert. Only the buckets containing
   * batch keys are rewritten; all other files carry by name into the new
   * version's manifest. The batch must have unique keys (one action per
   * key per merge — enforced, since "update and delete the same key" has
   * no deterministic meaning) and the base table's data columns: a batch
   * MISSING one fails analysis loudly, while extra columns (CDC
   * metadata, the delete flag) are ignored — the projection keeps the
   * table's schema. Schema EVOLUTION is opt-in via `newColumns`: each
   * named extra batch column joins the table schema from this version
   * on; carried files simply lack the column and read as null (parquet
   * missing-column semantics under the manifest schema), so evolution
   * costs nothing beyond the merge itself and old versions keep their
   * own schema — the Delta `mergeSchema` shape. Re-bucketing, by
   * contrast, moves every row — that is [[rebucket]]'s full rewrite.
   *
   * Scale shape: one bounded collect of the batch's DISTINCT BUCKET IDS
   * (≤ nBuckets longs) drives both the pruned base read and the manifest
   * split; the only join is survivors = touched-base ⟕̸ batch-keys
   * (left anti), with the batch broadcast by contract (a merge batch is
   * the small side; a batch that isn't should be split, like any
   * lakehouse writer).
   */
  def merge(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, deleteFlagCol: Option[String] = None,
      newColumns: Seq[String] = Seq.empty): MergeStats =
    Lease.withLease(spark, root) {
      mergeHooked(spark, root, batch, keyCol, deleteFlagCol, () => (),
        newColumns = newColumns)
    }

  /**
   * Exactly-once CDC ingest: apply a Structured Streaming micro-batch
   * (`foreachBatch`'s at-least-once redelivery contract) as a merge that
   * commits its batch id ATOMICALLY with the data — the id lives inside
   * the version dir, visible only on the same pointer swap. A redelivered
   * batch (id ≤ the live watermark) is skipped without touching disk; a
   * crash before the swap leaves the old id live, so the retry applies
   * cleanly. Requires monotonically increasing ids per table (Structured
   * Streaming's batchId is). Returns true iff applied.
   */
  def mergeExactlyOnce(spark: SparkSession, root: String, batch: DataFrame,
      keyCol: String, batchId: Long,
      deleteFlagCol: Option[String] = None): Boolean =
    Lease.withLease(spark, root) {
      // fence check under the lease: the read-check-write is what the
      // single-writer contract protects (a redelivered skip pays the
      // lease's handful of small-object ops — constant per micro-batch)
      if (lastBatchId(spark, root).exists(_ >= batchId)) false
      else {
        mergeHooked(spark, root, batch, keyCol, deleteFlagCol, () => (),
          batchId = Some(batchId))
        true
      }
    }

  /** The merge with a test seam between its data-file job and the version
    * commit — the same crash-window shape as appendToIvfIndexHooked. */
  private[graft] def mergeHooked(spark: SparkSession, root: String,
      batch: DataFrame, keyCol: String, deleteFlagCol: Option[String],
      beforeCommit: () => Unit, batchId: Option[Long] = None,
      newColumns: Seq[String] = Seq.empty): MergeStats = {
    val live = Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version to merge into"))
    val m = readManifest(spark, root, live)
    require(m.layout == LayoutHash,
      s"$root is a $LayoutRange-layout table — merges need hash routing; " +
        "range tables are immutable published artifacts (republish)")
    val dupKeys = batch.groupBy(col(keyCol)).count().filter(col("count") > 1).count()
    require(dupKeys == 0,
      s"merge batch has $dupKeys duplicated keys — one action per key per merge")
    val withBucket = batch.withColumn("bucket", bucketOf(keyCol, m.nBuckets))
    val touched: Array[Long] = withBucket.select(col("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    val touchedSet = touched.toSet
    val (touchedFiles, carried) = m.files.partition { case (b, _) => touchedSet(b) }
    // survivors: touched-bucket base rows whose key the batch does not name
    val batchKeys = withBucket.select(col(keyCol)).distinct()
    val survivors =
      if (touchedFiles.isEmpty) None
      else Some(readFiles(spark, root, m, touchedFiles.map(_._2))
        .join(broadcast(batchKeys), Seq(keyCol), "left_anti"))
    val upserts0 = deleteFlagCol.fold(withBucket)(f =>
      withBucket.filter(!coalesce(col(f), lit(false))).drop(f))
    // schema evolution: each declared new column joins the table schema
    // from this version on, placed before the trailing bucket column so
    // partition-column-last layout holds. Undeclared extras stay ignored.
    newColumns.foreach { c =>
      require(upserts0.columns.contains(c),
        s"newColumns names '$c' but the batch does not carry it")
      require(!m.schema.fieldNames.contains(c),
        s"newColumns names '$c' but the table already has it")
    }
    val evolvedSchema =
      if (newColumns.isEmpty) m.schema
      else org.apache.spark.sql.types.StructType(
        m.schema.fields.filterNot(_.name == "bucket") ++
          newColumns.map(c => upserts0.schema(c)
            .copy(nullable = true)) :+ m.schema("bucket"))
    val dataCols = evolvedSchema.fieldNames.toSeq
    val upserts = upserts0.select(dataCols.map(col): _*)
    val newRows = survivors.fold(upserts)(s =>
      // survivors predate the new columns: they carry explicit nulls,
      // exactly what carried files yield implicitly under the new schema
      newColumns.foldLeft(s)((d, c) =>
        d.withColumn(c, lit(null).cast(upserts0.schema(c).dataType)))
        .select(dataCols.map(col): _*).unionByName(upserts))
    val before = dataFilesOnDisk(spark, root)
    // same one-file-per-bucket discipline as publish, sized to the
    // touched-bucket count (merge writes only those)
    newRows.repartition(math.max(1, touched.length), col("bucket"))
      .sortWithinPartitions(col("bucket"), col(keyCol))
      .write.mode("append").partitionBy("bucket").parquet(s"$root/data")
    val newFiles = (dataFilesOnDisk(spark, root) -- before).toSeq.sorted
      .map(f => (f.substring("bucket=".length, f.indexOf('/')).toLong, f))
    beforeCommit()
    // zones: carried files keep their recorded entries; the rewrite's
    // files get fresh ones (one column-pruned job over just those)
    val zKey = m.keyCol.getOrElse(keyCol)
    val nextZones = m.zones.filter { case (f, _) => carried.exists(_._2 == f) } ++
      zonesFor(spark, root, evolvedSchema, zKey, newFiles.map(_._2))
    val next = Manifest(evolvedSchema, m.nBuckets, carried ++ newFiles,
      m.keyCol.orElse(Some(keyCol)), nextZones)
    // the streaming watermark rides in the version dir: this merge's id,
    // or the live version's carried forward (so ad-hoc merges on a
    // CDC-fed table never regress the replay fence)
    val carryId: Option[Long] = batchId.orElse(
      Versioned.readSmallText(spark, new Path(s"$root/$live", BatchIdFile))
        .map(_.trim.toLong))
    val v = Versioned.publish(spark, root) { dir =>
      val p = new Path(dir, ManifestFile)
      val out = fs(spark, p).create(p, true)
      try out.write(writeManifestText(next)) finally out.close()
      carryId.foreach { id =>
        val bp = new Path(dir, BatchIdFile)
        val bo = fs(spark, bp).create(bp, true)
        try bo.write(id.toString.getBytes(StandardCharsets.UTF_8))
        finally bo.close()
      }
    }
    MergeStats(v, carried.size, newFiles.size, touched.length)
  }

  /**
   * Bucket-pruned point lookups: read ONLY the data files of the buckets
   * the requested keys hash into, then exact-match with a broadcast
   * semi-join. `keys` is a (small, by contract) frame carrying `keyCol`.
   * The bucket set is computed BY SPARK over the keys frame (one tiny
   * job) rather than re-implementing xxhash64 driver-side — the two can
   * never drift. At 100 TB this is the layout's serve-time payoff: a
   * k-key lookup scans ≤ k buckets' files (1/nBuckets of the table
   * each, expected), not the table — the same manifest-pruning shape as
   * the ANN index's probed-cell reads.
   */
  /** At or under this many distinct keys, `readKeys` collects them and
    * pushes an `In` filter to the parquet scan instead of semi-joining:
    * with the bucket files key-sorted (see `publish`), the row-group
    * min/max stats then skip most of each touched bucket too. Above it,
    * the broadcast semi-join avoids a giant literal list. */
  val IsInPushdownLimit: Int = 64

  /** Pruned point-lookup read: only the buckets/zone-banded files that
    * can hold `keys` are scanned. PROBE CONTRACT: `keys` is a BOUNDED
    * frame (query terms, a literal id list — the same contract every
    * serve probe here shares); it is collected to the driver for
    * jobless routing, so an unbounded or duplicate-heavy frame belongs
    * in a join against [[read]], not here. Fails loud past the cap. */
  val ReadKeysCap: Int = 1 << 20

  def readKeys(spark: SparkSession, root: String, keyCol: String,
      keys: DataFrame): DataFrame = {
    val live = Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version"))
    val m = readManifest(spark, root, live)
    // Key values land driver-side WITHOUT a shuffle job: the keys frame
    // is small by contract and almost always a LocalRelation (query
    // terms), which Project-folds to a jobless LocalTableScan collect.
    // The former select(..., bucketOf).distinct().collect() planned a
    // full exchange+aggregate Spark job per probe — pure fixed cost at
    // serve time (×2 tables ×|segments| per lexical serve; ~0.1 s/query
    // of the lexical family's bench floor). Dedup moves driver-side;
    // bucket routing evaluates the SAME catalyst expression
    // (pmod(xxhash64(key), n)) interpreted over each key literal, so
    // hash routing cannot drift from the write path's codegen twin
    // (interpreted ≡ codegen is a pinned Spark invariant for
    // HashExpression, and MergeTableSpec's lookup round-trips pin it
    // here end-to-end).
    val rawKeys = keys.select(col(keyCol)).collect()
    require(rawKeys.length <= ReadKeysCap,
      s"readKeys collected ${rawKeys.length} key rows (cap $ReadKeysCap) " +
        "— the probe contract is a bounded key frame; join an unbounded " +
        "one against read() instead")
    val keyVals: Array[Any] = rawKeys.map(_.get(0)).distinct
    val dt = m.schema(keyCol).dataType
    def bucketOfDriver(v: Any): Long = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
      Pmod(new XxHash64(Seq(Literal.create(v, dt))),
        Literal(m.nBuckets.toLong)).eval(null).asInstanceOf[Long]
    }
    val buckets: Set[Long] = keyVals.map(bucketOfDriver).toSet
    val files =
      if (m.layout == LayoutRange) {
        // range layout: no hash routing — a file serves a key iff the
        // key falls in its zone band (tight by construction), so point
        // lookups manifest-prune to ≤ |keys| files; zone-less files
        // (exotic key types) are conservatively scanned
        zoneParser(m.schema(keyCol).dataType) match {
          case None => m.files
          case Some((parse, cmp)) =>
            val wanted = keyVals.map(v => parse(v.toString))
            m.files.filter { case (_, f) =>
              m.zones.get(f) match {
                case None => true
                case Some((mnS, mxS)) =>
                  val mn = parse(mnS); val mx = parse(mxS)
                  wanted.exists(k => cmp(k, mn) >= 0 && cmp(k, mx) <= 0)
              }
            }
        }
      } else m.files.filter { case (b, _) => buckets(b) }
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          m.schema.filterNot(_.name == "bucket")))
    val scan = readFiles(spark, root, m, files.map(_._2))
    if (keyVals.length <= IsInPushdownLimit)
      scan.filter(col(keyCol).isin(keyVals.toIndexedSeq: _*)).drop("bucket")
    else {
      val wanted = spark.createDataFrame(
        spark.sparkContext.parallelize(keyVals.toIndexedSeq.map(v =>
          org.apache.spark.sql.Row(v)), 1),
        org.apache.spark.sql.types.StructType(Seq(m.schema(keyCol))))
      scan.join(broadcast(wanted), Seq(keyCol), "left_semi").drop("bucket")
    }
  }

  /**
   * Per-root pruned key reads unioned and collected in ONE Spark job —
   * the k-segment serve's terms/stats probe was k sequential collect
   * jobs (each a full job-submit/schedule round-trip on a handful of
   * rows); the union scans the same pruned file set in one job. Row
   * order is unspecified, like any union — every caller aggregates.
   */
  def collectKeys(spark: SparkSession, roots: Seq[String], keyCol: String,
      keys: DataFrame): Seq[org.apache.spark.sql.Row] =
    // allowMissingColumns: segment generations drift (a legacy pre-stats
    // terms table mixed with post-maxtf/minlen ones) — a strict union
    // threw AnalysisException at the probe, making the serve paths'
    // documented degrade-gracefully checks (row arity / isNullAt on the
    // stats columns) unreachable. Missing columns surface as nulls, so
    // those checks fire instead. Schemas evolve append-only here
    // (publish never reorders), so positional reads stay stable.
    roots.map(r => readKeys(spark, r, keyCol, keys))
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(_.collect().toSeq).getOrElse(Seq.empty)

  /** The file list a range read scans — the zone-map pruning itself,
    * exposed so MergeTableSpec can pin the scanned set before/after.
    * `None` bounds are open. Files without a zone entry always survive
    * (conservative). */
  private[graft] def rangeFiles(spark: SparkSession, root: String,
      lower: Option[Any], upper: Option[Any]): Seq[String] = {
    val live = Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version"))
    val m = readManifest(spark, root, live)
    val keyCol = m.keyCol.getOrElse(throw new IllegalStateException(
      s"manifest of $root/$live records no key column — range reads need one"))
    zoneParser(m.schema(keyCol).dataType) match {
      case None => m.files.map(_._2) // unsupported key type: scan all
      case Some((parse, cmp)) =>
        def norm(v: Any): Any = v match {
          case n: Byte => n.toLong
          case n: Short => n.toLong
          case n: Int => n.toLong
          case n: Long => n
          case n: Float => n.toDouble
          case n: Double => n
          case s: String => s
          case other => parse(other.toString)
        }
        val lo = lower.map(norm)
        val hi = upper.map(norm)
        m.files.map(_._2).filter { f =>
          m.zones.get(f) match {
            case None => true // pre-zone file: must scan
            case Some((mnS, mxS)) =>
              val mn = parse(mnS); val mx = parse(mxS)
              lo.forall(l => cmp(mx, l) >= 0) && hi.forall(h => cmp(mn, h) <= 0)
          }
        }
    }
  }

  /**
   * Range scan over the key with zone-map file pruning (VERDICT r13 next
   * #4): `readKeys` hash-routes POINT lookups to their buckets, but a
   * range predicate hashes everywhere — before zones it scanned every
   * bucket's every file. The manifest's per-file key [min,max] (recorded
   * at publish/merge/rebucket time, carried for untouched files) prunes
   * the file list to those overlapping [lower, upper]; the exact
   * predicate is re-applied on the scan, so pruning is invisible to
   * results by construction. With bucket files key-sorted
   * (`sortWithinPartitions` at write), parquet row-group stats then skip
   * within the survivors — the second level, same as readKeys' isin
   * path. Open bounds: pass None.
   */
  def readRange(spark: SparkSession, root: String,
      lower: Option[Any], upper: Option[Any]): DataFrame = {
    val live = Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version"))
    val m = readManifest(spark, root, live)
    val keyCol = m.keyCol.getOrElse(throw new IllegalStateException(
      s"manifest of $root/$live records no key column — range reads need one"))
    val files = rangeFiles(spark, root, lower, upper)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          m.schema.filterNot(_.name == "bucket")))
    val scan = readFiles(spark, root, m, files)
    val bounded = (lower, upper) match {
      case (Some(l), Some(u)) => scan.filter(col(keyCol) >= lit(l) && col(keyCol) <= lit(u))
      case (Some(l), None) => scan.filter(col(keyCol) >= lit(l))
      case (None, Some(u)) => scan.filter(col(keyCol) <= lit(u))
      case (None, None) => scan
    }
    bounded.drop("bucket")
  }

  /**
   * Change the table's bucket count (VERDICT r12 next #5): a table that
   * outgrows its publish-time `nBuckets` degrades every merge (each
   * touched bucket rewrites ~n/nBuckets rows) and every lookup (a probe
   * scans ~n/nBuckets rows). Rebucketing is a FULL REWRITE by design —
   * `pmod(xxhash64(key), n)` assignments don't nest across arbitrary n,
   * so every row moves — executed under the exact commit discipline of
   * merge: new files land beside the old (names never collide), the new
   * manifest (with the new bucket count) commits on the version-pointer
   * swap, and a crash anywhere before that leaves the OLD bucketing
   * servable bit-for-bit. Old versions keep reading their own layout
   * until `vacuum` + `vacuumData` (time travel across a rebucket works).
   * The CDC watermark carries forward like any merge. Doubling-only
   * schemes (consistent-hash splitting one bucket at a time) would avoid
   * the full move but leak the bucket function into every reader;
   * at 100 TB a rebucket is a rare, planned, one-shuffle job — the same
   * cost class as the initial publish. Returns the new version name.
   */
  def rebucket(spark: SparkSession, root: String, newBuckets: Int): String =
    Lease.withLease(spark, root) {
      rebucketHooked(spark, root, newBuckets, () => ())
    }

  /** Rebucket with the merge family's crash seam before the commit. */
  private[graft] def rebucketHooked(spark: SparkSession, root: String,
      newBuckets: Int, beforeCommit: () => Unit): String = {
    require(newBuckets > 0, "newBuckets must be positive")
    val live = Versioned.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root has no committed version to rebucket"))
    val m = readManifest(spark, root, live)
    val keyCol = m.keyCol.getOrElse(throw new IllegalStateException(
      s"manifest of $root/$live records no key column — cannot rebucket"))
    require(m.layout == LayoutHash,
      s"$root is a $LayoutRange-layout table — rebucket needs hash " +
        "routing; range tables are immutable published artifacts")
    require(newBuckets != m.nBuckets,
      s"table already has $newBuckets buckets")
    val before = dataFilesOnDisk(spark, root)
    val rows =
      if (m.files.isEmpty) None
      else Some(readFiles(spark, root, m, m.files.map(_._2)).drop("bucket")
        .withColumn("bucket", bucketOf(keyCol, newBuckets)))
    rows.foreach {
      _.repartition(newBuckets, col("bucket"))
        .sortWithinPartitions(col("bucket"), col(keyCol))
        .write.mode("append").partitionBy("bucket").parquet(s"$root/data")
    }
    val newFiles = (dataFilesOnDisk(spark, root) -- before).toSeq.sorted
      .map(f => (f.substring("bucket=".length, f.indexOf('/')).toLong, f))
    beforeCommit()
    val carryId: Option[Long] =
      Versioned.readSmallText(spark, new Path(s"$root/$live", BatchIdFile))
        .map(_.trim.toLong)
    Versioned.publish(spark, root) { dir =>
      val p = new Path(dir, ManifestFile)
      val out = fs(spark, p).create(p, true)
      try out.write(writeManifestText(
        Manifest(m.schema, newBuckets, newFiles, m.keyCol,
          zonesFor(spark, root, m.schema, keyCol, newFiles.map(_._2)))))
      finally out.close()
      carryId.foreach { id =>
        val bp = new Path(dir, BatchIdFile)
        val bo = fs(spark, bp).create(bp, true)
        try bo.write(id.toString.getBytes(StandardCharsets.UTF_8))
        finally bo.close()
      }
    }
  }

  /**
   * The version a streaming batch id produced, with its predecessor:
   * scans the retained history for the version whose `_batchid` records
   * exactly `batchId`. The CDC→rollup composition derives its rollup
   * delta from this pair IDEMPOTENTLY — after a crash between the merge
   * fence and the rollup fence, the redelivered batch finds the merge
   * already committed (mergeExactlyOnce skips) and recomputes the SAME
   * delta from the same version pair, closing the hole a live-table
   * read-before-merge could never survive. Requires the pair to still be
   * retained (vacuum with keepLast ≥ 2, or after rollup catch-up).
   */
  def versionForBatch(spark: SparkSession, root: String,
      batchId: Long): Option[(Option[String], String)] = {
    val versions = Versioned.listVersions(spark, root).map(_._1) // newest first
    val ids = versions.map { v =>
      v -> Versioned.readSmallText(spark, new Path(s"$root/$v", BatchIdFile))
        .flatMap(_.trim.toLongOption)
    }
    ids.zipWithIndex.collectFirst {
      case ((v, Some(id)), i) if id == batchId =>
        // _batchid carries forward on ad-hoc merges, so the version FOR
        // the id is the OLDEST one recording it (the stream's own merge)
        val withSameId = ids.drop(i).takeWhile(_._2.contains(batchId))
        val mine = withSameId.last._1
        val older = versions.drop(versions.indexOf(mine) + 1)
        (older.headOption, mine)
    }
  }

  /**
   * Signed row-level diff between two retained versions, reading ONLY
   * the files the two manifests do not share (the touched buckets of the
   * merges between them — never the carried files, which are byte-
   * identical by name). Rows present in `to` but not `from` weigh +1,
   * removed rows -1; rows rewritten unchanged (merge survivors) cancel
   * in the group-by and never surface. The `__weight` column feeds
   * Rollup.refreshDeltaExactlyOnce. Schema evolution reads the TO
   * schema on both sides (missing columns null, parquet semantics).
   */
  def versionDelta(spark: SparkSession, root: String,
      fromVersion: String, toVersion: String): DataFrame = {
    val mFrom = readManifest(spark, root, fromVersion)
    val mTo = readManifest(spark, root, toVersion)
    val fromSet = mFrom.files.map(_._2).toSet
    val toSet = mTo.files.map(_._2).toSet
    val removed = mFrom.files.map(_._2).filterNot(toSet)
    val added = mTo.files.map(_._2).filterNot(fromSet)
    val dataCols = mTo.schema.fieldNames.filterNot(_ == "bucket").toSeq
    def side(rel: Seq[String], w: Long): DataFrame =
      if (rel.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            mTo.schema.filterNot(_.name == "bucket")))
          .withColumn("__weight", lit(w))
      else readFiles(spark, root, mTo, rel).drop("bucket")
        .select(dataCols.map(col): _*).withColumn("__weight", lit(w))
    side(added, 1L).unionByName(side(removed, -1L))
      .groupBy(dataCols.map(col): _*)
      .agg(sum(col("__weight")).as("__weight"))
      .filter(col("__weight") =!= 0)
  }

  /**
   * Delete data files no RETAINED version references — the merge twin of
   * `Similarity.vacuumUncommitted`, run after `Versioned.vacuum` trims
   * version dirs. Never deletes at commit time: any un-vacuumed version
   * keeps reading exactly as published (that is the time-travel
   * contract). Returns the deleted rel paths.
   */
  def vacuumData(spark: SparkSession, root: String): Seq[String] =
      Lease.withLease(spark, root) {
    // MAINTENANCE WRITE (lease audit, VERDICT r16 #7): an in-flight
    // merge lands its data files BEFORE the manifest commit; an
    // unserialized vacuum would read that window as "unreferenced",
    // delete the about-to-be-committed files, and let the merge publish
    // a manifest naming missing files — the vacuumBm25Orphans hazard,
    // closed the same way.
    val referenced: Set[String] = Versioned.listVersions(spark, root)
      .map(_._1).flatMap(v => readManifest(spark, root, v).files.map(_._2)).toSet
    val dataP = new Path(root, "data")
    val f = fs(spark, dataP)
    dataFilesOnDisk(spark, root).toSeq.sorted
      .filterNot(referenced)
      .map { rel =>
        if (!f.delete(new Path(dataP, rel), false))
          throw new java.io.IOException(
            s"vacuumData: could not delete unreferenced file $rel")
        rel
      }
    }
}
