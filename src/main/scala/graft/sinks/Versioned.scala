package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned dataset layout: object-store-safe commits for the maintenance
 * path (VERDICT r8 next #3). The in-place two-rename swap Compactor and
 * CatalogTableSink use is atomic on HDFS but rename-as-copy on S3-style
 * object stores — the real 100 TB deployment — where the swap window
 * widens to a full byte copy and a crash strands a half-renamed dataset.
 *
 * This layout removes the rename of data entirely:
 *
 * ```
 * root/
 *   _current            <- tiny pointer file naming the live version dir
 *   v-<uuid>/           <- immutable, fully-written dataset versions
 *   v-<uuid>/
 * ```
 *
 * A writer materializes a NEW version directory (any number of part
 * files, any duration, crash-safe because nothing references it yet),
 * then commits by swapping the pointer — a single small-file operation:
 * `FileContext.rename(tmp, _current, OVERWRITE)` where the store supports
 * it (atomic on HDFS and local POSIX), else a single-object PUT
 * (`create(overwrite = true)`), which object stores make atomic at the
 * key level (readers see the old or the new content, never a torn mix —
 * the pointer is one small write, not a multipart copy). A crash BEFORE
 * the commit leaves the pointer naming the old version: readers are
 * unaffected and the orphan version dir is garbage, reclaimed by
 * `vacuum`. There is no window in which the live name is absent — the
 * property the two-rename swap cannot offer (Compactor.scala scaladoc).
 *
 * This is the manifest/version-pointer core of the table-format pattern
 * (Delta/Iceberg commit logs); one pointer (not a log) is enough here
 * because the engine's maintenance operations replace whole datasets.
 */
object Versioned {

  val Pointer = "_current"

  /** Marker file dropped INSIDE a version dir once that version has been
    * committed (the pointer named it). Distinguishes committed history
    * from orphans left by a crashed publish — a crash after `write(dir)`
    * but before the pointer swap leaves a fully-listable version dir that
    * was never live, and AS-OF resolution must not serve it (ADVICE r12:
    * uncommitted state stays invisible until vacuum). Ordering: the
    * marker is written AFTER the pointer swap (so a crash can never mark
    * a never-pointed version); the swap-done-marker-missing window is
    * covered by treating the pointer's current target as committed, and
    * healed by the next commit's repair step. */
  val CommittedMarker = "_committed"

  /** Monotonic commit sequence file dropped INSIDE a version dir at
    * commit time (ADVICE r14): version names are UUIDs and dir mtime has
    * filesystem granularity, so two micro-batch commits inside one mtime
    * tick used to tie-break on the random name — mis-ordering
    * `versionForBatch`'s oldest-version-with-this-batch-id resolution
    * and, through it, the CDC→rollup delta. The sequence is an explicit
    * publish-order marker: each commit writes predecessor-seq + 1
    * (publishes are serial under the single-maintenance-writer contract,
    * so the read-increment-write has no race to lose). listVersions
    * orders seq-carrying versions by seq; legacy dirs (pre-seq commits)
    * sort after them by the old (-mtime, name) rule — correct, because
    * any seq-carrying version postdates every seq-less one on a root. */
  val CommitSeq = "_seq"

  /** Marker-discipline epoch file beside `_current` (ADVICE r13 medium):
    * version dirs written BEFORE the marker scheme existed carry no
    * `_committed` marker, and reading them as orphans would silently
    * reclassify committed history as reclaimable garbage. The epoch file
    * records when marker discipline began on a root. Before it exists,
    * every version dir is grandfathered as committed (the pre-marker
    * semantics, under which all dirs were history); the first
    * marker-aware [[commit]] backfills a marker onto every pre-existing
    * dir and THEN writes the epoch file, after which a marker-less dir is
    * a genuine orphan. Trade-off, stated: an orphan left by a crash that
    * predates the first marker-aware commit gets grandfathered too — the
    * conservative direction (retain, never reclaim, ambiguous data). */
  val MarkerEpoch = "_marker_epoch"

  private def markerEpochExists(spark: SparkSession, root: String): Boolean =
    fsOf(spark, new Path(root)).exists(new Path(root, MarkerEpoch))

  /**
   * THE COMMIT CONTRACT (docs/PLANS.md "Versioned commit contract" has
   * the full audit). Every publish in this layout — the version pointer
   * and the ANN `_cellmap` manifest — funnels through ONE primitive,
   * [[atomicOverwrite]], whose atomicity requirement is: readers of the
   * target must see the complete old bytes or the complete new bytes,
   * never a prefix, never absence. How that is met is filesystem-class
   * dependent:
   *
   *  - HDFS / POSIX local: temp write + `FileContext.rename(OVERWRITE)`
   *    — a metadata operation, atomic by the filesystem's own contract.
   *  - S3A and object stores generally: there is NO atomic rename
   *    (rename is copy+delete), but there IS an atomic single-key PUT —
   *    a reader GETs the old object or the new one, never a torn mix.
   *    The primitive detects the missing FileContext binding and
   *    commits by direct PUT. What a plain PUT does NOT give is
   *    compare-and-swap: two concurrent committers can last-writer-win.
   *    This layout's stated concurrency contract is SINGLE MAINTENANCE
   *    WRITER (same as append/compact); deployments that need CAS plug
   *    a conditional put via [[setConditionalPut]] (S3 `If-Match`/ETag,
   *    GCS generation preconditions, ABFS ETag) and get
   *    lost-update DETECTION without changing any call site.
   *
   * The `commitObserver` seam records which route a commit took —
   * spec-countable, the same pattern as IvfAppendCrashSpec's kill hook —
   * so VersionedContractSpec can pin "one commit = one atomic rename"
   * on the filesystems the suite runs on.
   */
  /** Pluggable conditional-put override for object stores: return true
    * when the put was applied, false when the precondition failed (the
    * commit raises then — a lost update was DETECTED, not silently
    * taken). Consulted before the built-in routes; never invoked for
    * the temp file, only the final single-object commit. */
  @volatile private var conditionalPut:
      Option[(SparkSession, Path, Array[Byte]) => Boolean] = None
  def setConditionalPut(
      h: (SparkSession, Path, Array[Byte]) => Boolean): Unit =
    conditionalPut = Some(h)
  def clearConditionalPut(): Unit = conditionalPut = None

  /** Test seam: called once per atomicOverwrite with the route taken —
    * "conditional-put" | "rename" | "put". */
  @volatile private[graft] var commitObserver: (Path, String) => Unit =
    (_, _) => ()

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Read a small UTF-8 control file in one GET, None if absent — the
    * read-side dual of [[atomicOverwrite]], shared by the version pointer
    * and the ANN index's `_cellmap` manifest so a future fix (length
    * handling, eventual-consistency retry) lands in one place. */
  def readSmallText(spark: SparkSession, target: Path): Option[String] = {
    val fs = fsOf(spark, target)
    // Bounded retry on the LOCAL-filesystem concurrent-overwrite
    // artifact: ChecksumFileSystem renames the data file and its .crc
    // sidecar as two steps, so a reader racing an atomicOverwrite (e.g.
    // a lease heartbeat extending the claim another thread is reading)
    // can catch new data beside the old checksum (ChecksumException) or
    // a stale length (EOF). The pair is consistent again by the next
    // read; object stores and HDFS never tear (single-object PUT /
    // atomic rename), so the retry is a local-only affordance that
    // costs nothing elsewhere.
    var attempt = 0
    while (true) {
      if (!fs.exists(target)) return None
      try {
        val len = fs.getFileStatus(target).getLen.toInt
        val in = fs.open(target)
        try {
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          return Some(new String(bytes, StandardCharsets.UTF_8))
        } finally in.close()
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.EOFException |
                  _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    None // unreachable
  }

  /** Name of the live version under `root`, if a commit ever happened. */
  def currentVersion(spark: SparkSession, root: String): Option[String] =
    readSmallText(spark, new Path(root, Pointer)).map(_.trim)

  /** Path of the live version dir — what readers scan. */
  def resolve(spark: SparkSession, root: String): String =
    currentVersion(spark, root) match {
      case Some(v) => s"$root/$v"
      case None => throw new IllegalStateException(
        s"$root has no $Pointer pointer — not a versioned dataset (or no " +
          "version was ever committed)")
    }

  /** Read the live version as a DataFrame. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root))

  /**
   * Commit the pointer to `version`. The swap is a rename of a freshly
   * written temp pointer with OVERWRITE where the filesystem's
   * FileContext supports it (atomic on HDFS/POSIX); filesystems without
   * a FileContext binding fall back to a direct single-object overwrite
   * — on object stores a one-key PUT, atomic at the key level.
   */
  def commit(spark: SparkSession, root: String, version: String): Unit = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    fs.mkdirs(rootP)
    require(fs.exists(new Path(rootP, version)),
      s"cannot commit $version: $root/$version does not exist")
    // One-time migration (ADVICE r13): the first marker-aware commit on a
    // root backfills markers onto every dir that predates marker
    // discipline — they were written under pre-marker semantics where all
    // dirs were committed history — then pins the epoch. Ordering: markers
    // first, epoch last, so a crash mid-backfill leaves the root in legacy
    // mode (all dirs still grandfathered) and the next commit re-runs the
    // idempotent backfill. The version being committed NOW is excluded:
    // it must only gain its marker after the pointer swap below.
    if (!fs.exists(new Path(rootP, MarkerEpoch))) {
      fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
        .filterNot(_.getPath.getName == version)
        .foreach(s => markCommitted(fs, s.getPath))
      // plain create, not atomicOverwrite: the epoch is an empty latch
      // whose EXISTENCE is the signal (zero-length is the intended
      // content, so no torn-write window exists), and routing it through
      // the commit primitive would double-count the one-commit-one-op
      // contract the observer/CAS seams pin.
      val out = fs.create(new Path(rootP, MarkerEpoch), true)
      try out.write(Array.emptyByteArray) finally out.close()
    }
    // Repair step: the OUTGOING live version is committed by definition
    // (the pointer names it) — if its marker is missing (a prior commit
    // crashed between pointer swap and marker write), heal it now so it
    // stays in the AS-OF history after the pointer moves on.
    currentVersion(spark, root).foreach { prev =>
      val prevDir = new Path(rootP, prev)
      if (fs.exists(prevDir)) markCommitted(fs, prevDir)
    }
    // Publish-order sequence (see CommitSeq): predecessor's seq + 1,
    // falling back to a one-time scan for the max on legacy roots (or
    // when the live version predates seq discipline). Written BEFORE the
    // pointer swap: a crash here leaves an orphan carrying a seq, which
    // is invisible to listVersions (no marker, not the pointer target)
    // and at worst pushes the next commit's seq past a gap — order, not
    // density, is the contract.
    val nextSeq = 1L + currentVersion(spark, root)
      .flatMap(p => commitSeqOf(spark, new Path(rootP, p)))
      .getOrElse {
        fs.listStatus(rootP).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
          .flatMap(s => commitSeqOf(spark, s.getPath))
          .maxOption.getOrElse(0L)
      }
    val seqOut = fs.create(new Path(new Path(rootP, version), CommitSeq), true)
    try seqOut.write(s"$nextSeq\n".getBytes(StandardCharsets.UTF_8))
    finally seqOut.close()
    atomicOverwrite(spark, new Path(rootP, Pointer),
      (version + "\n").getBytes(StandardCharsets.UTF_8))
    // After the swap: a crash before this line leaves the marker missing
    // but the version IS the pointer target, which committedVersions
    // treats as committed; the next commit's repair step persists it.
    markCommitted(fs, new Path(rootP, version))
  }

  /** The commit sequence of a version dir, None for pre-seq commits. */
  private def commitSeqOf(spark: SparkSession, versionDir: Path): Option[Long] =
    readSmallText(spark, new Path(versionDir, CommitSeq))
      .flatMap(_.trim.toLongOption)

  private def markCommitted(fs: FileSystem, versionDir: Path): Unit = {
    val m = new Path(versionDir, CommittedMarker)
    if (!fs.exists(m)) {
      val out = fs.create(m, true)
      try out.write(Array.emptyByteArray) finally out.close()
    }
  }

  /** Whether `version` was ever committed: it carries the marker, it is
    * the pointer's current target (the marker-write crash window), or the
    * root predates marker discipline entirely (no [[MarkerEpoch]] —
    * legacy semantics grandfather every dir as committed history). */
  def isCommitted(spark: SparkSession, root: String, version: String): Boolean = {
    val fs = fsOf(spark, new Path(root))
    fs.exists(new Path(new Path(root, version), CommittedMarker)) ||
      currentVersion(spark, root).contains(version) ||
      !markerEpochExists(spark, root)
  }

  /**
   * Atomically overwrite a small control file — the single-object commit
   * primitive under BOTH this layout's version pointer and the ANN
   * index's `_cellmap` manifest (Similarity.writeCellMap): write a temp
   * object, rename-with-overwrite where the filesystem's FileContext
   * supports it (atomic on HDFS/POSIX), else a single-object PUT, which
   * object stores make atomic at the key level. Readers see the old or
   * the new content, never a torn mix.
   */
  def atomicOverwrite(spark: SparkSession, target: Path,
      bytes: Array[Byte]): Unit = {
    // Pre-commit lease re-validation (ADVICE r16 medium): every control
    // object this primitive commits (version pointer, ANN `_cellmap`,
    // tombstone file, retention) is a direct child of its index root, so
    // when the calling thread holds that root's maintenance lease the
    // claim is re-checked at the last responsible moment — an operation
    // that outlived its TTL aborts loudly instead of committing over the
    // rival that acquired after our expiry. The `_lease` object itself
    // is exempt: acquire/renew/release ARE the claim writes.
    if (target.getName != Lease.LeaseFile)
      Lease.verifyHeld(spark, target.getParent.toString)
    conditionalPut match {
      case Some(put) =>
        if (!put(spark, target, bytes))
          throw new java.io.IOException(
            s"conditional put of $target rejected: the object changed " +
              "since this committer read it (concurrent maintenance " +
              "writer?) — re-read and retry")
        commitObserver(target, "conditional-put")
        return
      case None => ()
    }
    val fs = fsOf(spark, target)
    val parent = target.getParent
    val tmp = new Path(parent,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // two distinct failure classes, handled differently: NO FileContext
    // binding for this scheme (typical object-store connector) means the
    // rename route does not exist and the single-key PUT (atomic per
    // object) is the commit; but a FAILED rename on a scheme that does
    // support FileContext (HDFS network blip, safemode, quota) must
    // propagate — degrading it to truncate-and-rewrite would open the
    // zero-length-file window the rename exists to close.
    val fcOpt = try {
      Some(FileContext.getFileContext(target.toUri,
        spark.sessionState.newHadoopConf()))
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
           _: UnsupportedOperationException => None
    }
    fcOpt match {
      case Some(fc) =>
        try {
          fc.rename(tmp, target, Options.Rename.OVERWRITE)
          commitObserver(target, "rename")
        } catch { case _: UnsupportedOperationException =>
          // scheme has a FileContext but no overwriting rename
          fs.delete(tmp, false)
          val direct = fs.create(target, true)
          try direct.write(bytes) finally direct.close()
          commitObserver(target, "put")
        }
      case None =>
        fs.delete(tmp, false)
        val direct = fs.create(target, true)
        try direct.write(bytes) finally direct.close()
        commitObserver(target, "put")
    }
  }

  /** Write a new version via `write(versionDir)` and commit it. Returns
    * the version name. A crash (or exception) before the commit leaves
    * the old version live and the fresh dir orphaned for `vacuum`.
    *
    * CONCURRENCY (lease audit, VERDICT r16 #7): this primitive does not
    * acquire the lease itself — callers that READ prior state before
    * publishing (merge, compact, rollup refresh, index maintenance) hold
    * the root's maintenance lease around the whole read-modify-publish,
    * and the commit inside re-validates that claim via the
    * [[atomicOverwrite]] seam. First publishes (no prior state to lose)
    * are single-creator by contract and run unleased. */
  def publish(spark: SparkSession, root: String)(
      write: String => Unit): String = {
    val version = s"v-${java.util.UUID.randomUUID().toString.take(12)}"
    write(s"$root/$version")
    commit(spark, root, version)
    version
  }

  /** Convenience: publish a DataFrame as the next version. */
  def writeVersioned(df: DataFrame, root: String): String =
    publish(df.sparkSession, root)(dir => df.write.parquet(dir))

  /**
   * Compact the live version into a NEW version (Compactor's rewrite,
   * minus every data rename): read current, write
   * ⌈bytes/targetBytes⌉ balanced files into a fresh version dir, swap the
   * pointer. Old versions are retained until `vacuum` — time-travel for
   * free, and the crash story is the pointer's.
   */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Compactor.CompactResult =
      Lease.withLease(spark, root) {
    // MAINTENANCE WRITE (lease audit, VERDICT r16 #7): read-live →
    // rewrite → commit. Racing another maintenance writer without the
    // lease is the lost-update shape the lease exists for.
    val live = resolve(spark, root)
    val fs = fsOf(spark, new Path(root))
    def files(dir: String) = {
      val it = fs.listFiles(new Path(dir), true)
      val out = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) out += f.getPath
      }
      out.result()
    }
    val before = files(live)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before.size <= targetFiles) {
      // no `return`: the body now runs inside the lease scope
      val rows = spark.read.parquet(live).count()
      Compactor.CompactResult(before.size, before.size, bytes, rows)
    } else {
      val v = publish(spark, root) { dir =>
        spark.read.parquet(live).repartition(targetFiles).write.parquet(dir)
      }
      val after = files(s"$root/$v")
      Compactor.CompactResult(before.size, after.size, bytes,
        spark.read.parquet(s"$root/$v").count())
    }
  }

  /** Name of the declarative retention-policy file beside `_current`. */
  val RetentionFile = "_retention"

  /** Keep-last-N versions / keep-since-T-millis policy (VERDICT r12 next
    * #7). Both bounds may be set: a version survives vacuum if EITHER
    * keeps it (the union horizon — the conservative reading, matching
    * lakehouse retention semantics). The live version always survives. */
  final case class Retention(keepLast: Option[Int] = None,
      keepMillis: Option[Long] = None) {
    require(keepLast.forall(_ >= 1), "keepLast must be >= 1")
    require(keepMillis.forall(_ >= 0), "keepMillis must be >= 0")
    def describe: String = (keepLast.map(n => s"keep_last=$n") ++
      keepMillis.map(ms => s"keep_ms=$ms")).mkString(", ") match {
      case "" => "none (live version only)"
      case s => s
    }
  }

  /** Persist the policy beside the pointer (same atomic single-object
    * write — a torn policy file must be impossible). */
  def setRetention(spark: SparkSession, root: String, policy: Retention): Unit = {
    val rootP = new Path(root)
    fsOf(spark, rootP).mkdirs(rootP)
    val txt = (policy.keepLast.map(n => s"keep_last=$n") ++
      policy.keepMillis.map(ms => s"keep_ms=$ms")).mkString("\n") + "\n"
    atomicOverwrite(spark, new Path(rootP, RetentionFile),
      txt.getBytes(StandardCharsets.UTF_8))
  }

  /** The table's declared retention, if any. */
  def retention(spark: SparkSession, root: String): Option[Retention] =
    readSmallText(spark, new Path(root, RetentionFile)).map { txt =>
      val kv = txt.split('\n').iterator.map(_.trim).filter(_.contains('='))
        .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }.toMap
      Retention(kv.get("keep_last").map(_.toInt), kv.get("keep_ms").map(_.toLong))
    }

  /** Delete version dirs outside the retention horizon. With no declared
    * policy (and no explicit `keep`), everything but the live version
    * goes — the original contract. With one, the newest `keepLast`
    * committed versions and every version younger than `keepMillis`
    * survive, so AS-OF reads inside the horizon keep working after any
    * vacuum (spec-pinned). Orphans of crashed publishes are NEVER
    * retained — they were never committed, the horizon does not apply.
    * Run AFTER readers of old versions have drained — the versioned
    * layout itself never deletes at commit time. */
  def vacuum(spark: SparkSession, root: String,
      keep: Set[String] = Set.empty): Seq[String] = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    if (!fs.exists(rootP)) return Seq.empty
    // MAINTENANCE WRITE (lease audit, VERDICT r16 #7): the delete set
    // derives from a pointer + marker read — racing a concurrent commit
    // could sweep a version the rival is about to re-point at. The
    // existence pre-check stays OUTSIDE the lease (a vacuum of a
    // never-published root must not materialize a lease file there).
    Lease.withLease(spark, root) {
    val live = currentVersion(spark, root)
    val policy = retention(spark, root)
    val committed = listVersions(spark, root) // newest first, committed only
    val inHorizon: Set[String] = policy.fold(Set.empty[String]) { p =>
      val byCount = p.keepLast.fold(Seq.empty[(String, Long)])(n => committed.take(n))
      val cutoff = p.keepMillis.map(System.currentTimeMillis() - _)
      val byAge = cutoff.fold(Seq.empty[(String, Long)])(c => committed.filter(_._2 >= c))
      (byCount ++ byAge).map(_._1).toSet
    }
    fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
      .map(_.getPath)
      .filterNot(p => live.contains(p.getName) || keep.contains(p.getName) ||
        inHorizon.contains(p.getName))
      .map { p => fs.delete(p, true); p.getName }
    }
  }

  /** AS-OF read with the horizon in the failure mode: resolves the
    * version live at `ts` and reads it; when every retained version
    * postdates `ts`, fails naming the declared retention so the caller
    * knows WHY the history is gone (vacuumed past it) or how far back
    * reads can go. */
  def readAsOf(spark: SparkSession, root: String, ts: Long): DataFrame =
    versionAsOf(spark, root, ts) match {
      case Some(v) => readVersion(spark, root, v)
      case None => throw new IllegalArgumentException(
        s"no retained version of $root is as old as $ts — retention " +
          s"horizon: ${retention(spark, root).fold("none declared")(_.describe)}; " +
          "older versions were vacuumed (or the table postdates the timestamp)")
    }

  /** All retained COMMITTED version dirs, NEWEST first — orphan dirs
    * from a crashed publish (no `_committed` marker and not the pointer
    * target) are excluded so AS-OF resolution never serves data that was
    * never live (ADVICE r12). Ordering is the explicit [[CommitSeq]]
    * publish sequence where present (ADVICE r14 — immune to mtime
    * granularity ties that the old (-mtime, name) rule broke on random
    * UUID names); seq-less legacy dirs sort after all seq-carrying ones
    * by the old rule. The LIVE version is always `currentVersion`, never
    * this ordering. */
  def listVersions(spark: SparkSession, root: String): Seq[(String, Long)] = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    if (!fs.exists(rootP)) return Seq.empty
    val live = currentVersion(spark, root)
    // Pre-epoch roots (written before marker discipline existed) carry no
    // markers anywhere: grandfather every dir as committed, exactly the
    // pre-marker semantics, so upgrading the library never reclassifies
    // committed history as orphans (ADVICE r13 medium).
    val legacy = !fs.exists(new Path(rootP, MarkerEpoch))
    fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
      .filter(s => legacy || live.contains(s.getPath.getName) ||
        fs.exists(new Path(s.getPath, CommittedMarker)))
      .map(s => (s.getPath.getName, s.getModificationTime,
        commitSeqOf(spark, s.getPath)))
      // seq-carrying versions first, newest (highest seq) leading — the
      // explicit publish order (ADVICE r14); seq-less legacy dirs after
      // them under the old (-mtime, name) rule. Any seq-carrying version
      // postdates every seq-less one on a root (seq writing started with
      // this code), so the two regimes never interleave.
      .sortBy { case (name, mtime, seq) =>
        (seq.isEmpty, -seq.getOrElse(0L), -mtime, name) }
      .map { case (name, mtime, _) => (name, mtime) }
  }

  /** The retained version that was LIVE at `ts` (epoch millis): the
    * newest version whose commit time (dir mtime — see listVersions'
    * caveats) is ≤ ts. "AS OF timestamp" for this layout: publishes are
    * serial under the single-maintenance-writer contract, so mtime order
    * IS publish order wherever the filesystem clock has sane
    * granularity. None when every retained version postdates `ts`. */
  def versionAsOf(spark: SparkSession, root: String, ts: Long): Option[String] =
    listVersions(spark, root).filter(_._2 <= ts)
      .sortBy { case (name, mtime) => (-mtime, name) }.headOption.map(_._1)

  /** Time travel: read a RETAINED (possibly non-live) version. Old
    * versions stay fully intact until `vacuum`, so any un-vacuumed
    * version reads exactly as it was published — pair with
    * `Dedup.snapshotDiff(readVersion(...), read(...), ...)` to audit
    * what a rebuild changed. */
  def readVersion(spark: SparkSession, root: String, version: String): DataFrame = {
    val dir = new Path(root, version)
    if (!fsOf(spark, dir).exists(dir))
      throw new IllegalArgumentException(
        s"version $version does not exist under $root (vacuumed, or never " +
          "committed) — listVersions names the retained ones")
    if (!isCommitted(spark, root, version))
      throw new IllegalArgumentException(
        s"version $version under $root was never committed (orphan of a " +
          "crashed publish) — its data is invisible by contract; vacuum " +
          "reclaims it")
    spark.read.parquet(dir.toString)
  }
}
