package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Small-file compaction for parquet datasets — the maintenance pass every
 * long-running pipeline needs: streaming sinks (foreachBatch per-batch
 * dirs), per-partition exports, and incremental appends all accrete files
 * far below the ideal scan granularity, and at 100 TB a scan's task count
 * (and the namenode/listing load) is driven by FILE count, not byte
 * count.
 *
 * Strategy: size the output file count from the dataset's actual on-disk
 * bytes (`targetBytes` per file, default 128 MB = one HDFS-ish block /
 * one healthy parquet row group), rewrite with a round-robin
 * `repartition(n)` (balanced output files regardless of input skew), and
 * swap via a sibling temp dir + two renames. All filesystem access goes
 * through the Hadoop FileSystem API, so the same code runs on local
 * disk, HDFS (where rename is atomic), and S3-compatible stores (where
 * the swap window widens to the copy — callers there should compact into
 * a NEW dataset version instead; the rewrite step is identical). The
 * rewrite is one narrow-input shuffle-write job — no aggregation state;
 * at cluster scale it parallelizes per output file.
 *
 * Hive-partitioned layouts (`key=value` subdirectories) are compacted
 * PER LEAF: partition values live only in the directory names, so a flat
 * rewrite of the root would both lose those values and flatten the
 * layout that partition pruning depends on. Each leaf directory is a
 * plain parquet dir and goes through the flat algorithm in place; the
 * directory tree — and therefore pruning — is preserved exactly.
 */
object Compactor {

  final case class CompactResult(
      filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  private def parquetFiles(fs: FileSystem, dir: Path): Seq[Path] = {
    if (!fs.exists(dir)) return Seq.empty
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.result()
  }

  /** A dataset is hive-partitioned iff its root has `key=value` child
    * directories (Spark's own partition-discovery convention). */
  private def isHiveLayout(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists(s =>
      s.isDirectory && s.getPath.getName.contains("="))

  /** A hive root must not ALSO hold loose data files: Spark's own
    * partition discovery rejects that layout ("conflicting directory
    * structures"), and per-leaf compaction would silently skip the loose
    * files — refuse loudly instead. */
  private def requireCleanHiveRoot(fs: FileSystem, dir: Path): Unit = {
    val loose = fs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(loose.isEmpty,
      s"$dir mixes key=value partition dirs with ${loose.length} root-level " +
        "parquet files — not a valid hive layout; compact the loose files " +
        "into a partition (or a separate dataset) first")
  }

  /** Work-dir names for the two-rename swap: leading `_` so Spark/Hadoop
    * readers ignore crash leftovers (the `_temporary` convention), and
    * any `=` in a hive LEAF name replaced so the sibling dir inside the
    * dataset root can never parse as a phantom partition value. */
  private def workDir(dir: Path, tag: String, suffix: String): Path =
    new Path(dir.getParent,
      "_" + dir.getName.replace('=', '-') + s"__${tag}_$suffix")

  /** Leaf data directories of a hive tree: descend through `key=value`
    * levels; a directory with no partition-style children is a leaf.
    * Every NON-leaf level is held to the same no-loose-files rule as the
    * root — a stray parquet beside partition dirs would otherwise be
    * silently skipped by per-leaf compaction. The same rule covers
    * non-partition SUBDIRECTORIES that hold parquet (Spark's discovery
    * rejects those layouts too; silently skipping their files would
    * contradict the refuse-loudly intent). Hidden dirs (`_`/`.` prefix —
    * `_temporary`, our own `_…__compacting` work dirs) are exempt, per
    * the Spark/Hadoop convention that readers ignore them. */
  private def leafDirs(fs: FileSystem, dir: Path): Seq[Path] = {
    val children = fs.listStatus(dir)
    val parts = children.filter(s =>
      s.isDirectory && s.getPath.getName.contains("=")).map(_.getPath)
    if (parts.isEmpty) Seq(dir)
    else {
      val loose = children.filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(loose.isEmpty,
        s"$dir mixes key=value partition dirs with ${loose.length} loose " +
          "parquet files — not a valid hive layout; per-leaf compaction " +
          "would silently skip them")
      val stray = children.filter { s =>
        val n = s.getPath.getName
        s.isDirectory && !n.contains("=") &&
          !n.startsWith("_") && !n.startsWith(".") &&
          parquetFiles(fs, s.getPath).nonEmpty
      }
      require(stray.isEmpty,
        s"$dir holds non-partition subdirectories with parquet files " +
          s"(${stray.map(_.getPath.getName).mkString(", ")}) — not a valid " +
          "hive layout; per-leaf compaction would silently skip them")
      parts.toSeq.flatMap(p => leafDirs(fs, p))
    }
  }

  /** Run one flat compaction per leaf CONCURRENTLY — at hive scale the
    * leaf count can be in the thousands, and each leaf's rewrite is an
    * independent Spark job pair; serial submission would make wall-clock
    * linear in partition count instead of bounded by cluster capacity. */
  private def perLeaf(fs: FileSystem, dir: Path)(
      f: Path => CompactResult): CompactResult = {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val leaves = leafDirs(fs, dir)
    combine(Await.result(
      Future.sequence(leaves.map(l => Future(f(l)))), Duration.Inf))
  }

  private def combine(rs: Seq[CompactResult]): CompactResult =
    CompactResult(rs.map(_.filesBefore).sum, rs.map(_.filesAfter).sum,
      rs.map(_.bytes).sum, rs.map(_.rows).sum)

  /**
   * Selective compaction (the Delta-OPTIMIZE shape): only files below
   * `targetBytes / 2` are read and bin-packed; healthy files are MOVED
   * (a rename, not a byte copy) into the new dataset directory. At
   * 100 TB the difference between "rewrite everything" and "rewrite the
   * 2% sprawl" is the whole cost of the operation — bytes rewritten is
   * proportional to the sprawl, not the dataset. Hive-partitioned
   * datasets are compacted per leaf directory (layout preserved).
   */
  def compactParquetSelective(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactResult = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (isHiveLayout(fs, dir)) {
      requireCleanHiveRoot(fs, dir)
      perLeaf(fs, dir)(l => selectiveFlat(spark, fs, l, targetBytes))
    } else selectiveFlat(spark, fs, dir, targetBytes)
  }

  private def selectiveFlat(spark: SparkSession, fs: FileSystem, dir: Path,
      targetBytes: Long): CompactResult = {
    val before = parquetFiles(fs, dir)
    if (before.isEmpty) return CompactResult(0, 0, 0L, 0L)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val (healthy, small) =
      before.partition(f => fs.getFileStatus(f).getLen >= targetBytes / 2)
    if (small.size <= 1) { // nothing to pack (one straggler is already packed)
      val rows = spark.read.parquet(dir.toString).count()
      return CompactResult(before.size, before.size, bytes, rows)
    }
    val smallBytes = small.map(fs.getFileStatus(_).getLen).sum
    val packed = math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    // healthy files are tracked by their path RELATIVE to the dataset dir
    // so they can be re-addressed after the live dir is renamed away —
    // bare names would break on datasets with (non-hive) subdirectories
    // qualify before relativizing: listed file paths carry the scheme
    // (file:/, hdfs://…) while a caller-constructed dir may not
    val dirPrefix = fs.makeQualified(dir).toString + "/"
    val healthyRel = healthy.map { f =>
      val fq = fs.makeQualified(f).toString
      require(fq.startsWith(dirPrefix), s"$f is not under $dir")
      fq.substring(dirPrefix.length)
    }
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmp = workDir(dir, "compacting", suffix)
    val old = workDir(dir, "precompact", suffix)
    try {
      // read ONLY the sprawl; healthy bytes never move through Spark
      spark.read.parquet(small.map(_.toString): _*)
        .repartition(packed)
        .write.parquet(tmp.toString)
      // swap FIRST, then migrate healthy files out of the displaced dir:
      // the live name always points at a COMPLETE dataset when present —
      // it never shows a dataset with healthy files already moved out (the
      // round-7 crash window). The absence window spans both renames AND
      // the per-healthy-file migration loop between them (one rename per
      // healthy file — long on many-file datasets or slow object stores);
      // readers that cannot tolerate it should use the versioned layout
      // (Versioned.scala), whose pointer swap has no absence window at all
      if (!fs.rename(dir, old))
        throw new java.io.IOException(s"rename $dir -> $old failed")
      try {
        healthyRel.zipWithIndex.foreach { case (rel, i) =>
          if (!fs.rename(new Path(old, rel), new Path(tmp, f"part-healthy-$i%05d.parquet")))
            throw new java.io.IOException(s"rename healthy $rel into $tmp failed")
        }
        if (!fs.rename(tmp, dir))
          throw new java.io.IOException(s"rename $tmp -> $dir failed")
      } catch {
        case e: Throwable =>
          // undo: healthy files back into the displaced dir, then restore
          // its live name — the original dataset reappears intact. Flat
          // restore names are fine: the undo only needs the bytes back
          // under the live name, not the original nesting. Every rename
          // result is checked: a silently-failed restore would re-liven a
          // dataset MISSING healthy files.
          val unrestored = parquetFiles(fs, tmp)
            .filter(_.getName.startsWith("part-healthy-"))
            .filterNot(f => fs.rename(f, new Path(old, f.getName)))
          if (unrestored.nonEmpty)
            throw new java.io.IOException(
              s"undo incomplete: ${unrestored.size} healthy files could not " +
                s"be moved back from $tmp — dataset at $old is missing them; " +
                "manual recovery required (both dirs preserved)", e)
          if (!fs.rename(old, dir))
            throw new java.io.IOException(
              s"undo failed: dataset is intact at $old but could not be " +
                s"renamed back to $dir — manual recovery required", e)
          throw e
      }
      fs.delete(old, true)
      val after = parquetFiles(fs, dir)
      CompactResult(before.size, after.size, bytes,
        spark.read.parquet(dir.toString).count())
    } catch {
      case e: Throwable =>
        // only drop tmp when it holds no displaced healthy files — if the
        // inner undo itself failed, deleting tmp would destroy the only
        // copy of the healthy bytes; leave both dirs for manual recovery
        if (fs.exists(tmp) &&
            !parquetFiles(fs, tmp).exists(_.getName.startsWith("part-healthy-")))
          fs.delete(tmp, true)
        throw e
    }
  }

  /** Rewrite `path` (a parquet dataset directory) into
    * ⌈bytes / targetBytes⌉ balanced files. Returns before/after stats.
    * No-op (0 rewrites) when the dataset already has ≤ that many files.
    * Hive-partitioned datasets are rewritten per leaf directory, so the
    * `key=value` tree — and partition pruning over it — survives. */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactResult = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (isHiveLayout(fs, dir)) {
      requireCleanHiveRoot(fs, dir)
      perLeaf(fs, dir)(l => rewriteFlat(spark, fs, l, targetBytes))
    } else rewriteFlat(spark, fs, dir, targetBytes)
  }

  private def rewriteFlat(spark: SparkSession, fs: FileSystem, dir: Path,
      targetBytes: Long): CompactResult = {
    val before = parquetFiles(fs, dir)
    if (before.isEmpty) return CompactResult(0, 0, 0L, 0L)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before.size <= targetFiles) {
      val rows = spark.read.parquet(dir.toString).count()
      return CompactResult(before.size, before.size, bytes, rows)
    }
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmp = workDir(dir, "compacting", suffix)
    val old = workDir(dir, "precompact", suffix)
    try {
      spark.read.parquet(dir.toString)
        .repartition(targetFiles)
        .write.parquet(tmp.toString)
      // two renames: the live name is absent only between them; a crash
      // leaves either the original or the compacted data plus a leftover
      // dir — never a partial mix under the live name
      if (!fs.rename(dir, old))
        throw new java.io.IOException(s"rename $dir -> $old failed")
      if (!fs.rename(tmp, dir)) {
        fs.rename(old, dir) // restore before failing
        throw new java.io.IOException(s"rename $tmp -> $dir failed")
      }
      fs.delete(old, true) // best-effort cleanup of displaced originals
      val after = parquetFiles(fs, dir)
      CompactResult(before.size, after.size, bytes,
        spark.read.parquet(dir.toString).count())
    } catch {
      case e: Throwable =>
        if (!fs.exists(dir) && fs.exists(old)) fs.rename(old, dir)
        if (fs.exists(tmp)) fs.delete(tmp, true)
        throw e
    }
  }
}
