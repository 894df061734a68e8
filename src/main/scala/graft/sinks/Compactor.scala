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

  /**
   * Selective compaction (the Delta-OPTIMIZE shape): only files below
   * `targetBytes / 2` are read and bin-packed; healthy files are MOVED
   * (a rename, not a byte copy) into the new dataset directory. At
   * 100 TB the difference between "rewrite everything" and "rewrite the
   * 2% sprawl" is the whole cost of the operation — bytes rewritten is
   * proportional to the sprawl, not the dataset.
   */
  def compactParquetSelective(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactResult = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val before = parquetFiles(fs, dir)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val (healthy, small) =
      before.partition(f => fs.getFileStatus(f).getLen >= targetBytes / 2)
    if (small.size <= 1) { // nothing to pack (one straggler is already packed)
      val rows = spark.read.parquet(path).count()
      return CompactResult(before.size, before.size, bytes, rows)
    }
    val smallBytes = small.map(fs.getFileStatus(_).getLen).sum
    val packed = math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(dir.getParent, dir.getName + s"__compacting_$suffix")
    val old = new Path(dir.getParent, dir.getName + s"__precompact_$suffix")
    try {
      // read ONLY the sprawl; healthy bytes never move through Spark
      spark.read.parquet(small.map(_.toString): _*)
        .repartition(packed)
        .write.parquet(tmp.toString)
      // pull the healthy files in by rename (cheap on HDFS/local)
      healthy.zipWithIndex.foreach { case (f, i) =>
        if (!fs.rename(f, new Path(tmp, f"part-healthy-$i%05d.parquet")))
          throw new java.io.IOException(s"rename $f into $tmp failed")
      }
      if (!fs.rename(dir, old))
        throw new java.io.IOException(s"rename $dir -> $old failed")
      if (!fs.rename(tmp, dir)) {
        fs.rename(old, dir)
        throw new java.io.IOException(s"rename $tmp -> $dir failed")
      }
      fs.delete(old, true)
      val after = parquetFiles(fs, dir)
      CompactResult(before.size, after.size, bytes,
        spark.read.parquet(path).count())
    } catch {
      case e: Throwable =>
        // restore the live dir first, then move any healthy files that
        // already migrated into tmp back home, then drop tmp
        if (!fs.exists(dir) && fs.exists(old)) fs.rename(old, dir)
        if (fs.exists(tmp)) {
          parquetFiles(fs, tmp)
            .filter(_.getName.startsWith("part-healthy-"))
            .foreach(f => fs.rename(f, new Path(dir, f.getName)))
          fs.delete(tmp, true)
        }
        throw e
    }
  }

  /** Rewrite `path` (a parquet dataset directory) into
    * ⌈bytes / targetBytes⌉ balanced files. Returns before/after stats.
    * No-op (0 rewrites) when the dataset already has ≤ that many files. */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactResult = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val before = parquetFiles(fs, dir)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before.size <= targetFiles) {
      val rows = spark.read.parquet(path).count()
      return CompactResult(before.size, before.size, bytes, rows)
    }
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(dir.getParent, dir.getName + s"__compacting_$suffix")
    val old = new Path(dir.getParent, dir.getName + s"__precompact_$suffix")
    try {
      spark.read.parquet(path)
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
        spark.read.parquet(path).count())
    } catch {
      case e: Throwable =>
        if (!fs.exists(dir) && fs.exists(old)) fs.rename(old, dir)
        if (fs.exists(tmp)) fs.delete(tmp, true)
        throw e
    }
  }
}
