package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
 * swap atomically-enough via a sibling temp dir + two renames. The
 * rewrite is one narrow-input shuffle-write job — no aggregation state;
 * at cluster scale it parallelizes per output file.
 */
object Compactor {

  final case class CompactResult(
      filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  private def parquetFiles(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(dir)) Seq.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
  }

  /** Rewrite `path` (a parquet dataset directory) into
    * ⌈bytes / targetBytes⌉ balanced files. Returns before/after stats.
    * No-op (0 rewrites) when the dataset already has ≤ that many files. */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactResult = {
    val dir = Paths.get(path)
    val before = parquetFiles(dir)
    val bytes = before.map(Files.size(_)).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before.size <= targetFiles) {
      val rows = spark.read.parquet(path).count()
      return CompactResult(before.size, before.size, bytes, rows)
    }
    val tmp = dir.resolveSibling(dir.getFileName.toString +
      s"__compacting_${java.util.UUID.randomUUID().toString.take(8)}")
    val old = dir.resolveSibling(dir.getFileName.toString + "__precompact")
    try {
      spark.read.parquet(path)
        .repartition(targetFiles)
        .write.parquet(tmp.toString)
      // two renames: live dir is absent only between them; a crash leaves
      // either the original or the compacted data plus a leftover dir —
      // never a partial mix under the live name
      Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      // best-effort cleanup of the displaced originals
      import scala.jdk.CollectionConverters._
      Files.walk(old).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      val after = parquetFiles(dir)
      CompactResult(before.size, after.size, bytes,
        spark.read.parquet(path).count())
    } catch {
      case e: Throwable =>
        // roll back: restore the original under the live name if displaced
        if (!Files.exists(dir) && Files.exists(old))
          Files.move(old, dir, StandardCopyOption.ATOMIC_MOVE)
        import scala.jdk.CollectionConverters._
        if (Files.exists(tmp))
          Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        throw e
    }
  }
}
