package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Versioned layout (object-store-safe commits): pointer-swap semantics,
  * crash injection between version write and pointer commit (VERDICT r8
  * next #3 — the old version must stay served), compaction-into-version,
  * vacuum. */
class VersionedSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_versioned_").toString

  test("writeVersioned publishes, read resolves the live version") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned(Seq(1L, 2L, 3L).toDF("x"), root)
    assert(Versioned.currentVersion(spark, root).contains(v1))
    assert(Versioned.read(spark, root).as[Long].collect().sorted === Array(1L, 2L, 3L))
    val v2 = Versioned.writeVersioned(Seq(9L).toDF("x"), root)
    assert(v2 !== v1)
    assert(Versioned.read(spark, root).as[Long].collect() === Array(9L))
    // the displaced version is retained (vacuum is a separate, later step)
    assert(new java.io.File(s"$root/$v1").isDirectory)
  }

  test("crash between version write and pointer swap: old version stays served") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned(Seq(1L, 2L).toDF("x"), root)
    // staged table write dies after materializing the full new version
    // but before the commit — exactly the kill window the two-rename swap
    // could not survive on an object store
    val boom = intercept[RuntimeException] {
      Versioned.publish(spark, root) { dir =>
        Seq(7L, 8L).toDF("x").write.parquet(dir)
        throw new RuntimeException("kill -9 before pointer swap")
      }
    }
    assert(boom.getMessage.contains("before pointer swap"))
    // pointer untouched: readers still serve v1's bytes
    assert(Versioned.currentVersion(spark, root).contains(v1))
    assert(Versioned.read(spark, root).as[Long].collect().sorted === Array(1L, 2L))
    // the orphaned version dir exists (fully written) and vacuum reclaims
    // it without touching the live version
    val orphans = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-") && f.getName != v1)
    assert(orphans.length === 1)
    val removed = Versioned.vacuum(spark, root)
    assert(removed === Seq(orphans.head.getName))
    assert(Versioned.read(spark, root).as[Long].collect().sorted === Array(1L, 2L))
  }

  test("versioned compaction: new compacted version committed, content identical, no absence window") {
    val root = freshRoot()
    // sprawl: 8 single-row files in the live version
    val df = spark.range(0, 80).select(col("id"), (col("id") * 2).as("y"))
    Versioned.publish(spark, root)(dir => df.repartition(8).write.parquet(dir))
    val before = Versioned.resolve(spark, root)
    val r = Versioned.compact(spark, root, targetBytes = 1L << 30)
    assert(r.filesBefore === 8)
    assert(r.filesAfter === 1)
    assert(r.rows === 80)
    val after = Versioned.resolve(spark, root)
    assert(after !== before)
    // old version's bytes are still on disk (readers mid-scan unaffected)
    assert(new java.io.File(before).isDirectory)
    val got = spark.read.parquet(after).orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got === want)
    // compaction is a no-op when already at/below the target file count
    val r2 = Versioned.compact(spark, root, targetBytes = 1L << 30)
    assert(r2.filesAfter === r2.filesBefore)
  }

  test("crash during compaction rewrite: pointer and live data unaffected") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned((1L to 10L).toDF("x"), root)
    intercept[RuntimeException] {
      Versioned.publish(spark, root) { dir =>
        // half-written version: one file lands, then the job dies
        Seq(99L).toDF("x").write.parquet(dir)
        throw new RuntimeException("executor lost mid-compaction")
      }
    }
    assert(Versioned.currentVersion(spark, root).contains(v1))
    assert(Versioned.read(spark, root).as[Long].collect().sorted === (1L to 10L).toArray)
  }

  test("commit contract: one publish = exactly one atomic rename, no put fallback") {
    // Pins the FileSystem assumption the 100-TB story rests on
    // (docs/PLANS.md "Versioned commit contract"): on a rename-capable
    // filesystem (HDFS / local POSIX — this suite), the pointer swap is
    // ONE FileContext.rename(OVERWRITE) — never the put fallback, never
    // a second commit op. Observer seam, same pattern as
    // IvfAppendCrashSpec's kill hook.
    val root = freshRoot()
    import spark.implicits._
    val commits = scala.collection.mutable.ArrayBuffer[(String, String)]()
    Versioned.commitObserver = (p, route) => commits.synchronized {
      commits += ((p.getName, route)); ()
    }
    try {
      Versioned.writeVersioned(Seq(1L).toDF("x"), root)
      assert(commits.toList == List((Versioned.Pointer, "rename")),
        s"expected exactly one rename-route commit, saw $commits")
      // no temp debris from the swap
      val leftovers = new java.io.File(root).listFiles
        .filter(_.getName.startsWith(s".${Versioned.Pointer}.tmp-"))
      assert(leftovers.isEmpty, s"stranded temp pointers: ${leftovers.toSeq}")
    } finally Versioned.commitObserver = (_, _) => ()
  }

  test("conditional-put hook: commits route through it; a rejection raises") {
    // The object-store CAS seam: with a conditional put installed, the
    // primitive consults it INSTEAD of rename/put, and a precondition
    // failure (concurrent committer) surfaces as an error — lost updates
    // are detected, never silently last-writer-won.
    val root = freshRoot()
    import spark.implicits._
    val applied = scala.collection.mutable.ArrayBuffer[String]()
    Versioned.setConditionalPut { (s, target, bytes) =>
      applied += new String(bytes, "UTF-8").trim
      // apply it for real so the layout stays consistent
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      val out = fs.create(target, true)
      try out.write(bytes) finally out.close()
      true
    }
    try {
      val v1 = Versioned.writeVersioned(Seq(1L).toDF("x"), root)
      assert(applied.toList == List(v1), "commit must route through the hook")
      assert(Versioned.currentVersion(spark, root).contains(v1))
      // now a hook that reports a failed precondition
      Versioned.setConditionalPut((_, _, _) => false)
      val err = intercept[java.io.IOException] {
        Versioned.writeVersioned(Seq(2L).toDF("x"), root)
      }
      assert(err.getMessage.contains("conditional put"))
      // the rejected commit left the old version live
      assert(Versioned.currentVersion(spark, root).contains(v1))
    } finally Versioned.clearConditionalPut()
  }

  test("racing commits under CAS: winner lands, loser raises, winner's bytes serve") {
    // VERDICT r12 next #4: the conditional-put rejection path driven as a
    // RACE — two committers derive versions from the same base; the CAS
    // precondition admits the first pointer swap and rejects the second
    // (the stale-ETag shape). The loser must raise (lost update
    // DETECTED), the winner's bytes must serve, and the loser's version
    // dir must stay an invisible orphan until vacuum.
    val root = freshRoot()
    import spark.implicits._
    val base = Versioned.writeVersioned(Seq(0L).toDF("x"), root)
    // both racers fully materialize their version dirs first
    val dirA = s"v-racer-a"; val dirB = s"v-racer-b"
    Seq(1L).toDF("x").write.parquet(s"$root/$dirA")
    Seq(2L).toDF("x").write.parquet(s"$root/$dirB")
    val firstWins = new java.util.concurrent.atomic.AtomicBoolean(true)
    Versioned.setConditionalPut { (s, target, bytes) =>
      if (firstWins.compareAndSet(true, false)) {
        val fsys = target.getFileSystem(s.sessionState.newHadoopConf())
        val out = fsys.create(target, true)
        try out.write(bytes) finally out.close()
        true
      } else false
    }
    try {
      Versioned.commit(spark, root, dirA) // winner
      val err = intercept[java.io.IOException](
        Versioned.commit(spark, root, dirB)) // loser: stale precondition
      assert(err.getMessage.contains("conditional put"))
    } finally Versioned.clearConditionalPut()
    assert(Versioned.currentVersion(spark, root).contains(dirA))
    assert(Versioned.read(spark, root).as[Long].collect().toSeq == Seq(1L))
    // the loser's fully-written dir is an orphan: not committed, not in
    // AS-OF history, reclaimed by vacuum; the winner and base survive
    assert(!Versioned.isCommitted(spark, root, dirB))
    assert(Versioned.listVersions(spark, root).map(_._1).toSet == Set(base, dirA))
    assert(Versioned.vacuum(spark, root, keep = Set(base)) == Seq(dirB))
  }

  test("orphans of a crashed publish are invisible to AS-OF and time travel") {
    // ADVICE r12: a crash after write(dir) but before the pointer swap
    // leaves a fully-listable version dir that was never live. It must
    // not surface through listVersions / versionAsOf / readVersion —
    // uncommitted state stays invisible until vacuum reclaims it.
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned(Seq(1L, 2L).toDF("x"), root)
    Thread.sleep(20)
    intercept[RuntimeException] {
      Versioned.publish(spark, root) { dir =>
        Seq(666L).toDF("x").write.parquet(dir)
        throw new RuntimeException("crash before pointer swap")
      }
    }
    val orphan = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-") && f.getName != v1)
      .head.getName
    // the orphan is NEWER than v1 by mtime, but committed history excludes it
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v1))
    assert(Versioned.versionAsOf(spark, root,
      System.currentTimeMillis() + 10000).contains(v1),
      "AS-OF resolved an orphan of a crashed publish")
    val e = intercept[IllegalArgumentException](
      Versioned.readVersion(spark, root, orphan))
    assert(e.getMessage.contains("never committed"))
    assert(!Versioned.isCommitted(spark, root, orphan))
    assert(Versioned.isCommitted(spark, root, v1))
    // vacuum reclaims it; a later real publish is unaffected
    assert(Versioned.vacuum(spark, root) == Seq(orphan))
    val v2 = Versioned.writeVersioned(Seq(3L).toDF("x"), root)
    assert(Versioned.listVersions(spark, root).map(_._1).toSet == Set(v1, v2))
  }

  test("marker-write crash window: pointer target counts as committed and heals on next commit") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned(Seq(1L).toDF("x"), root)
    // simulate a crash between pointer swap and marker write by deleting
    // the marker: the version IS the pointer target, so it stays committed
    val marker = new java.io.File(s"$root/$v1/${Versioned.CommittedMarker}")
    assert(marker.exists)
    assert(marker.delete())
    assert(Versioned.isCommitted(spark, root, v1))
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v1))
    Thread.sleep(20)
    // the next commit's repair step persists the marker before moving on,
    // so v1 stays in AS-OF history after the pointer leaves it
    val v2 = Versioned.writeVersioned(Seq(2L).toDF("x"), root)
    assert(marker.exists, "repair step must re-mark the outgoing live version")
    assert(Versioned.listVersions(spark, root).map(_._1).toSet == Set(v1, v2))
  }

  test("pre-marker migration: legacy roots grandfather marker-less history; first commit backfills") {
    // ADVICE r13 (medium): version dirs committed by pre-marker code carry
    // no _committed marker. Upgrading must NOT reclassify that committed
    // history as orphans — the _marker_epoch latch grandfathers dirs that
    // predate marker discipline, and the first marker-aware commit
    // backfills markers onto all of them before pinning the epoch.
    val root = freshRoot()
    import spark.implicits._
    // Simulate a pre-marker layout by hand: two version dirs + a pointer,
    // no markers, no epoch file — exactly what r12-era code left on disk.
    Seq(1L).toDF("x").write.parquet(s"$root/v-legacy-old")
    Thread.sleep(20)
    Seq(2L).toDF("x").write.parquet(s"$root/v-legacy-live")
    val fw = new java.io.FileWriter(s"$root/${Versioned.Pointer}")
    fw.write("v-legacy-live\n"); fw.close()
    assert(!new java.io.File(s"$root/v-legacy-old/${Versioned.CommittedMarker}").exists)
    // Legacy semantics: BOTH dirs are committed history, visible to
    // listVersions / AS-OF / readVersion, retained by a declared policy.
    assert(Versioned.listVersions(spark, root).map(_._1).toSet ==
      Set("v-legacy-old", "v-legacy-live"))
    assert(Versioned.isCommitted(spark, root, "v-legacy-old"))
    assert(Versioned.readVersion(spark, root, "v-legacy-old")
      .as[Long].collect().toSeq == Seq(1L))
    Versioned.setRetention(spark, root, Versioned.Retention(keepLast = Some(2)))
    assert(Versioned.vacuum(spark, root).isEmpty,
      "vacuum reclaimed pre-marker committed history inside the horizon")
    // First marker-aware commit: backfills markers on BOTH legacy dirs,
    // pins the epoch, and the new version gets its own marker post-swap.
    Thread.sleep(20)
    val v3 = Versioned.writeVersioned(Seq(3L).toDF("x"), root)
    assert(new java.io.File(s"$root/${Versioned.MarkerEpoch}").exists)
    assert(new java.io.File(s"$root/v-legacy-old/${Versioned.CommittedMarker}").exists)
    assert(new java.io.File(s"$root/v-legacy-live/${Versioned.CommittedMarker}").exists)
    assert(Versioned.listVersions(spark, root).map(_._1).toSet ==
      Set("v-legacy-old", "v-legacy-live", v3))
    // Post-epoch, orphan discipline is live again: a crashed publish's
    // dir is invisible and reclaimable (retention widened so only the
    // orphan is outside the horizon).
    Versioned.setRetention(spark, root, Versioned.Retention(keepLast = Some(3)))
    intercept[RuntimeException] {
      Versioned.publish(spark, root) { dir =>
        Seq(666L).toDF("x").write.parquet(dir)
        throw new RuntimeException("crash before pointer swap")
      }
    }
    assert(Versioned.listVersions(spark, root).map(_._1).toSet ==
      Set("v-legacy-old", "v-legacy-live", v3),
      "post-epoch orphan leaked into committed history")
    assert(Versioned.vacuum(spark, root).size == 1)
  }

  test("retention policy: vacuum keeps the horizon; AS-OF inside it serves, beyond it names the horizon") {
    // VERDICT r12 next #7: keep-last-N declared beside _current, honored
    // by vacuum, so AS-OF reads have a documented horizon.
    val root = freshRoot()
    import spark.implicits._
    Versioned.setRetention(spark, root, Versioned.Retention(keepLast = Some(2)))
    assert(Versioned.retention(spark, root).get.keepLast.contains(2))
    val v1 = Versioned.writeVersioned(Seq(1L).toDF("x"), root)
    Thread.sleep(20)
    val t1 = System.currentTimeMillis(); Thread.sleep(20)
    val v2 = Versioned.writeVersioned(Seq(2L).toDF("x"), root)
    Thread.sleep(20)
    val t2 = System.currentTimeMillis(); Thread.sleep(20)
    val v3 = Versioned.writeVersioned(Seq(3L).toDF("x"), root)
    // vacuum under keep_last=2: v1 goes, v2 (newest-but-one) + live v3 stay
    assert(Versioned.vacuum(spark, root) == Seq(v1))
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v3, v2))
    // AS-OF inside the horizon serves after the vacuum
    assert(Versioned.readAsOf(spark, root, t2).as[Long].collect().toSeq == Seq(2L))
    // beyond it: fails loudly, naming the declared horizon
    val err = intercept[IllegalArgumentException](
      Versioned.readAsOf(spark, root, t1))
    assert(err.getMessage.contains("keep_last=2"), err.getMessage)
    // a second vacuum under the same policy is a no-op
    assert(Versioned.vacuum(spark, root).isEmpty)
    // keep-since-T: everything younger than an hour survives vacuum
    Versioned.setRetention(spark, root,
      Versioned.Retention(keepMillis = Some(3600L * 1000)))
    assert(Versioned.vacuum(spark, root).isEmpty)
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v3, v2))
    // keep_ms=0: only the live version is inside the age horizon
    Versioned.setRetention(spark, root, Versioned.Retention(keepMillis = Some(0L)))
    Thread.sleep(20)
    assert(Versioned.vacuum(spark, root) == Seq(v2))
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v3))
  }

  test("resolve on a non-versioned directory fails loudly") {
    val root = freshRoot()
    val e = intercept[IllegalStateException](Versioned.resolve(spark, root))
    assert(e.getMessage.contains("_current"))
  }

  test("commit refuses a version dir that does not exist") {
    val root = freshRoot()
    import spark.implicits._
    Versioned.writeVersioned(Seq(1L).toDF("x"), root)
    intercept[IllegalArgumentException](
      Versioned.commit(spark, root, "v-nonexistent"))
  }

  test("time travel: retained versions list newest-first and read as published") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Versioned.writeVersioned(
      Seq((1L, "kept"), (2L, "original"), (3L, "doomed")).toDF("id", "text"), root)
    Thread.sleep(50) // distinct mtimes for the newest-first ordering
    // (local fs has ms granularity; listVersions name-tiebreaks same-tick
    // mtimes for determinism on coarser filesystems)
    val v2 = Versioned.writeVersioned(
      Seq((1L, "kept"), (2L, "REWRITTEN"), (4L, "fresh")).toDF("id", "text"), root)
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v2, v1))
    // the displaced version reads exactly as it was published
    assert(Versioned.readVersion(spark, root, v1)
      .orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("kept", "original", "doomed"))
    // the rebuild-audit combo: diff old version vs live
    val diff = graft.operators.Dedup.snapshotDiff(
      Versioned.readVersion(spark, root, v1), Versioned.read(spark, root),
      "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // a vacuumed version refuses loudly; the live one still reads
    Versioned.vacuum(spark, root)
    intercept[IllegalArgumentException](Versioned.readVersion(spark, root, v1))
    assert(Versioned.listVersions(spark, root).map(_._1) == Seq(v2))
  }

  test("listVersions orders by the explicit commit sequence, immune to mtime ties (ADVICE r14)") {
    val root = freshRoot()
    import spark.implicits._
    val names = (1 to 4).map(i =>
      Versioned.writeVersioned(Seq(i.toLong).toDF("x"), root))
    // force IDENTICAL mtimes on every version dir — the coarse-mtime
    // filesystem worst case, where the old (-mtime, name) rule
    // degenerated to random-UUID name order and could mis-resolve
    // versionForBatch's oldest-version-with-batch-id (and through it the
    // CDC→rollup delta pair)
    val now = (System.currentTimeMillis() / 1000L) * 1000L
    names.foreach { v =>
      assert(new java.io.File(s"$root/$v").setLastModified(now)) }
    val listed = Versioned.listVersions(spark, root).map(_._1)
    assert(listed == names.reverse,
      s"expected newest-first commit order ${names.reverse}, got $listed")
    // seq survives further commits after the tie
    val v5 = Versioned.writeVersioned(Seq(5L).toDF("x"), root)
    assert(Versioned.listVersions(spark, root).map(_._1).head == v5)
  }
}
