package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Maintenance-writer lease: turns the repo-wide SINGLE MAINTENANCE
 * WRITER contract (documented on every index append/compact/retrain/
 * vacuum since round 13) from documentation into an enforced runtime
 * check. The design is the Delta/Iceberg commit-service shape scaled to
 * the one primitive this layout already trusts: a single small control
 * object (`_lease` at the index root) holding `holder expiresAtMillis`,
 * swapped through [[Versioned.atomicOverwrite]] — which means on object
 * stores with a configured conditional put ([[Versioned.setConditionalPut]],
 * S3 If-Match / GCS generation) the claim is a true compare-and-swap,
 * and everywhere else it is atomic-per-object with a read-back
 * verification that closes the tightest practical race window:
 *
 *   1. read `_lease`; a live record held by SOMEONE ELSE fails the
 *      acquire immediately ([[LeaseHeldException]]) — BEFORE the caller
 *      publishes any data file, so the losing writer leaves no debris;
 *   2. write our claim (CAS where configured; atomic PUT otherwise);
 *   3. re-read and require the object now names us — two writers that
 *      both passed step 1 race at step 2, and the read-back makes the
 *      loser raise instead of proceeding on a lease it does not hold.
 *      (Without a conditional put, two writers whose writes AND
 *      read-backs fully interleave can still both believe they won —
 *      the same residual window every mtime/marker scheme has; the
 *      conditional-put seam exists precisely to close it on stores
 *      that matter. The read-back converts the common races into loud
 *      failures either way.)
 *
 * Expiry gives crashed-holder recovery: a claim carries a TTL, a dead
 * writer's lease simply times out, and the next acquire takes over —
 * no janitor required. Release overwrites the record with an
 * already-expired tombstone rather than deleting the object (a delete
 * is not atomic against a concurrent claimer's temp-file rename on
 * every filesystem, and an absent-vs-expired distinction buys nothing).
 *
 * Re-entrancy: maintenance operations nest (exactly-once append sweeps
 * uncommitted files first; compaction reads through append helpers), so
 * [[withLease]] tracks held roots per thread and nested scopes on the
 * same root run under the outer claim without re-acquiring.
 */
object Lease {
  val LeaseFile = "_lease"
  /** Default claim TTL — comfortably above any single maintenance
    * operation at the scales this engine targets, small enough that a
    * crashed writer blocks the index for minutes, not hours. */
  val DefaultTtlMillis: Long = 10L * 60 * 1000

  final case class Claim(holder: String, expiresAtMillis: Long) {
    def live(now: Long): Boolean = expiresAtMillis > now
    def render: String = s"$holder $expiresAtMillis\n"
  }

  class LeaseHeldException(msg: String) extends IllegalStateException(msg)

  /** Raised at COMMIT time when a leased operation outlived its claim:
    * the `_lease` object no longer names us (a rival acquired after our
    * expiry) or the claim has expired. Failing before the pointer swap
    * turns the silent lost-update into a loud abort (ADVICE r16). */
  class LeaseLostException(msg: String) extends IllegalStateException(msg)

  /** Test seam: the clock, so expiry specs advance time instead of
    * sleeping. Production value is wall-clock millis. */
  @volatile private[graft] var clock: () => Long =
    () => System.currentTimeMillis()

  private val jvmId = java.util.UUID.randomUUID().toString.take(8)

  private val held = new ThreadLocal[Map[String, Claim]] {
    override def initialValue(): Map[String, Claim] = Map.empty
  }

  private def parse(s: String): Option[Claim] = {
    val parts = s.trim.split("\\s+")
    if (parts.length != 2) None
    else parts(1).toLongOption.map(Claim(parts(0), _))
  }

  /** The current claim on `root`, live or expired; None if never leased. */
  def current(spark: SparkSession, root: String): Option[Claim] =
    Versioned.readSmallText(spark, new Path(root, LeaseFile)).flatMap(parse)

  /**
   * Claim the maintenance lease on `root` for `holder`. Raises
   * [[LeaseHeldException]] — before any data is written by the caller —
   * when another holder's claim is still live, or when the post-write
   * read-back shows a rival won the claim race. Acquiring a lease one
   * already holds renews it (extends the expiry).
   */
  def acquire(spark: SparkSession, root: String, holder: String,
      ttlMillis: Long = DefaultTtlMillis): Claim = {
    require(holder.nonEmpty && !holder.exists(_.isWhitespace),
      s"lease holder must be a non-empty token without whitespace: '$holder'")
    val now = clock()
    current(spark, root).filter(_.live(now)).filter(_.holder != holder)
      .foreach { c =>
        throw new LeaseHeldException(
          s"maintenance lease on $root is held by ${c.holder} until " +
            s"${c.expiresAtMillis} (now $now) — concurrent maintenance " +
            "writer; retry after it releases or expires")
      }
    val claim = Claim(holder, now + ttlMillis)
    Versioned.atomicOverwrite(spark, new Path(root, LeaseFile),
      claim.render.getBytes(StandardCharsets.UTF_8))
    val readBack = current(spark, root)
    if (!readBack.exists(_.holder == holder))
      throw new LeaseHeldException(
        s"lost the lease race on $root: wrote a claim for $holder but " +
          s"read back ${readBack.map(_.holder).getOrElse("<absent>")} — " +
          "a concurrent writer claimed between our check and write")
    claim
  }

  /** Release `holder`'s claim by expiring it in place. A release of a
    * lease someone else now holds is a no-op (we already lost it —
    * stomping the rival's live claim would be the actual bug). The
    * overwrite itself routes through [[Versioned.atomicOverwrite]] and
    * therefore the conditional-put seam where one is configured, which
    * makes the read-check-write a true CAS there; without CAS the
    * residual window (rival claims between our read and write) remains —
    * it is the same window [[verifyHeld]] converts into a loud abort on
    * the rival's commit path. */
  def release(spark: SparkSession, root: String, holder: String): Unit =
    current(spark, root).filter(_.holder == holder).foreach { _ =>
      Versioned.atomicOverwrite(spark, new Path(root, LeaseFile),
        Claim(holder, 0L).render.getBytes(StandardCharsets.UTF_8))
    }

  /**
   * Pre-commit re-validation (ADVICE r16 medium): when the calling
   * thread holds a lease on `root`, require the `_lease` object STILL
   * names our holder and is still live — an operation that outlived its
   * TTL (a large compaction or retrain at the 100 TB scales the docs
   * target) must abort BEFORE its version-pointer / manifest commit
   * rather than silently double-commit against the rival that acquired
   * after our expiry. A no-op on unleased roots (plain publishes keep
   * the single-writer contract by documentation, as before).
   * [[Versioned.commit]] and the ANN manifest commit call this at the
   * last responsible moment, so every leased operation gets the check
   * without touching call sites.
   */
  def verifyHeld(spark: SparkSession, root: String): Unit = {
    val key = new Path(root).toString
    held.get().get(key).foreach { claim =>
      val now = clock()
      val cur = current(spark, key)
      if (!cur.exists(c => c.holder == claim.holder && c.live(now)))
        throw new LeaseLostException(
          s"lease on $key lost before commit: held claim was " +
            s"'${claim.holder}' until ${claim.expiresAtMillis}, but now " +
            s"(${now}) the lease object holds " +
            s"${cur.map(c => s"'${c.holder}' until ${c.expiresAtMillis}")
              .getOrElse("<absent>")} — the operation outlived its TTL; " +
            "aborting instead of committing over a rival's work")
    }
  }

  /** Renew the lease this thread holds on `root` — the heartbeat for
    * maintenance jobs whose runtime may approach the TTL. Re-acquiring
    * with our own holder extends the expiry; raises if the claim was
    * already lost. */
  def renew(spark: SparkSession, root: String,
      ttlMillis: Long = DefaultTtlMillis): Unit = {
    val key = new Path(root).toString
    held.get().get(key) match {
      case None => throw new IllegalStateException(
        s"renew called on $key but this thread holds no lease there")
      case Some(claim) =>
        verifyHeld(spark, key)
        val renewed = acquire(spark, key, claim.holder, ttlMillis)
        held.set(held.get() + (key -> renewed))
    }
  }

  /**
   * Run `body` under the maintenance lease on `root` — the wrapper every
   * index append/compact/retrain/vacuum entry point routes through.
   * Nested scopes on the same root (exactly-once append → vacuum) run
   * under the outer claim. The holder id is unique per (JVM, thread,
   * scope) so two genuinely concurrent writers — even in one test JVM —
   * always collide.
   */
  def withLease[T](spark: SparkSession, root: String,
      ttlMillis: Long = DefaultTtlMillis)(body: => T): T = {
    val key = new Path(root).toString
    if (held.get().contains(key)) return body
    val holder =
      s"$jvmId-t${Thread.currentThread().getId}-" +
        java.util.UUID.randomUUID().toString.take(8)
    val claim = acquire(spark, key, holder, ttlMillis)
    held.set(held.get() + (key -> claim))
    try body
    finally {
      held.set(held.get() - key)
      release(spark, key, holder)
    }
  }

  /** Default heartbeat period for [[withLeaseHeartbeat]] — and with
    * [[HeartbeatGraceFactor]] the crash-recovery bound: a claim is never
    * extended more than `interval × grace` past the last beat, so a
    * crashed holder blocks rivals for ≤ 90 s, not a maintenance-sized
    * TTL. */
  val DefaultHeartbeatMillis: Long = 30L * 1000
  val HeartbeatGraceFactor: Long = 3L

  /**
   * Run `body` under the maintenance lease WITH A RENEWAL HEARTBEAT —
   * for corpus-proportional maintenance (cross-index merge, compaction,
   * retrain at the 100 TB scales the docs target) whose runtime cannot
   * be bounded by any claim TTL chosen up front (VERDICT r17 #2). Two
   * properties the fixed-TTL [[withLease]] cannot give together:
   *
   *  - **no commit-time abort from sheer runtime**: a daemon thread
   *    re-extends the claim every `intervalMillis` through the same
   *    [[Versioned.atomicOverwrite]] / conditional-put seam as the
   *    acquire, so the claim outlives the operation however long it
   *    runs — [[verifyHeld]] at the manifest commit still passes;
   *  - **prompt crash recovery**: every extension reaches only
   *    `intervalMillis × HeartbeatGraceFactor` past the beat, so a
   *    holder that dies mid-job (with its heartbeat) leaves a claim
   *    that expires within the grace window — a rival acquires in
   *    ≤ 90 s by default instead of stalling a full maintenance TTL.
   *
   * A failed renewal — the object no longer names us, i.e. a rival
   * legitimately acquired after a stall longer than the grace window —
   * stops the heartbeat and records the loss; the operation then
   * aborts loudly at its commit-time [[verifyHeld]] (or earlier, at the
   * next explicit [[renew]]) rather than double-committing. Nested
   * scopes on an already-held root run under the outer claim unchanged
   * (heartbeat included if the outer scope started one).
   */
  def withLeaseHeartbeat[T](spark: SparkSession, root: String,
      intervalMillis: Long = DefaultHeartbeatMillis)(body: => T): T = {
    val key = new Path(root).toString
    if (held.get().contains(key)) return body
    require(intervalMillis > 0, s"heartbeat interval $intervalMillis <= 0")
    val holder =
      s"$jvmId-t${Thread.currentThread().getId}-" +
        java.util.UUID.randomUUID().toString.take(8)
    val grace = intervalMillis * HeartbeatGraceFactor
    val claim = acquire(spark, key, holder, grace)
    held.set(held.get() + (key -> claim))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      try {
        while (!stop.get()) {
          Thread.sleep(intervalMillis)
          if (!stop.get()) {
            // extend IN the heartbeat thread via acquire's same-holder
            // renewal (check → CAS/atomic write → read-back): an
            // expired claim STILL NAMING US re-extends (no rival took
            // it — same recovery acquire gives any same-holder retry),
            // a rival's live claim raises LeaseHeldException and stops
            // the beat. The body thread's `held` entry keeps the
            // ORIGINAL expiry — verifyHeld compares holder + the
            // on-disk liveness, so extensions are visible to it with
            // no thread-local plumbing.
            try acquire(spark, key, holder, grace)
            catch {
              case _: LeaseHeldException =>
                stop.set(true) // lost — let verifyHeld abort the commit
              case scala.util.control.NonFatal(_) =>
                // transient IO on a renewal must NOT kill the beat (the
                // claim would silently expire within the grace window
                // and a long compaction abort at commit with no rival)
                // — retry on the next tick; only a genuine loss
                // (LeaseHeldException above) stops the heartbeat
                ()
            }
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$holder")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      stop.set(true)
      beat.interrupt()
      // join BEFORE release: the beat may be past its stop check and
      // inside acquire() — letting it land a fresh grace-window claim
      // AFTER the release would spuriously block the next writer.
      // Interruption-safe and BOUNDED (review r19): an interrupt of
      // THIS thread must not skip the release (the claim would leak
      // until grace expiry), and a beat stuck in non-interruptible IO
      // must not block the commit path forever — after the bound we
      // release anyway (worst case = the pre-fix race, time-boxed).
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var selfInterrupted = false
      while (beat.isAlive && System.nanoTime() < deadline) {
        try beat.join(100L)
        catch { case _: InterruptedException => selfInterrupted = true }
      }
      if (selfInterrupted) Thread.currentThread().interrupt()
      held.set(held.get() - key)
      release(spark, key, holder)
    }
  }
}
