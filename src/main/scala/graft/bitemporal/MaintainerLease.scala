package graft.bitemporal

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

/** Crash-recoverable single-maintainer lease over a table's storage
  * root — the ENFORCED form of the contract the engine's maintenance
  * paths assume (one process runs compact/vacuum/refresh per table; the
  * r8 snapshot guard in [[TxLog.readAll]] detects a violated
  * assumption, this prevents the violation).
  *
  * Mechanics: one `_maintainer_lease` file per storage root. The claim
  * is `Files.createFile` — O_EXCL-atomic on every real filesystem, so
  * exactly one process wins an empty slot. The file carries
  * `holder\nexpiresAtMillis\nop`; a crashed maintainer's lease simply
  * expires (TTL, default 60 s, `-Dgraft.maintainer.leaseTtlMs`), after
  * which any maintainer deletes it and re-claims through the same
  * atomic create — the delete is safe because an EXPIRED holder, alive
  * or not, has lost the lease by definition. A torn file (crash between
  * create and write) counts as expired once its mtime is TTL old.
  *
  * Reentrancy: the holder id is per-JVM, and nested acquisitions on one
  * root (vacuum → compact, refresh → table ops) are depth-counted
  * in-process, so a single maintainer never contends with itself —
  * single-process behavior is unchanged except for the lease file's
  * existence during maintenance. Multi-root operations (join-matview
  * refresh spans fact + dim) acquire in sorted-path order, which makes
  * deadlock impossible.
  *
  * Long maintenance: while the OUTERMOST [[withLease]] holds a root, a
  * daemon heartbeat renews the expiry every TTL/3, so a single op may
  * run arbitrarily longer than the TTL — the TTL bounds crash
  * DETECTION latency, not op length. A renewal re-checks the holder
  * before writing (it never resurrects a lease a successor claimed),
  * and the one residual — the heartbeat thread itself stalled past the
  * TTL, e.g. a long GC pause — degrades to the r8 snapshot guard's
  * refold-or-loud-error, never to silent corruption.
  */
object MaintainerLease {

  /** This JVM's holder identity (pid@host + a per-JVM token). */
  val holderId: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    s"$rt:${java.util.UUID.randomUUID().toString.take(8)}"
  }

  def ttlMs: Long =
    sys.props.get("graft.maintainer.leaseTtlMs").map(s =>
      try s.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft.maintainer.leaseTtlMs must be millis, got '$s'")
      }).getOrElse(60000L)

  final case class LeaseState(holder: String, expiresAt: Long, op: String)

  private def leaseFile(root: Path): Path = root.resolve("_maintainer_lease")

  /** Parse the lease at `root`; None = none/torn-and-young (a torn file
    * younger than TTL might be a mid-write claim — treated as HELD by
    * an unknown maintainer via the Some(holder="?") return). */
  def read(root: Path): Option[LeaseState] = {
    val f = leaseFile(root)
    if (!Files.exists(f)) return None
    val lines =
      try new String(Files.readAllBytes(f), UTF_8).split("\n", -1)
      catch { case _: java.io.IOException => Array.empty[String] }
    if (lines.length >= 2 && lines(1).forall(_.isDigit) && lines(1).nonEmpty)
      Some(LeaseState(lines(0), lines(1).toLong,
        if (lines.length >= 3) lines(2) else ""))
    else { // torn: expiry = mtime + ttl
      val mtime =
        try Files.getLastModifiedTime(f).toMillis
        catch { case _: java.io.IOException => return None } // vanished
      Some(LeaseState("?", mtime + ttlMs, "?"))
    }
  }

  // Per-root in-process lock: ONE JVM is one maintainer only if its own
  // threads serialize too (the SQL front doors run REFRESH on
  // concurrent handler threads — without this, two threads would both
  // see the file held "by us" and run the same delta twice). Reentrant
  // so vacuum → compact nests; blocking so concurrent same-JVM
  // maintenance queues instead of erroring.
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[
      Path, java.util.concurrent.locks.ReentrantLock]
  private def lockFor(root: Path) =
    locks.computeIfAbsent(root,
      _ => new java.util.concurrent.locks.ReentrantLock)

  private def content(op: String): Array[Byte] =
    s"$holderId\n${System.currentTimeMillis() + ttlMs}\n$op".getBytes(UTF_8)

  private def writeContent(f: Path, op: String): Unit =
    Files.write(f, content(op),
      StandardOpenOption.WRITE, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)

  /** Re-write a HELD lease's content atomically (temp + same-dir
    * rename): a concurrent read() in another process never observes a
    * torn/empty file on a heartbeat or nested refresh — an in-place
    * TRUNCATE+WRITE left a recurring every-TTL/3 window where a reader
    * saw holder "?" for one TTL. POSIX rename has no O_EXCL analogue
    * (it would CREATE a vanished target), so the no-CREATE property the
    * heartbeat needs is preserved by an existence re-check immediately
    * before the move; the residual check→move microsecond race is the
    * already-documented stalled-writer case the snapshot guard
    * backstops — strictly narrower than the whole-write window it
    * replaces. */
  private def renewContent(root: Path, op: String): Unit = {
    val f = leaseFile(root)
    val tmp = f.resolveSibling(
      s"_maintainer_lease.new.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content(op))
    try {
      if (!Files.exists(f)) { Files.deleteIfExists(tmp): Unit; return }
      Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    } catch {
      case _: java.io.IOException => Files.deleteIfExists(tmp): Unit
    }
  }

  /** Atomically retire a stale lease file: MOVE it to a unique
    * tombstone (rename of one source succeeds for exactly one racer —
    * unlike delete-then-create, a slow racer can never delete the
    * WINNER'S fresh lease), then delete the tombstone. True iff we won
    * the retirement. */
  private def retireStale(f: Path): Boolean =
    try {
      val tomb = f.resolveSibling(
        s"_maintainer_lease.stale.${java.util.UUID.randomUUID().toString.take(8)}")
      Files.move(f, tomb)
      Files.deleteIfExists(tomb)
      true
    } catch { case _: java.io.IOException => false }

  // ---- heartbeat -----------------------------------------------------
  // One daemon renews every held root's expiry at TTL/3 (the r11
  // documented weak: an op outliving the TTL lost the lease
  // mid-flight). The renewal runs OFF the owner's thread — the owner
  // holds the in-process lock for the whole op, so the beat must not
  // take it — and re-checks the on-disk holder first: a successor who
  // claimed through a genuinely lapsed lease is never clobbered. The
  // beat-vs-release race (a beat reads our live file just as release
  // deletes it, then re-creates it) leaves at worst an orphaned lease
  // that the next acquirer retires after one TTL — visible, bounded,
  // and only reachable if a beat interleaves the final microseconds of
  // release.
  private lazy val heartbeatExec =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat")
        t.setDaemon(true); t
      })
  private val heartbeats =
    new java.util.concurrent.ConcurrentHashMap[
      Path, java.util.concurrent.ScheduledFuture[_]]

  private def renew(root: Path, op: String): Unit =
    try {
      if (heartbeats.containsKey(root) &&
          read(root).exists(_.holder == holderId))
        // REPLACE without CREATE (renewContent's existence re-check): a
        // beat that interleaves the final microseconds of release must
        // skip on the vanished file, never re-create an orphaned lease.
        // The remaining residual — this thread stalls past the TTL
        // between the read above and the move while a successor claims
        // — is the already-documented stalled-heartbeat case (snapshot
        // guard backstops it).
        renewContent(root, op)
    } catch { case _: Exception => } // skipped beat; the next one retries

  private def startHeartbeat(root: Path, op: String): Unit = {
    val period = math.max(ttlMs / 3, 25L)
    heartbeats.put(root, heartbeatExec.scheduleWithFixedDelay(
      () => renew(root, op), period, period,
      java.util.concurrent.TimeUnit.MILLISECONDS)): Unit
  }

  private def stopHeartbeat(root: Path): Unit =
    Option(heartbeats.remove(root)).foreach(_.cancel(true))

  private def acquire(root: Path, op: String): Unit = {
    val f = leaseFile(root)
    Files.createDirectories(root)
    // crash cleanup: a kill between a renewal/retire/release temp's
    // write and its rename orphans a `_maintainer_lease.<kind>.<uuid>`
    // file that nothing else manages — sweep them once they are a TTL
    // old (a LIVE racer's temp is always younger than that)
    try {
      val cutoff = System.currentTimeMillis() - ttlMs
      val listing = Files.list(root)
      try listing.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("_maintainer_lease.") &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: java.io.IOException => false }))
          Files.deleteIfExists(p): Unit
      } finally listing.close()
    } catch { case _: java.io.IOException => }
    var attempts = 0
    while (true) {
      attempts += 1
      try {
        Files.createFile(f) // O_EXCL — the atomic claim
        writeContent(f, op)
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          read(root) match {
            case None => // vanished between create-fail and read — retry
            case Some(st) if st.holder == holderId =>
              // our own live file (an earlier run of this JVM crashed
              // between ops, or TTL survived a restart) — refresh
              writeContent(f, op)
              return
            case Some(st) if st.expiresAt < System.currentTimeMillis() =>
              // stale: retire by atomic rename, then re-claim through
              // createFile; losing either race just means another
              // maintainer claimed — loop and contend with THEIR lease
              retireStale(f): Unit
            case Some(st) =>
              throw new IllegalStateException(
                s"maintenance lease on $root held by ${st.holder} " +
                  s"(op ${st.op}, expires in " +
                  s"${st.expiresAt - System.currentTimeMillis()} ms); " +
                  "two maintainers per table are not supported — wait for " +
                  "expiry or stop the other maintainer")
          }
          if (attempts > 50)
            throw new IllegalStateException(
              s"could not acquire maintenance lease on $root after " +
                s"$attempts attempts")
      }
    }
  }

  private def release(root: Path): Unit = {
    val f = leaseFile(root)
    // Delete only OUR lease — and READ BEFORE RENAMING: moving first
    // would take a successor's LIVE lease off the slot for the whole
    // check-and-restore window, during which a third maintainer's
    // createFile wins an empty slot and the restore silently fails —
    // two live maintainers. Reading first means a lease that is
    // already someone else's is never touched at all; the residual
    // read→move race (our TTL lapses and a successor claims between
    // the two calls) is re-checked after the move and restored, and a
    // FAILED restore is logged loudly rather than swallowed so the
    // dual-maintainer window is visible, never silent.
    try {
      val lines =
        try new String(Files.readAllBytes(f), UTF_8).split("\n", -1)
        catch { case _: java.io.IOException => return } // already gone
      if (!lines.headOption.contains(holderId)) return // successor's — leave it
      val tomb = f.resolveSibling(
        s"_maintainer_lease.rel.${java.util.UUID.randomUUID().toString.take(8)}")
      Files.move(f, tomb)
      val moved = new String(Files.readAllBytes(tomb), UTF_8).split("\n", -1)
      if (moved.headOption.contains(holderId)) Files.deleteIfExists(tomb): Unit
      else
        try { Files.move(tomb, f): Unit }
        catch { case e: java.io.IOException =>
          System.err.println(
            s"[graft] WARNING: lease release on $root displaced a successor's " +
              s"live lease (holder ${moved.headOption.getOrElse("?")}) and could " +
              s"not restore it (${e.getClass.getSimpleName}: ${e.getMessage}); " +
              "two maintainers may be active until the next expiry check")
        }
    } catch { case _: java.io.IOException => } // already gone — fine
  }

  /** Run `f` holding the maintenance lease on every root (sorted order;
    * re-entrant per root within this JVM — nested entry refreshes the
    * expiry so a long vacuum's inner phases keep the TTL alive; same-JVM
    * concurrent maintainers BLOCK on the in-process lock rather than
    * racing the file). */
  def withLease[A](roots: Seq[Path], op: String)(f: => A): A = {
    val sorted = roots.map(_.toAbsolutePath.normalize()).distinct.sorted
    val entered = scala.collection.mutable.Buffer
      .empty[(Path, java.util.concurrent.locks.ReentrantLock)]
    val acquired = scala.collection.mutable.Set.empty[Path]
    try {
      sorted.foreach { r =>
        val l = lockFor(r)
        l.lock()
        entered += ((r, l))
        if (l.getHoldCount == 1) {
          acquire(r, op); acquired += r
          startHeartbeat(r, op)
        }
        else renewContent(r, op) // nested: refresh expiry (atomic replace)
      }
      f
    } finally {
      // stop the heartbeat and release files for roots whose outermost
      // hold ends here, then unlock in reverse order
      entered.reverseIterator.foreach { case (r, l) =>
        if (l.getHoldCount == 1 && acquired.contains(r)) {
          stopHeartbeat(r)
          release(r)
        }
        l.unlock()
      }
    }
  }

  def withLease[A](root: Path, op: String)(f: => A): A =
    withLease(Seq(root), op)(f)
}
