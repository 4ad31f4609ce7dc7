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
  * Long maintenance: [[withLease]] refreshes the expiry when re-entered,
  * but a single op outliving the TTL can lose the lease mid-flight —
  * size the TTL to the op (the knob exists for exactly this); the
  * snapshot guard remains the backstop behind the lease, so even a
  * TTL misconfiguration degrades to refold-or-loud-error, never to
  * silent corruption.
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

  // per-root in-process re-entrancy depth (the JVM is one maintainer)
  private val depths = new java.util.concurrent.ConcurrentHashMap[Path, Integer]

  private def writeContent(f: Path, op: String): Unit =
    Files.write(f,
      s"$holderId\n${System.currentTimeMillis() + ttlMs}\n$op".getBytes(UTF_8),
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)

  private def acquire(root: Path, op: String): Unit = {
    val f = leaseFile(root)
    Files.createDirectories(root)
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
              // our own live lease (e.g. a previous run of this JVM
              // between ops) — refresh and proceed
              writeContent(f, op)
              return
            case Some(st) if st.expiresAt < System.currentTimeMillis() =>
              // stale: the holder crashed or lost its TTL — remove and
              // re-claim through the atomic create (losing the ensuing
              // race just means someone else maintains; we retry/fail
              // against THEIR live lease)
              Files.deleteIfExists(f): Unit
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
    // only delete OUR lease — an expired-then-taken-over slot belongs
    // to the new holder now
    if (read(root).exists(_.holder == holderId)) Files.deleteIfExists(f): Unit
  }

  /** Run `f` holding the maintenance lease on every root (sorted order;
    * re-entrant per root within this JVM). */
  def withLease[A](roots: Seq[Path], op: String)(f: => A): A = {
    val sorted = roots.map(_.toAbsolutePath.normalize()).distinct.sorted
    val entered = scala.collection.mutable.Buffer.empty[Path]
    try {
      sorted.foreach { r =>
        val d = depths.merge(r, 1, (a, b) => a + b)
        entered += r
        if (d == 1) acquire(r, op)
      }
      f
    } finally {
      entered.reverse.foreach { r =>
        val d = depths.merge(r, -1, (a, b) => a + b)
        if (d <= 0) {
          depths.remove(r)
          release(r)
        }
      }
    }
  }

  def withLease[A](root: Path, op: String)(f: => A): A =
    withLease(Seq(root), op)(f)
}
