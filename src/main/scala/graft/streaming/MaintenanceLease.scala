package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process single-maintenance-writer lease — the staged-manifest
  * family's answer to the hole the JVM-local
  * [[BucketedRegistry.requireNoActiveStream]] cannot see: a maintenance
  * driver in ANOTHER process running `rebucket`/`compact`/screen
  * maintenance concurrently with this one. Without it the collision
  * failure mode is a refused rename or silently lost work deep inside a
  * swap; with it the second writer fails FAST and LOUDLY at acquire
  * time, naming the holder.
  *
  * Protocol (same crash-safety family as the compact/rebucket
  * manifests):
  *   - `acquire`: if a live lease exists for another holder → throw; an
  *     EXPIRED lease is taken over (loud log — the previous holder
  *     crashed mid-maintenance; its manifest roll-forward makes that
  *     safe); otherwise write `holder` + `expires` to a temp file and
  *     RENAME it to `__maintenance_lease` — rename-onto-existing
  *     returns false on a race, so exactly one contender wins and the
  *     loser throws.
  *   - `validate`: re-read before every irreversible swap (manifest
  *     rename, screen delta/dir swap) — a holder that lost its lease to
  *     a stale-takeover must abort rather than swap over the new
  *     holder's work.
  *   - `release`: delete iff still self-held (owned). A crash without
  *     release leaves a lease that expires after `ttlMs` — bounded
  *     unavailability of the maintenance path, never of the stream
  *     (appends/probes don't take the lease; stream-vs-maintenance
  *     stays on the documented maintenance-window contract).
  *
  * The lease lives in the TABLE dir it guards (bands / feature / gram
  * registry dir), underscore-prefixed so Spark's file listing never
  * surfaces it as data.
  */
object MaintenanceLease {

  private val LeaseName = "__maintenance_lease"

  /** Default time-to-live. Maintenance ops on a healthy registry run
    * seconds to minutes; 30 min bounds the unavailability window after
    * a holder crash without risking takeover of a live long op (a live
    * holder re-validates before every swap, so even a wrongful
    * takeover produces a loud abort, never a silent overwrite).
    */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  /** JVM-stable holder identity: host + pid + a per-JVM nonce (two
    * JVMs on one host, or a restarted pid-reusing process, must never
    * read as the same holder).
    */
  private[streaming] lazy val holderId: String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    s"$host#${ProcessHandle.current().pid()}#${
      java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** A held lease; pass it to [[validate]] before every swap and to
    * [[release]] when the op completes.
    */
  final case class Lease(dir: String)

  private def leasePath(dir: String) = new Path(dir, LeaseName)

  private def readLease(fs: FileSystem, dir: String): Option[(String, Long)] = {
    val p = leasePath(dir)
    if (!fs.exists(p)) None
    else
      try {
        val in = fs.open(p)
        val txt =
          try new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        val kv = txt.linesIterator.map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v }.toMap
        Some((kv.getOrElse("holder", ""),
          kv.get("expires").map(_.toLong).getOrElse(0L)))
      } catch {
        // a lease mid-delete (takeover window) reads as absent; a
        // garbled one (crashed non-temp write cannot happen — temp+
        // rename — but be safe) reads as expired-at-epoch
        case _: java.io.FileNotFoundException => None
      }
  }

  /** Acquire the maintenance lease for `dir` or throw. Re-acquiring a
    * lease this JVM already holds succeeds (refreshes the expiry) —
    * same-process maintenance is serialized by the caller per the
    * single-maintenance-driver contract.
    */
  def acquire(fs: FileSystem, dir: String,
              ttlMs: Long = DefaultTtlMs): Lease = {
    if (!fs.exists(new Path(dir))) return Lease(dir) // nothing to guard
                                                     // yet (first open)
    val now = System.currentTimeMillis()
    readLease(fs, dir) match {
      case Some((holder, expires)) if holder != holderId && expires > now =>
        throw new IllegalStateException(
          s"maintenance lease at $dir is held by $holder (expires in " +
            s"${(expires - now) / 1000}s); a second maintenance writer " +
            "would corrupt in-flight swaps — wait for it to finish or " +
            "expire (single-maintenance-writer contract)")
      case Some((holder, _)) if holder != holderId =>
        Console.err.println(s"[graft] taking over EXPIRED maintenance " +
          s"lease at $dir (previous holder $holder crashed or stalled; " +
          "its staged manifests roll forward safely)")
        fs.delete(leasePath(dir), false)
      case _ => () // absent, or our own (re-acquire refreshes expiry)
    }
    val tmp = new Path(dir, s".$LeaseName.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"holder=$holderId\nexpires=${now + ttlMs}\n".getBytes("UTF-8"))
    finally out.close()
    // self-re-acquire replaces our own file (delete first); a foreign
    // file appearing in this window means we lost a race — rename
    // returns false and we throw, acquiring nothing
    fs.delete(leasePath(dir), false)
    if (!fs.rename(tmp, leasePath(dir))) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"lost the maintenance-lease race at $dir to a concurrent " +
          "writer; refusing to proceed")
    }
    Lease(dir)
  }

  /** Require the lease is still self-held — call before every
    * irreversible swap. A validate failure means another process took
    * over after our expiry: abort (the work staged so far is unreferenced
    * litter the next maintenance reaps), never swap.
    */
  def validate(fs: FileSystem, lease: Lease): Unit =
    if (fs.exists(new Path(lease.dir)))
      readLease(fs, lease.dir) match {
        case Some((holder, _)) if holder == holderId => ()
        case other => throw new IllegalStateException(
          s"maintenance lease at ${lease.dir} is no longer self-held " +
            s"(found $other): this op outlived its TTL and another " +
            "writer took over — aborting before the swap")
      }

  /** Release iff still self-held (a takeover's lease is not ours to
    * delete).
    */
  def release(fs: FileSystem, lease: Lease): Unit =
    if (fs.exists(new Path(lease.dir)) &&
        readLease(fs, lease.dir).exists(_._1 == holderId))
      fs.delete(leasePath(lease.dir), false)

  /** Bracket `op` with acquire/release; validation stays the op's job
    * (it knows where its swaps are).
    */
  def withLease[A](fs: FileSystem, dir: String)(op: Lease => A): A = {
    val lease = acquire(fs, dir)
    try op(lease) finally release(fs, lease)
  }
}
