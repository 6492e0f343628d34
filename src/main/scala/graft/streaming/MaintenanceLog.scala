package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Append-only machine-readable trail of maintenance decisions — one
  * JSON line per [[MaintenancePolicy.maintainTable]] window, written
  * to `__maintenance_log` in the table dir the window maintained
  * (underscore-prefixed: Spark's lister never surfaces it as data).
  *
  * The derived plan (floor, fanout, extend-vs-build, rebucket
  * recommendation) is otherwise computed, applied, and DISCARDED, with
  * only stderr lines recording it — diagnosing "why did window 26 cost
  * 40 s" then requires re-deriving the policy by hand from on-disk
  * state that has since changed. The log pins, per window: the
  * [[MaintenancePolicy.TableStats]] observed, the
  * [[MaintenancePolicy.TablePlan]] chosen, which screen op actually
  * ran, wall seconds, and the holder that ran it.
  *
  * Write protocol: read-modify-write of the whole file via temp +
  * rename, the same family as every other registry marker — there is
  * no atomic append on object stores, and the single-maintenance-
  * writer contract (the [[MaintenanceLease]] every inner op holds)
  * already serializes windows, so whole-file replace is race-free in
  * any correctly-operated deployment and merely last-writer-wins in a
  * misoperated one (the log is diagnostic, never load-bearing).
  */
object MaintenanceLog {

  private val LogName = "__maintenance_log"

  private def logPath(dir: String) = new Path(dir, LogName)

  /** Append one line (no trailing newline needed) to `dir`'s log.
    * Best-effort by design: a failed log write must never fail the
    * maintenance window that succeeded — the error is logged loudly
    * and swallowed.
    */
  def append(fs: FileSystem, dir: String, line: String): Unit =
    try {
      val p = logPath(dir)
      val prior =
        if (fs.exists(p)) {
          val in = fs.open(p)
          try new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        } else ""
      val tmp = new Path(dir, s".$LogName.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write((prior + line.stripSuffix("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      fs.delete(p, false)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        Console.err.println(
          s"[graft] maintenance-log rename lost a race at $dir; " +
            "window entry dropped (diagnostic only)")
      }
    } catch {
      case e: Exception =>
        Console.err.println(s"[graft] maintenance-log append failed at " +
          s"$dir: ${e.getMessage} (diagnostic only; window unaffected)")
    }

  /** All logged window lines, oldest first; empty when no log exists. */
  def read(fs: FileSystem, dir: String): Seq[String] = {
    val p = logPath(dir)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      txt.linesIterator.filter(_.nonEmpty).toSeq
    }
  }
}
