package graft

/** Process-scoped scratch directories. Every graft temp dir carries
  * this JVM's pid in its prefix so the bench's between-query reaper
  * (Bench.resetEngineState) can delete ONLY its own process's
  * leftovers — a concurrent graft JVM on the same box (tests, Verify,
  * a second bench) keeps its temp tables and streaming checkpoints.
  */
object TempDirs {
  /** e.g. "graft-41232-" — the reaper matches exactly this prefix. */
  val token: String = s"graft-${ProcessHandle.current().pid()}-"

  def create(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(token + tag)
}
