package graft

/** Build-attribution log for family-shared memoized relations (the
  * round-8 answer to "attribute the dedup-family bench delta before
  * optimizing it"): every memo MISS — and, for the relations that
  * eagerly materialize, the build wall time — is appended to
  * `target/memo_log.txt` and mirrored to stderr. Reading the log next
  * to the bench's per-query map shows exactly which qid paid each
  * family build (the first family member in sorted bench order) and
  * how much of its headline number was shared-ETL vs per-query work.
  * Never on stdout: the bench's stdout is a driver-parsed contract.
  */
object BuildLog {
  private val path = java.nio.file.Paths.get("target/memo_log.txt")
  // first write of each JVM truncates, so the file always describes
  // exactly ONE run — successive bench/verify runs would otherwise
  // interleave and a reader could attribute a previous run's build
  // cost to the current per-query map
  private var truncated = false
  def log(msg: String): Unit = synchronized {
    val line = f"[graft t=${System.currentTimeMillis()}%d] $msg"
    System.err.println(line)
    try {
      java.nio.file.Files.createDirectories(path.getParent)
      val opts =
        if (truncated) Seq(java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        else Seq(java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      java.nio.file.Files.write(path, (line + "\n").getBytes("UTF-8"), opts: _*)
      truncated = true
    } catch { case _: Throwable => () }
  }
}
