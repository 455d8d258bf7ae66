package graft

/** Scratch-storage policy for every non-artifact byte the engine writes
  * (shuffle files, streaming state/checkpoints, staged stream sources,
  * snapshot materializations, managed-table warehouses).
  *
  * Guide §6: local scratch belongs on the fastest local storage the
  * host offers. The default java.io.tmpdir here sits on the host's
  * SHARED virtual disk, and r13 NodeProbe runs measured 11–14 s of
  * task-time in shuffleWriteTime for KILOBYTE-sized exchanges while
  * co-tenants hammered that disk — pure I/O wait charged to whichever
  * qid was running. A RAM-backed tmpfs removes that channel entirely;
  * on a production cluster the same decision is "put spark.local.dir
  * on the provisioned NVMe", expressed via SPARK_GRAFT_LOCAL_DIR.
  *
  * Resolution order (decided once per JVM):
  *   1. SPARK_GRAFT_LOCAL_DIR — explicit deployment choice, any path.
  *   2. /dev/shm, only when it is a writable directory with ≥ 8 GiB
  *      usable (containers often mount a 64 MB shm — that must never
  *      take the shuffle; fixture-scale scratch is MBs, rehearsal
  *      corpora ≲ 1 GiB, both far under the guard).
  *   3. None — Spark/JVM defaults stand.
  *
  * Everything written under the fast root is rebuildable scratch keyed
  * by content/existence markers, so a reboot-cleared tmpfs merely
  * causes a re-stage, exactly like a reaped /tmp.
  */
object Scratch {
  /** Fast scratch root, if this host offers one (see resolution order). */
  lazy val fastRoot: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").map(_.trim).filter(_.nonEmpty)
      .orElse {
        try {
          val shm = java.nio.file.Paths.get("/dev/shm")
          if (java.nio.file.Files.isDirectory(shm) &&
              java.nio.file.Files.isWritable(shm) &&
              java.nio.file.Files.getFileStore(shm)
                .getUsableSpace >= (8L << 30)) {
            val root = shm.resolve("graft_scratch")
            java.nio.file.Files.createDirectories(root)
            Some(root.toString)
          } else None
        } catch { case _: Throwable => None }
      }

  /** Temp root for the engine's staged/derived data: the fast root when
    * available, else the JVM default — a drop-in replacement for
    * the java.io.tmpdir system property in scratch paths. */
  lazy val tmpRoot: String =
    fastRoot.getOrElse(System.getProperty("java.io.tmpdir"))
}
