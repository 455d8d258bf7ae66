package graft

/** Per-process Spark warehouse location for the driver mains.
  *
  * The bench/verify mains used ONE shared tmpdir warehouse; two JVMs
  * running concurrently on the same host (a builder bench next to the
  * driver's, or any overlapping runs) then raced join_bucketed's
  * clear-and-recreate of the bucketed managed tables — observed as a
  * SparkException under a deliberate two-bench contention test. There
  * is no cross-JVM reuse to preserve: the in-memory catalog forgets
  * managed tables at JVM exit, so a surviving warehouse directory was
  * only ever deleted by the next run anyway. A pid-suffixed directory
  * removes the race entirely, and a shutdown hook removes the normal-
  * exit litter (a killed JVM can leak its directory — bounded by runs,
  * cleaned by tmp reaping, and never read by anyone else).
  */
object Warehouse {
  lazy val dir: String = {
    val p = java.nio.file.Paths.get(
      graft.Scratch.tmpRoot,
      "graft_warehouse_" + ProcessHandle.current().pid())
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try graft.sources.Snapshots.deleteRecursively(p)
      catch { case _: Throwable => () }))
    p.toString
  }
}
