package graft

import org.scalatest.funsuite.AnyFunSuite

/** Units for the bench's self-regime machinery (round 11). The
  * end-to-end behavior (re-exec under bare java / spark-submit, the
  * jvm artifact object, the recursion guard) is exercised manually per
  * docs/TODO_r11.md §3; these pin the pure logic so a refactor can't
  * silently invert a sentinel or mis-parse the heap target.
  */
class BenchRegimeSpec extends AnyFunSuite {

  test("gcDelta keeps the -1 unavailability sentinel coherent") {
    // r10 ADVICE: one failed endpoint must yield -1, never a raw
    // difference that reads as a plausible (even negative) gc figure
    assert(Bench.gcDelta(-1.0, 5.0) == -1.0)
    assert(Bench.gcDelta(5.0, -1.0) == -1.0)
    assert(Bench.gcDelta(-1.0, -1.0) == -1.0)
    assert(Bench.gcDelta(2.0, 5.5) == 3.5)
    assert(Bench.gcDelta(0.0, 0.0) == 0.0)
  }

  test("targetHeapBytes parses SPARK_DRIVER_MEM (or the 8g default)") {
    val expected = sys.env.get("SPARK_DRIVER_MEM") match {
      case None => 8L << 30
      case Some(s) =>
        val t = s.trim.toLowerCase
        val mult = t.last match {
          case 'k' => 1L << 10; case 'm' => 1L << 20
          case 'g' => 1L << 30; case 't' => 1L << 40; case _ => 1L
        }
        (if (t.last.isDigit) t else t.dropRight(1)).toLong * mult
    }
    assert(Bench.targetHeapBytes == expected)
    assert(Bench.targetHeapBytes > 0L)
  }

  test("this forked test JVM passes the bench's own regime detector") {
    // JvmRegimeSpec asserts the build.sbt flags and the beans; this
    // closes the loop through the EXACT predicate Bench.main gates
    // re-exec on — if the detector and the flags ever drift apart,
    // the graded run would re-exec even on a correctly-flagged launch
    val (parallel, presized, sized) = Bench.regime()
    assert(parallel, "detector says ParallelGC beans did not win")
    assert(presized, "detector says heap is not pre-sized")
    assert(sized, "detector says heap is under the SPARK_DRIVER_MEM target")
  }

  test("childClasspath carries Bench's own code source and no empties") {
    val sep = java.io.File.pathSeparator
    val parts = Bench.childClasspath.split(sep).toSeq
    assert(parts.nonEmpty && parts.forall(_.nonEmpty))
    assert(parts.distinct == parts, "duplicate classpath entries")
    val selfDir = java.nio.file.Paths.get(
      Bench.getClass.getProtectionDomain.getCodeSource.getLocation.toURI).toString
    assert(parts.contains(selfDir),
      s"child classpath misses the classes dir that loaded Bench ($selfDir)")
  }
}
