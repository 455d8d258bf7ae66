package graft

import org.apache.spark.sql.functions._

/** ps_transport / [[graft.ps.ParquetShardTransport]]: the pluggable
  * durable model-state channel (SURVEY §2.A's last row, closed r10).
  * The qid's DuckDB oracle proves the cycle is semantically invisible;
  * these tests pin the TRANSPORT-side properties the oracle cannot
  * see — exact round-trip fidelity, the sharded on-disk layout (the
  * reference's Partitioner as storage), and partition pruning on the
  * receive side.
  */
class TransportSpec extends SparkSpec {

  private def tmpDest(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_transport_spec_$tag")
      .resolve("chan").toString

  test("round trip preserves an integer message relation exactly") {
    val dest = tmpDest("rt")
    val msgs = spark.range(1000).selectExpr(
      "id AS item", "id * 37 - 500 AS delta_cents",
      "cast(pmod(id, 8) as int) AS shard")
    graft.ps.ParquetShardTransport.send(msgs, dest)
    val back = graft.ps.ParquetShardTransport.receive(spark, dest)
      .selectExpr("item", "delta_cents", "cast(shard as int) AS shard")
    assert(back.count() === 1000)
    assert(back.exceptAll(msgs).isEmpty && msgs.exceptAll(back).isEmpty)
  }

  test("send lays messages out one directory per shard") {
    val dest = tmpDest("layout")
    graft.ps.ParquetShardTransport.send(
      spark.range(64).selectExpr("id AS item", "id AS delta_cents",
        "cast(pmod(id, 4) as int) AS shard"), dest)
    val shardDirs = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))
  }

  test("receive prunes to a single shard's directory") {
    val dest = tmpDest("prune")
    graft.ps.ParquetShardTransport.send(
      spark.range(64).selectExpr("id AS item", "id AS delta_cents",
        "cast(pmod(id, 4) as int) AS shard"), dest)
    val one = graft.ps.ParquetShardTransport.receive(spark, dest)
      .filter(col("shard") === 2)
    // the partition filter must prune the scan to shard=2's files, not
    // read all four directories and filter rows
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      var n = 0L
      df.queryExecution.executedPlan.collectLeaves().foreach {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          n += f.selectedPartitions.totalNumberOfFiles
        case _ => ()
      }
      n
    }
    val scanned = filesScanned(one)
    val allFiles = filesScanned(
      graft.ps.ParquetShardTransport.receive(spark, dest))
    assert(scanned > 0 && scanned < allFiles,
      s"pruned scan reads $scanned of $allFiles files — pruning not effective")
    assert(one.count() === 16)
  }

  test("ps_transport qid: answers carry the client shard of their user") {
    val out = Registry.byId("ps_transport").fn(spark, sfDir)
    val rows = out.count()
    assert(rows > 100, s"suspiciously few transport answers: $rows")
    assert(out.filter(col("cshard") =!= pmod(col("user"), lit(8))).isEmpty,
      "cshard must equal user % 8 after the round trip")
  }
}
