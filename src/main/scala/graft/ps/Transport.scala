package graft.ps

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable model-state transport — SURVEY §2.A `ps_transport`
  * (upstream `ps/.../client/{receiver,sender}/`,
  * `server/{receiver,sender}/`: the reference makes the worker↔server
  * message channel a user-replaceable interface, with an in-dataflow
  * loop implementation and an external Kafka-backed one).
  *
  * Spark restatement, per the survey row's own mapping: WITHIN a job,
  * Spark's shuffle IS the transport (every pull/push qid's keyed join
  * or aggregation — nothing to replace, and replacing it would fight
  * the engine). What remains transport-shaped is model state crossing
  * a JOB or RESTART boundary — the reference's external-channel case —
  * and there the medium is a durable sharded sink/source pair. This
  * trait is that interface; [[ParquetShardTransport]] is the
  * no-extra-infrastructure implementation (a Kafka implementation
  * would be `writeStream`/`readStream` against the same two methods —
  * environment-gated here: no Kafka jars in /opt/spark/jars,
  * re-checked every round).
  *
  * Contract: `send` persists a message relation laid out by its
  * `shard` column (the reference's hand-rolled `Partitioner` becomes
  * the storage layout, so a receiving server task reads only its own
  * shard's directory); `receive` re-exposes the relation with shard
  * pruning available to the reader (partition-pruned scans — the
  * survey's "range-partitioned server" read path). Exact integer
  * payloads survive the round trip bit-for-bit, which is what lets the
  * ps_transport qid hash-verify a full push → fold → answer cycle
  * through two durable hops.
  */
trait ModelTransport {
  /** Persist `messages` (must carry an integer `shard` column) to the
    * durable channel at `dest`, sharded for server-side locality. */
  def send(messages: DataFrame, dest: String): Unit

  /** Re-expose the channel at `dest` as a relation; `shard` comes back
    * as a partition column, so per-shard readers prune to their own
    * directory. */
  def receive(spark: SparkSession, dest: String): DataFrame
}

/** Parquet-backed transport: one directory per shard
  * (`dest/shard=N/`), overwrite-per-round — the bulk-synchronous
  * checkpoint discipline (each superstep's messages replace the
  * previous round's; restart re-reads the last complete round). */
object ParquetShardTransport extends ModelTransport {
  override def send(messages: DataFrame, dest: String): Unit =
    messages.write.mode("overwrite").partitionBy("shard").parquet(dest)

  override def receive(spark: SparkSession, dest: String): DataFrame =
    spark.read.parquet(dest)
}
