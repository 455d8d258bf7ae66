package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for users: a SparkSession pre-configured the way
  * the engine expects (UTC, ns-timestamp tolerance, graft SQL functions
  * registered), in one call:
  *
  * {{{
  * val spark = GraftSession.builder().master("local[32]").build()
  * val topk  = ps.PsQueries.queries.find(_.id == "mf_topk").get
  *               .fn(spark, "/data/sf0.1")
  * val (p, q, loss) = ps.MfTrainer.train(spark, myRatings)
  * }}}
  *
  * On a cluster, drop the master call and submit normally; every
  * operator scales through partitioning, not through session config.
  */
object GraftSession {

  final class Builder private[GraftSession] () {
    private var masterOpt: Option[String] = None
    private var appName: String = "graft"
    private var shufflePartitions: Option[Int] = None

    def master(m: String): Builder = { masterOpt = Some(m); this }
    def name(n: String): Builder = { appName = n; this }
    def shuffle(p: Int): Builder = { shufflePartitions = Some(p); this }

    def build(): SparkSession = {
      var b = SparkSession.builder().appName(appName)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        // full extension set (SQL functions + optimizer fusion rules)
        // for sessions the builder actually constructs; registerOn
        // below covers the pre-existing-session path for functions
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      masterOpt.foreach(m => b = b.master(m))
      // default: one shuffle partition per core locally; on a cluster
      // leave it to AQE coalescing unless pinned explicitly
      shufflePartitions.foreach(p =>
        b = b.config("spark.sql.shuffle.partitions", p))
      val spark = b.getOrCreate()
      functions.GraftExtensions.registerOn(spark)
      spark
    }
  }

  def builder(): Builder = new Builder()
}
