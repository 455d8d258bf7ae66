package graft.ml

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib capability bridges (SURVEY §7.3 step 8): the batch-native
  * equivalents of the reference's three algorithm families, wired to the
  * same fixture tables with fixed seeds.
  *
  *  - online matrix factorization  → `ml.recommendation.ALS`
  *    (`PSOnlineMatrixFactorization` [K-high] trains the same latent
  *    factor model; ALS is the bulk-synchronous batch estimator),
  *  - passive-aggressive binary    → `ml.classification.LinearSVC`
  *    (both optimize a hinge-loss linear separator),
  *  - minhash similarity sketches  → `ml.feature.MinHashLSH`
  *    (`approxSimilarityJoin` is the scale path for dedup_near).
  *
  * These are deliberately NOT in `SparkEntry.queries`: MLlib training
  * emits solver-dependent floats that no cross-engine oracle can check.
  * The ScalaTest suite asserts capability-level invariants (RMSE/accuracy
  * thresholds, LSH recall of planted near-dup pairs) with fixed seeds.
  */
object MlBridges {

  /** ALS on the (user=o_custkey, item=l_partkey, rating=l_quantity)
    * matrix — the MF capability bridge. */
  def alsModel(spark: SparkSession, dir: String): DataFrame = {
    val ratings = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"),
        col("l_quantity").cast("float").as("rating"))
    val als = new ALS()
      .setMaxIter(5).setRank(8).setRegParam(0.1).setSeed(42L)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setColdStartStrategy("drop")
    val model = als.fit(ratings)
    model.transform(ratings)
      .select(col("user"), col("item"), col("rating"), col("prediction"))
  }

  /** LinearSVC over the embeddings (binarized label) — the PA bridge. */
  def svcAccuracy(spark: SparkSession, dir: String): Double = {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val data = graft.sources.Tables.embeddings(spark, dir)
      .select(when(col("label") >= 5, 1.0).otherwise(0.0).as("label"),
        toVec(col("embedding")).as("features"))
    val svc = new LinearSVC().setMaxIter(20).setRegParam(0.01)
    val model = svc.fit(data)
    val scored = model.transform(data)
    scored.filter(col("label") === col("prediction")).count().toDouble /
      scored.count().toDouble
  }

  /** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
    * quantizer (fixed seed) assigns every vector to a centroid cell;
    * each query probes its `nprobe` nearest cells (the standard IVF
    * recall knob: nprobe=1 → only the query's own cell, nprobe=nCells →
    * exact). Probe assignment ranks the tiny broadcast centroid table
    * by squared L2 distance (only the `|c|² − 2 q·c` terms — `|q|²` is
    * constant per query). At 100 TB the corpus partitions BY CELL, so a
    * query touches nprobe partition groups instead of the whole corpus —
    * the complementary design to the sign-bit LSH qid (`sim_ann_lsh`).
    * Returns per-query top-k probed neighbors by exact cosine.
    */
  def ivfTopK(spark: SparkSession, dir: String, nCells: Int = 8, k: Int = 5,
      nprobe: Int = 1): DataFrame =
    ivfCandidates(spark, dir, nCells, nprobe)
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)

  /** IVF candidate generation: one KMeans fit, every (query, candidate)
    * pair inside the query's `nprobeMax` nearest cells, tagged with `pr`
    * — the probe rank of the CANDIDATE's cell in the query's cell order
    * (1 = the query's own/nearest cell). Filtering `pr <= np` for any
    * `np <= nprobeMax` yields exactly the nprobe=np candidate set, so one
    * plan (one KMeans fit, one join) serves a whole nprobe sweep.
    * `qidBound` restricts the query side BEFORE the probe window (only
    * vec_id < bound become queries); the corpus side always stays full.
    * `cos` is the exact cosine rounded to 6 — identical expression shape
    * to the brute-force baseline so the nprobe=nCells candidate top-k is
    * bitwise equal to exhaustive search.
    */
  def ivfCandidates(spark: SparkSession, dir: String, nCells: Int = 8,
      nprobeMax: Int = 1, qidBound: Option[Int] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    // persist: KMeans makes one pass per iteration, and without this each
    // pass re-reads the parquet and re-runs the UDF vectorization; the
    // cache also feeds the two cells subtrees (query + corpus side) of
    // the candidate join below. Released by the harness's family-
    // boundary clearCache.
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toVec(col("embedding")).as("features"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .persist()
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(10).fit(base)
    val cells = model.transform(base)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
      .withColumn("n", graft.functions.VectorExprs.l2(col("v")))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "cvec")
      .withColumn("cc", graft.functions.VectorExprs.dot(col("cvec"), col("cvec")))
    val qside = qidBound.fold(cells)(b => cells.filter(col("vec_id") < b))
    val probes = qside
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n").as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", col("cc") -
        lit(2.0) * graft.functions.VectorExprs.dot(col("qv"), col("cvec")))
      .withColumn("pr", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2"), col("cell"))))
      .filter(col("pr") <= nprobeMax)
      .select(col("qid"), col("qv"), col("qn"), col("cell"), col("pr"))
    probes.join(cells.as("c"),
        probes("cell") === col("c.cell") && probes("qid") =!= col("c.vec_id"))
      .select(col("qid"), col("pr"), col("c.vec_id").as("cid"),
        round(graft.functions.VectorExprs.dot(col("qv"), col("c.v")) /
          (col("qn") * col("c.n")), 6).as("cos"))
  }

  /** FAMILY-SHARED full IVF candidate relation: [[ivfCandidates]] at
    * nprobeMax = nCells — every (query, candidate≠query) pair tagged
    * with its probe rank `pr` and exact rounded cosine. One KMeans fit
    * + one candidate join serves BOTH ANN qids: sim_ann_ivf filters
    * pr ≤ 3 for its answer and ranks the unfiltered relation for its
    * exact brute-force twin (at nprobe = nCells the candidate set IS
    * the exhaustive scored set, identical expression shape), and
    * sim_ann_ivf_sweep filters pr ≤ nprobe per sweep point. Memoized
    * per (application, dir, nCells, qidBound) with the live-storage
    * contract of the other family memos; persisted SER (build-once,
    * read-per-qid). */
  private val ivfMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Option[Int]), DataFrame]
  def ivfCandidatesShared(spark: SparkSession, dir: String, nCells: Int,
      qidBound: Option[Int]): DataFrame = {
    val key = (spark.sparkContext.applicationId, dir, nCells, qidBound)
    ivfMemo.get(key)
      .filter(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      .getOrElse {
        val full = ivfCandidates(spark, dir, nCells, nCells, qidBound)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        ivfMemo.put(key, full)
        full
      }
  }

  /** MinHashLSH approximate-similarity join over token sets — the
    * near-dup scale path. Returns candidate pairs at Jaccard ≥ minJ
    * (LSH distance = 1 − Jaccard estimate). */
  def lshNearDups(spark: SparkSession, dir: String, minJ: Double): DataFrame = {
    import org.apache.spark.ml.feature.CountVectorizer
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("features").setBinary(true)
      .setVocabSize(1 << 16)
    val vecs = cv.fit(toks).transform(toks)
    val mh = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, 1.0 - minJ, "dist")
      .select(col("datasetA.doc_id").as("da"), col("datasetB.doc_id").as("db"),
        round(lit(1.0) - col("dist"), 4).as("est_jaccard"))
      .filter(col("da") < col("db"))
  }
}
