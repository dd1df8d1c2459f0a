package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import graft.operators.Similarity
import graft.sources.Catalog

/** Deployment-FOLLOW serving — the streaming twin of the deployment
  * pointer itself, completing the twin matrix (every STORE already has
  * one; the pointer that binds them did not): a long-lived serving
  * process answers request micro-batches against the stack's committed
  * deployment, re-resolving the pin set ONCE per micro-batch. That
  * boundary is the whole contract:
  *
  *   - WITHIN a batch, every member read of every store resolves
  *     through the one pin set read at batch start
  *     ([[graft.operators.Similarity.threeStageServeBatchDeployed]]
  *     threads it as explicit versions), so a maintenance flip landing
  *     mid-batch can never tear the stack — the streaming analog of
  *     x194's skew_free window;
  *   - ACROSS batches the serve FOLLOWS the deployment: batch N answers
  *     entirely pre-flip pins, batch N+1 entirely post-flip, with no
  *     restart and no coordination beyond the committed pointer.
  *
  * At 100 TB this is the steady-state posture of a serving tier: the
  * deployment read is a handful of rows per micro-batch, maintenance
  * (takedown / rollback / reindex) publishes through one atomic pointer
  * flip, and every serving process picks it up at its own next batch
  * boundary.
  *
  * The answer sink is an APPEND log tagged with (`batch_id`,
  * `dep_version`): serving emits answers, it does not mutate stores, so
  * the store twins' manifest-ledger exactly-once does not apply — a
  * crash-replayed request batch re-serves and re-appends (standard
  * foreachBatch at-least-once), and it re-resolves the THEN-current
  * pins: the follow contract is per-execution. Consumers needing
  * exactly-once dedupe on (batch_id, qid, rank).
  */
object ServeStream {

  /** Request-batch schema: one row per query — `qid` doubles as the
    * `vec_id` resolving the query's embedding in the vectors table,
    * `terms` are its lexical side.
    */
  val requestSchema: StructType = StructType(Seq(
    StructField("qid", LongType),
    StructField("terms", ArrayType(StringType))))

  /** Serve ONE request batch at the deployment's CURRENT pin set — the
    * per-batch core [[deploymentFollowServe]] runs, factored out so the
    * declared batch query (x197) and the stream execute the SAME path.
    * Resolves [[graft.sources.Catalog.latestDeploymentVersion]] once —
    * the only mutable read — and serves the whole batch through it;
    * every output row carries `dep_version` so an answer log proves
    * which deployment answered it (and a torn batch would be visible as
    * two versions under one batch id — StreamingSpec pins that it
    * never happens).
    *
    * The term lists are collected driver-side: a request batch is a
    * micro-batch of QUERIES (a bounded handful), not data — the same
    * driver-sized shape the batched serve plans its per-query stages
    * from.
    */
  def serveBatchFollowing(spark: SparkSession, requests: DataFrame,
      depRoot: String, depName: String,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, k: Int, fuseK: Int = 30, poolK: Int = 50,
      rrfK: Int = 60, rerank: Int = 150, nProbe: Int = 6): DataFrame = {
    val depV = Catalog.latestDeploymentVersion(spark, depRoot, depName)
      .getOrElse(sys.error(s"serveBatchFollowing: no committed " +
        s"deployment '$depName' under $depRoot"))
    val queryTerms = requests.select(col("qid"), col("terms")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList.toSeq)
      .toSeq.sortBy(_._1)
    require(queryTerms.map(_._1).distinct.size == queryTerms.size,
      "serveBatchFollowing: duplicate qids in the request batch")
    val qv = vecs.join(requests.select(col("qid").as("vec_id")),
      Seq("vec_id"), "left_semi")
    Similarity.threeStageServeBatchDeployed(spark, depRoot, depName,
      textRoot, textName, annRoot, annName, vecs, queryTerms, qv, k,
      fuseK, poolK, rrfK, rerank, nProbe,
      deploymentVersion = Some(depV))
      .withColumn("dep_version", lit(depV))
  }

  /** Start the deployment-follow serving stream: parquet request files
    * from `srcDir` ([[requestSchema]]), one file per micro-batch,
    * answers appended to `outDir` tagged (`batch_id`, `dep_version`).
    */
  def deploymentFollowServe(spark: SparkSession, srcDir: String,
      outDir: String, depRoot: String, depName: String,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, k: Int, fuseK: Int = 30, poolK: Int = 50,
      rrfK: Int = 60, rerank: Int = 150, nProbe: Int = 6,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(requestSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          serveBatchFollowing(s, batch.toDF(), depRoot, depName,
            textRoot, textName, annRoot, annName, vecs, k, fuseK, poolK,
            rrfK, rerank, nProbe)
            .withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(outDir)
          ()
        }
      }
      .outputMode("update")
      .start()
  }
}
