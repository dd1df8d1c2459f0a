package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STORED IVF-PQ index: the index as tables, not a session object.
  *
  * `ivfPqKnn` rebuilds its quantizer and codes per call — right for a
  * one-shot query, wrong for a serving corpus where the expensive part
  * (training + encoding 10^9+ vectors) should run ONCE and every query
  * batch after that should be training-free. This module makes the index
  * durable in the engine's native currency, parquet tables:
  *
  *   dir/centroids.parquet — (cell int, centroid array<double>), the
  *     coarse quantizer; nCentroids rows, collected/broadcast at serve;
  *   dir/books.parquet     — (sub int, code int, centroid array<double>),
  *     the PQ codebooks relationalized; m×k rows;
  *   dir/codes.parquet     — (id, pq array<int>) PARTITIONED BY cell: the
  *     inverted lists ARE the directory layout.
  *
  * Serving reads centroids+books (bounded: nCentroids + m×k rows), plans
  * the probe cells on the driver, and scans ONLY those cell directories —
  * the `cell IN (probes)` predicate is a static partition filter, so a
  * 16-cell index probed at nProbe=6 reads 6/16 of the codes on disk
  * (PlanSpec-pinned, same mechanism as the s9 date-pruned scan). At
  * cluster scale that is the difference between touching the whole index
  * and touching the shortlist's shard. ADC scoring + exact re-rank then
  * proceed exactly as `ivfPqKnn`'s in-session path: codes decode through
  * the broadcast codebooks, the rerank fetches raw vectors by id from the
  * corpus table.
  *
  * The same stored index serves differently-filtered queries (the
  * quantizer cannot move — it's on disk), completing the steady-state ANN
  * story the way `cosineLshIndex` does for the semantic-dedup family.
  */
object AnnIndex {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Build + write the index tables. One pass over `candidates` computes
    * each vector's cell (nearest stored centroid) and PQ codes; the codes
    * land partitioned by cell so serves prune at the directory level.
    */
  def write(candidates: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], dir: String,
      nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = Similarity.sampleCentroids(candidates, nCentroids, idCol, vecCol)
    centroids.map { case (i, v) => (i, v) }.toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    books.indices.flatMap { j =>
      books(j).indices.map(c => (j, c, books(j)(c)))
    }.toDF("sub", "code", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/books.parquet")
    Embeddings.pqEncode(candidates, books, vecCol, as = "pq")
      .withColumn("cell", element_at(
        Similarity.centroidRanks(asDouble(col(vecCol)), centroids), 1))
      .select(col(idCol), col("pq"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/codes.parquet")
  }

  /** The quantizer, read back (bounded: nCentroids rows). */
  def readCentroids(spark: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy(col("cell"))
      .collect()
      .toIndexedSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

  /** The PQ codebooks, read back (bounded: m×k rows). */
  def readBooks(spark: SparkSession,
      dir: String): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rows = spark.read.parquet(s"$dir/books.parquet")
      .orderBy(col("sub"), col("code"))
      .collect()
    rows.groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    }
  }

  /** Training-free serve from a stored index: probe cells planned on the
    * driver, codes read partition-pruned, ADC shortlist, exact re-rank
    * against the corpus's raw vectors. Returns (qid, nid, sim, rank) like
    * every kNN in the family — a persisted, materialized frame; the
    * caller owns its one unpersist (see [[graft.Lifecycle]]).
    */
  def knn(spark: SparkSession, dir: String, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int = 50, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank > k, s"AnnIndex.knn: rerank=$rerank must exceed k=$k")
    val centroids = readCentroids(spark, dir)
    val books = readBooks(spark, dir)
    val probed = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(Similarity.dot(col("qvec"), col("qvec"))))
      .withColumn("cell", explode(slice(graft.functions.Staging.pin(
        Similarity.centroidRanks(col("qvec"), centroids)), 1, nProbe)))
    // the probe list is driver-planned (bounded by nCentroids): an IN on
    // the partition column makes the codes scan read ONLY those cells
    val probeCells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val decoded = spark.read.parquet(s"$dir/codes.parquet")
      .where(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .withColumn("cvec", asDouble(Embeddings.pqDecode(col("pq"), books)))
      .select(col(idCol).as("nid"), col("cell"), col("cvec"),
        sqrt(Similarity.dot(col("cvec"), col("cvec"))).as("cn"))
    val scored = decoded.join(probed, Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(Similarity.dot(col("qvec"), col("cvec"))
            / (col("cn") * col("qn"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= rerank)
      .select(col("qid"), col("nid"))
    graft.Lifecycle.withMaterialized()(
      Similarity.rerankExact(shortlist, corpus, queries, k, idCol, vecCol))
  }
}
