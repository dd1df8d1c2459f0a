package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, RelOps, Similarity}
import graft.sources.Catalog

/** Throwaway dev probe: measured x87 filtered-ANN recall at each SF, to set
  * the oracle floor just under the observed margin. Not part of the driver
  * contract.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("recall-probe")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val pred = col("label") < 5
      val books = Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 3)
      val ann = Embeddings.filteredIvfPqKnn(e, pred, q, books, k = 5,
        rerank = 50, nCentroids = 16, nProbe = 6).persist()
      val brute = Similarity.bruteForceKnn(e.where(pred), q, k = 5).persist()
      val hits = ann.select(col("qid"), col("nid"))
        .join(brute.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
        .count()
      val b = brute.count()
      println(s"[probe] $sf recall = $hits/$b = ${hits.toDouble / b}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
