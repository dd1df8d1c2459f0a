package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Embeddings, RelOps, Similarity}
import graft.sources.Catalog

/** Throwaway dev probe: x87 recall grid over (trainIters, nProbe, rerank)
  * to locate where recall is lost — cell miss (nProbe), shortlist miss
  * (rerank), or quantizer placement (trainIters). Not a driver contract.
  */
object GridProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("grid-probe")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
      val pred = col("label") < 5
      val books = Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 3)
      val brute = Similarity.bruteForceKnn(e.where(pred), q, k = 5).persist()
      val b = brute.count()
      for ((ti, np, rr, sp) <- Seq((4, 6, 50, 2), (4, 6, 150, 1), (4, 6, 150, 2), (4, 6, 150, 3), (0, 6, 150, 2))) {
        val ann = Embeddings.filteredIvfPqKnn(e, pred, q, books, k = 5,
          rerank = rr, nCentroids = 16, nProbe = np, trainIters = ti, spill = sp)
        val hits = ann.select(col("qid"), col("nid"))
          .join(brute.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
          .count()
        println(s"[grid] $sf ti=$ti np=$np rr=$rr sp=$sp recall = $hits/$b = ${hits.toDouble / b}")
        ann.unpersist()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
