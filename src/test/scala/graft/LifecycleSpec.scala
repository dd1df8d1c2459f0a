package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embeddings, RelOps}
import graft.sources.Catalog

class LifecycleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("withMaterialized: inputs unpersisted, result persisted and correct") {
    val in = (1 to 100).toDF("v")
    val out = Lifecycle.withMaterialized(in) {
      in.agg(sum(col("v")).as("s")).crossJoin(in.agg(count(lit(1)).as("n")))
    }
    assert(in.storageLevel == StorageLevel.NONE,
      "input must be unpersisted after the call")
    assert(out.storageLevel != StorageLevel.NONE,
      "result must come back persisted (caller owns the one unpersist)")
    val row = out.collect().head
    assert(row.getLong(0) == 5050L && row.getLong(1) == 100L)
    out.unpersist()
  }

  test("withMaterialized: multiple inputs all released") {
    val a = (1 to 10).toDF("v")
    val b = (1 to 5).toDF("w")
    val out = Lifecycle.withMaterialized(a, b)(a.crossJoin(b))
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    assert(out.count() == 50)
    out.unpersist()
  }

  test("withMaterialized: a caller-persisted input is not stolen") {
    val in = (1 to 20).toDF("v").persist()
    in.count()
    val out = Lifecycle.withMaterialized(in)(in.agg(sum(col("v")).as("s")))
    assert(in.storageLevel != StorageLevel.NONE,
      "an input the CALLER persisted must stay persisted")
    assert(out.collect().head.getLong(0) == 210L)
    in.unpersist(); out.unpersist()
  }

  test("library ANN ops leave only their result frame cached") {
    spark.catalog.clearCache()
    val e = Catalog.table(spark, SparkTestSession.sfDir, "embeddings")
    val q = e.where(col("vec_id") < 4)
    val books = Embeddings.pqTrain(
      RelOps.hashSample(e, "vec_id", 0.5), m = 8, k = 16, iters = 2)
    val ann = Embeddings.filteredIvfPqKnn(e, col("label") < 5, q, books,
      k = 3, rerank = 10, nCentroids = 8, nProbe = 4)
    // the PQ-decoded index intermediate must NOT outlive the call: the one
    // cached frame in the session is the returned result
    assert(ann.storageLevel != StorageLevel.NONE)
    val cached = spark.sparkContext.getPersistentRDDs
    assert(cached.size == 1,
      s"expected exactly the result frame cached, found ${cached.size} RDDs")
    assert(ann.count() > 0)
    spark.catalog.clearCache()
  }
}
