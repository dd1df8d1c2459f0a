package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Results are fully materialized through a noop sink — `count()` would let
  * Catalyst prune every projected column and time only the scan/agg skeleton.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/IO paths so query timings measure the queries,
    // not first-query session startup — one cheap query per table family
    // (lineitem scan/agg, documents tokenizer chain, embeddings arrays)
    Seq("q1_agg", "x4_text_tokens", "x43_embed_quantize").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=q1_agg,x2_dedup_minhash runs a subset (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // -1.0 marks a failed query — a swallowed exception must not masquerade
    // as a fast timing in the bench JSON
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val sec =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // operators that persist intermediates (LSH candidates, CC frontiers)
      // must not leak cached blocks into later queries' memory budget —
      // every query starts cache-cold
      spark.catalog.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
