package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named queries
  * (default: a scale-critical subset) so scan pruning (`ReadSchema`,
  * `PushedFilters`), join strategies (BroadcastHashJoin vs SortMergeJoin),
  * and codegen spans (`WholeStageCodegen`) can be eyeballed per change.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "p4_duration", "j1_broadcast_lookup", "j2_count_enrich",
        "a6_transpose", "pipeline_weblog", "x1_dedup_exact", "x2_dedup_minhash",
        "x8_knn_brute", "x10_cosine_neardup")
    val spark = Engine.session("graft-explain")
    names.foreach { n =>
      println(s"\n=== $n ===")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println(s"(unknown query: $n)")
      }
    }
    spark.stop()
  }
}
