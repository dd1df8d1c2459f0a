package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Design notes for cluster scale (the library itself is deployment-neutral;
  * these settings only apply when the engine owns session construction, e.g.
  * tests and local CLIs — on a real cluster spark-submit config wins):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and dynamic broadcast conversion are the main levers that let the same
  *     plan run at sf0.001 and at 100 TB.
  *   - UTC session timezone so timestamp arithmetic matches the DuckDB oracle
  *     and is stable across deployments.
  */
object Engine {
  def session(appName: String = "graft", master: String = s"local[${cpus}]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // tolerance, not an assertion: lets TIMESTAMP(NANOS) files arrive as
      // Long if the testdata unit flips back; inert for TIMESTAMP(MICROS).
      // Catalog.normalizeTs dispatches on the arrived type either way.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors).toString)
}
