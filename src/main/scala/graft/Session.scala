package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard local-mode settings.
  *
  * The reference engine manages a SQLite connection + pandas memory budget
  * (reference: pandasql/core.py:1679-1697, memory_utils.py); on Spark the
  * session IS the engine handle — AQE, shuffle partitioning and spill are
  * delegated to Spark. Shuffle partitions default to the core count (not
  * 200) because local mode has exactly one executor; on a real cluster this
  * is overridden by AQE coalescing (`spark.sql.adaptive.enabled=true`).
  */
object Session {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
