package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults (SURVEY §4).
  *
  * AQE stays on (skew-join splitting + partition coalescing are the runtime
  * half of the scale design); shuffle partitions track the core count
  * locally — on a real cluster this is set to 2-3× total cores instead.
  */
object GraftSession {
  def local(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
