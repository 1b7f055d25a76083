package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Guard for the deliberate all-pairs exact baselines (dd05, ann01).
  *
  * Both exist to give the bucketed scale paths (dd06, ann02–ann05) a
  * hash-exact correctness anchor at test scale; their plans are O(n²) in the
  * vector count by construction and must never run against a production-size
  * table. Nothing used to stop a caller from trying — now the builders count
  * the input and refuse above a configurable ceiling, pointing at the
  * bucketed twin to use instead.
  *
  * The ceiling lives in a Spark conf (not a hardcode) so tests can lower it
  * to prove the guard fires, and an operator who genuinely wants a one-off
  * exact pass on a bigger slice can raise it explicitly — an audited
  * decision rather than a silent quadratic run.
  */
object ExactBaseline {
  val ConfKey = "spark.graft.exactBaseline.maxRows"
  val DefaultMaxRows = 10000L

  /** Throws IllegalArgumentException when n exceeds the configured ceiling. */
  def guard(spark: SparkSession, n: Long, op: String, alternative: String): Unit = {
    val max = spark.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxRows)
    require(
      n <= max,
      s"$op is the unbucketed EXACT baseline (all-pairs / full-scan candidates) " +
        s"and refuses n=$n input rows > $ConfKey=$max. At scale use $alternative — " +
        s"the bucketed path whose work tracks bucket occupancy, not the full " +
        s"candidate cross product. Raise the conf only for a deliberate one-off " +
        s"exact pass.")
  }
}
