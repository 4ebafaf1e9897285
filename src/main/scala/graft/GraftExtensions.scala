package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extensions entry point: registers the function-parity layer
 * into every session at creation time. Deployment:
 *
 * {{{
 *   spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * This is the idiomatic cluster-wide equivalent of the reference's
 * executor-side function registries
 * (reference: ballista/executor/src/executor.rs:60-75) — any session of
 * the cluster resolves `date_bin`, `approx_distinct`, `regexp_match`,
 * etc. without touching [[GraftSession]]. The one UDAF
 * (`approx_percentile_cont_with_weight`) needs a live session to bind
 * its encoders, so it stays in
 * [[graft.functions.GraftFunctions.registerAll]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.injectables.foreach(ext.injectFunction)
}
