package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point: injects every engine-native
  * expression ([[graft.expr.GraftFunctions.descriptions]]) into the
  * session's function registry at session-build time, so a SQL-first
  * user reaches the engine's signature operators with configuration
  * alone:
  *
  * {{{
  *   spark-sql --conf spark.sql.extensions=graft.GraftExtensions
  *   > SELECT simhash64(split(text, ' +')), uuid5('<ns-hex>', id) FROM docs;
  * }}}
  *
  * Unlike `GraftFunctions.register` (temp functions on one session
  * state), injected functions are part of the session blueprint:
  * `newSession()` children and every session built from the same
  * builder inherit them — the deployment-grade path for clusters where
  * the session is constructed by a platform, not user code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.expr.GraftFunctions.descriptions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder))
    }
}
