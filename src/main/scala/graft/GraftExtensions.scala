package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library entry point for users bringing their own session: set
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) and
  * every graft native function — `vec_dot`, `arr_inter`, `simhash64`,
  * `minhash_sig`, `bigrams`, `repetition_stats`, `term_counts`,
  * `winnow_fps`, `lsh_buckets` — is available in plain `spark.sql` from
  * session build, with no per-session `register()` call. This is the
  * Spark-idiomatic packaging of what corkscrew does at engine open
  * (pkg/query/engine.go:97-102 loads its macro set into every new DuckDB
  * connection).
  *
  * The five JSON macros stay on [[graft.functions.JsonMacros.register]]:
  * they are SQL-text `CREATE TEMPORARY FUNCTION … RETURN` definitions
  * (kept as SQL so they stay inside Catalyst exactly as the reference
  * keeps them inside DuckDB), which need a live session to parse — the
  * extension hook runs before one exists.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    functions.VecExprs.builders.foreach { case (name, builder) =>
      extensions.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
