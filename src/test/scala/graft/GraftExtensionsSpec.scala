package graft

import org.apache.spark.sql.SparkSession

/** The library packaging contract: a user-built session with
  * `spark.sql.extensions=graft.GraftExtensions` gets every graft native
  * function in plain SQL, no register() call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("a session built with the extension resolves graft functions from SQL") {
    val shared = spark // forces shared-session init so the context exists
    // Snapshot a REAL injected name's resolution state on the shared
    // session before injection, so the isolation assertion below compares
    // against it (a never-registered name would pass vacuously).
    val vecDot = org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")
    val sharedHadVecDot = shared.sessionState.functionRegistry
      .lookupFunctionBuilder(vecDot).isDefined
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `.withExtensions` is the same injection path `spark.sql.extensions`
    // takes at context build; the config-string form is a *static* conf,
    // so inside this suite's pre-existing context it would be ignored.
    val ext =
      try SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(shared)
        SparkSession.setActiveSession(shared)
      }
    assert(ext ne shared) // a genuinely new session over the same context

    val dot = ext.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)

    val bigrams = ext.sql("SELECT bigrams(array('a', 'b', 'c')) AS b")
      .collect()(0).getSeq[String](0)
    assert(bigrams == Seq("a b", "b c"))

    val inter = ext.sql(
      "SELECT arr_inter(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
      .collect()(0).getLong(0)
    assert(inter == 2L)

    // The shared session is untouched by the injection (extension scope
    // is per-session): vec_dot resolves there exactly iff it did before
    // the extension session was built.
    assert(shared.sessionState.functionRegistry
      .lookupFunctionBuilder(vecDot).isDefined == sharedHadVecDot,
      "building an extension session must not mutate the shared registry")
  }
}
