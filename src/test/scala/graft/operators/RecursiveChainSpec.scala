package graft.operators

import graft.SparkSpec

/** Pins the three sessionization formulations against each other:
  * q92's recursive chain walk must reproduce q52's lag-window session
  * sizes and durations row-for-row (q89's session_window is pinned to
  * the lag form separately in SessionWindowSpec — together the three
  * independent algorithms agree on one contract). */
class RecursiveChainSpec extends SparkSpec {

  test("q92 recursive chains == q52 sessions (sizes and durations)") {
    val chains = Events.q92RecursiveChain.fn(spark, sfDir)
      .select("user_id", "n_events", "dur_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val sessions = Events.q52Sessionization.fn(spark, sfDir)
      .select("user_id", "n_events", "dur_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(chains.nonEmpty)
    assert(chains === sessions,
      "every (user, size, duration) multiset entry must match the lag form")
  }

  test("the recursion does exactly one row of work per event") {
    // each event belongs to exactly one chain: total chain rows == events
    val total = Events.q92RecursiveChain.fn(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(total === T(spark, sfDir, "events").count(),
      "chains must partition the event set — no double-walks, no drops")
  }
}
