package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins q89's native `session_window()` against the lag gap-and-island
  * formulation: the built-in merges an event landing EXACTLY one gap
  * after its predecessor (new session only at diff > gap — the same
  * rule as q52), pinned here both against the real events table and on
  * a synthetic exact-gap pair. */
class SessionWindowSpec extends SparkSpec {

  test("q89 session_window == lag formulation under the > gap rule") {
    val got = Events.q89SessionWindow.fn(spark, sfDir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
    val want = T(spark, sfDir, "events")
      .selectExpr("user_id", "ts div 1000 as tsu")
      .withColumn("prev", lag(col("tsu"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min(col("tsu")).as("sess_start"),
        (max(col("tsu")) + lit(1800000000L)).as("sess_end"),
        count(lit(1)).as("n_events"))
      .drop("sess")
    assert(got.count() === want.count())
    assert(got.join(want,
      Seq("user_id", "sess_start", "sess_end", "n_events")).count() === want.count(),
      "every session must agree on (start, end, count)")
  }

  test("exact-gap boundary: t=gap merges, t=gap+1 splits") {
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    def sessionsOf(ts: Seq[Long]): Long = ts.map((1L, _))
      .toDF("user_id", "tsu")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("tsm"))
      .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
      .agg(count(lit(1)).as("n")).count()
    assert(sessionsOf(Seq(0L, gapUs)) === 1L,
      "an event exactly one gap after its predecessor MERGES (diff > gap rule)")
    assert(sessionsOf(Seq(0L, gapUs + 1L)) === 2L,
      "one microsecond past the gap must open a new session")
  }
}
