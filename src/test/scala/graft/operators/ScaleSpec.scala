package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

/** Plan-level gates for the scale techniques: salted joins preserve
  * results; bucketed tables co-locate joins (no shuffle on either side);
  * broadcast joins have no shuffle at all. */
class ScaleSpec extends SparkSpec {

  test("salted join == plain join, and spreads keys over salts") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(li, o, col("l_orderkey"), col("o_orderkey"), 8)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // external tables at a temp path (warehouse dir is a static conf)
    s2.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").option("path", s"$wh/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    s2.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").option("path", s"$wh/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = s2.table("li_bucketed")
      .join(s2.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "bucketed join must not shuffle either side")
    assert(joined.count() > 0)
  }

  test("broadcast dimension join plans no shuffle for the fact side") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_suppkey")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_nationkey")
    val joined = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty)
    assert(joined.count() > 0)
  }
}
