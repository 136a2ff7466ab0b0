package graft.conv

import java.util.concurrent.atomic.AtomicReference

import graft.proto._
import graft.{Protarrow, SparkSpec}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability contract for the catalyst-native collect path:
  * [[Protarrow.dataFrameToMessages]] drives `executedPlan.executeCollect()`
  * directly (skipping Dataset.withAction), so it must register its own
  * NAMED SQL execution — otherwise the decode is invisible to
  * QueryExecutionListeners and the Spark UI. An unnamed
  * `withNewExecutionId` is not enough: ExecutionListenerBus drops
  * execution-end events whose `executionName` is empty, which is exactly
  * the regression this spec pins.
  */
class ListenerSpec extends SparkSpec {

  private val reg = Schemas.registry
  private val md = Schemas.msg("ExampleMessage")

  test("dataFrameToMessages fires QueryExecutionListener.onSuccess") {
    val seen = new AtomicReference[Seq[String]](Vector.empty)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        seen.updateAndGet(_ :+ funcName)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val f = md.byName("double_value")
      val msgs = Seq(1.0, 2.5).map(v => DynamicMessage(md, Map(f.number -> v)))
      val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
      assert(Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg) === msgs)
      GraftBridge.awaitListenerBus(spark)
      assert(seen.get().contains("dataFrameToMessages"),
        s"listener saw ${seen.get()} but not the named decode execution")
    } finally spark.listenerManager.unregister(listener)
  }
}
