package graft.functions

import org.apache.spark.sql.functions._
import graft.proto._
import graft.conv.GraftConfig
import graft.{Protarrow, SparkSpec}

class FunctionsSpec extends SparkSpec {

  test("MinHashAgg matches the expression-pipeline signatures") {
    import spark.implicits._
    val ex = graft.operators.Dedup.shingles(spark, sfDir)
      .select(col("doc_id"), explode(col("s")).as("sh"))
      .withColumn("h", expr(graft.operators.H.s("sh")))
    // expression path (as in d28)
    val exprSig = graft.operators.Dedup.shingles(spark, sfDir)
      .withColumn("th", expr(s"transform(s, x -> ${graft.operators.H.s("x")})"))
      .selectExpr("doc_id",
        "transform(sequence(0, 11), k -> array_min(transform(th, " +
          "h -> ((2*k + 1) * h + (k*k + 1)) % 2147483647))) as sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // aggregator path (untyped udaf registration)
    val aggSig = ex.groupBy("doc_id").agg(MinHashAgg.udafOf(12)(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(aggSig.keySet === exprSig.keySet)
    aggSig.foreach { case (id, sig) => assert(sig === exprSig(id), s"doc $id") }
  }

  test("writeProtoJsonl ↔ readProtoJsonl round trip") {
    val reg = Schemas.registry
    val md = Schemas.msg("ExampleMessage")
    val src = graft.operators.Fixtures.materialize("ExampleMessage")
    val df = Protarrow.readProtoJsonl(spark, src, md, GraftConfig(), reg)
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/out"
    Protarrow.writeProtoJsonl(df, md, out, GraftConfig(), reg)
    val back = Protarrow.readProtoJsonl(spark, out, md, GraftConfig(), reg)
    assert(back.count() === df.count())
    val a = Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
    val b = Protarrow.dataFrameToMessages(back, md, GraftConfig(), reg)
    assert(a.toSet === b.toSet) // file order may differ across partitions
  }
}
