package graft.conv

import org.apache.spark.sql.functions._
import graft.proto._
import graft.{Protarrow, SparkSpec}

/** SURVEY.md §7.2 minimum end-to-end slice: proto-JSON rows (README.md:49-63
  * golden data) → schema derivation → DataFrame → a Catalyst query →
  * decode → structural equality with expected messages. Exercises the full
  * encode / query / decode loop on one pipeline. */
class EndToEndSpec extends SparkSpec {

  private val reg = Schemas.registry
  private val md = Schemas.msg("MyProto")

  test("MyProto jsonl → DataFrame → query → messages") {
    val jsonl = Seq(
      """{"name": "foo", "id": 1, "values": [1, 2, 4]}""",
      """{"name": "bar", "id": 2, "values": [3, 4, 5]}""",
      """{"name": "foo", "id": 3, "values": [6]}""")
    val msgs = jsonl.map(ProtoJson.parse(_, md, reg))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)

    // Catalyst query over the converted table
    val agg = df.filter(col("id") >= 1)
      .groupBy(col("name"))
      .agg(sum(size(col("values"))).cast("int").as("id"))
      .withColumn("values", expr("array()"))
      .select("name", "id", "values")
      .orderBy("name")

    // close the loop: query result back to proto messages
    val back = Protarrow.dataFrameToMessages(agg, md, GraftConfig(), reg)
    assert(back === Seq(
      DynamicMessage(md, Map(1 -> "bar", 2 -> 3)),
      DynamicMessage(md, Map(1 -> "foo", 2 -> 4))))
  }

  test("distributed encode: Dataset[DynamicMessage] → DataFrame stays on executors") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.kryo[DynamicMessage]
    val msgs = (1 to 100).map(i =>
      DynamicMessage(md, Map(1 -> s"m$i", 2 -> i, 3 -> Vector(i, i + 1))))
    val ds = spark.createDataset(msgs)
    val df = Protarrow.messagesDatasetToDataFrame(ds, md, GraftConfig(), reg)
    assert(df.agg(sum("id")).collect().head.getLong(0) === 5050L)
  }

  test("jsonl file scan is distributed and schema-directed") {
    val path = graft.operators.Fixtures.materialize("ExampleMessage")
    val df = Protarrow.readProtoJsonl(spark, path, Schemas.msg("ExampleMessage"),
      GraftConfig(), reg)
    assert(df.count() === 20)
    assert(df.schema === Protarrow.messageTypeToSchema(
      Schemas.msg("ExampleMessage"), GraftConfig(), reg))
  }
}
