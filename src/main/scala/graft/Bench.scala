package graft

import org.apache.spark.sql.SparkSession
import graft.proto._
import graft.conv.GraftConfig

/** Per-round benchmark main (driver contract): times every registered
  * query at SPARK_GRAFT_SF_DIR plus the reference's encode/decode harness
  * shape — random ExampleMessage batches at 10/100/1k/10k rows
  * (benchmarks/test_benchmark.py:8-21) — and prints ONE JSON line. */
object Bench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time {
        try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      }
    }

    // encode/decode throughput at the reference's batch sizes
    val md = Schemas.msg("ExampleMessage")
    val reg = Schemas.registry
    val gen = new java.util.Random(42)
    def randMsg(): DynamicMessage = {
      // compact deterministic message: a few scalars + a repeated field
      DynamicMessage(md, Map(
        1 -> gen.nextDouble(), 3 -> gen.nextInt(), 4 -> gen.nextLong(),
        13 -> gen.nextBoolean(), 14 -> gen.nextLong().toString,
        33 -> Vector.fill(10)(gen.nextInt()),
        123 -> Map(gen.nextInt().toString -> gen.nextInt())))
    }
    for (n <- Seq(10, 100, 1000, 10000)) {
      val msgs = Vector.fill(n)(randMsg())
      results(s"pa_encode_$n") = time {
        Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg).count(); ()
      }
      val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
        .cache()
      df.count()
      results(s"pa_decode_$n") = time {
        Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg); ()
      }
      df.unpersist()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
