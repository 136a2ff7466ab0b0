package graft

/** Dev aid: time individual queries warm (`runMain graft.TimeQ <sfDir> <names...>`;
  * repeat a name to see the warmed steady state the Bench min-of-3 records). */
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, args(0)).count()
      println(s"TIMEQ $n ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
