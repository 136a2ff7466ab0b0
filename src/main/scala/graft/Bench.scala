package graft

import org.apache.spark.sql.SparkSession
import graft.proto._
import graft.conv.GraftConfig

/** Per-round benchmark main (driver contract): times every registered
  * query at SPARK_GRAFT_SF_DIR plus the reference's encode/decode harness
  * shape — random ExampleMessage batches at 10/100/1k/10k rows
  * (benchmarks/test_benchmark.py:8-21) — and prints ONE JSON line.
  *
  * Failures are NOT swallowed: a query that throws is reported in the
  * "errors" object (and its time is the time-to-failure), so a broken
  * query can never masquerade as a ~0 s speedup.
  */
object Bench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Random ExampleMessage generator with the reference harness's shape
    * (tests/random_generator.py:58-128): every field of the ~190-field
    * message considered, random presence for presence fields, repeated/map
    * sizes 0..10, full numeric ranges (uint64 as 2^64 bit patterns) —
    * so encode/decode numbers exercise every codec, not a 7-field subset.
    * Deterministic via the seeded java.util.Random. */
  private final class MsgGen(seed: Long) {
    import PType._
    private val rnd = new java.util.Random(seed)
    private val reg = Schemas.registry
    private val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"
    private def randString(): String = {
      val n = rnd.nextInt(11)
      val sb = new StringBuilder(n)
      var i = 0
      while (i < n) { sb.append(alphabet.charAt(rnd.nextInt(64))); i += 1 }
      sb.toString
    }
    private def randBytes(): Bytes = {
      val b = new Array[Byte](rnd.nextInt(11)); rnd.nextBytes(b); Bytes.owned(b)
    }
    private def randRange(lo: Long, hi: Long): Long =
      Math.floorMod(rnd.nextLong(), hi - lo + 1) + lo

    def scalar(t: PType): Any = t match {
      case PDouble => rnd.nextDouble() * 2 - 1
      case PFloat => rnd.nextFloat() * 2 - 1
      case PInt32 | PSInt32 | PSFixed32 => rnd.nextInt()
      case PInt64 | PSInt64 | PSFixed64 => rnd.nextLong()
      case PUInt32 | PFixed32 => rnd.nextInt().toLong & 0xFFFFFFFFL
      case PUInt64 | PFixed64 => rnd.nextLong() // full 2^64 bit patterns
      case PBool => rnd.nextBoolean()
      case PString => randString()
      case PBytes => randBytes()
      case PEnum(name) =>
        val vs = reg.enum(name).values; vs(rnd.nextInt(vs.size))._2
      case PMessage(WellKnown.TimestampName) =>
        DynamicMessage(WellKnown.timestamp, Map(
          1 -> randRange(-62135596800L, 253402300799L), // proto range 0001..9999
          2 -> rnd.nextInt(1000000000)))
      case PMessage(WellKnown.DurationName) =>
        DynamicMessage(WellKnown.duration, Map(
          1 -> randRange(-9223372036L, 9223372035L),
          2 -> rnd.nextInt(1000000000)))
      case PMessage(WellKnown.DateName) =>
        DynamicMessage(WellKnown.date, Map(
          1 -> (1 + rnd.nextInt(9999)), 2 -> (1 + rnd.nextInt(12)),
          3 -> (1 + rnd.nextInt(28))))
      case PMessage(WellKnown.TimeOfDayName) =>
        DynamicMessage(WellKnown.timeOfDay, Map(
          1 -> rnd.nextInt(24), 2 -> rnd.nextInt(60), 3 -> rnd.nextInt(60),
          4 -> rnd.nextInt(1000000000)))
      case PMessage(WellKnown.EmptyName) => DynamicMessage.empty(WellKnown.empty)
      case PMessage(name) if WellKnown.isWrapper(name) =>
        DynamicMessage(reg.message(name), Map(1 -> scalar(WellKnown.wrapperNames(name))))
      case PMessage(name) => message(reg.message(name))
    }

    def message(md: PMessageDesc): DynamicMessage = {
      val vals = md.fields.flatMap { f =>
        if (f.isMap) {
          val n = rnd.nextInt(11)
          Some(f.number -> (0 until n).map(_ => scalar(f.mapKey) -> scalar(f.mapValue)).toMap)
        } else if (f.repeated) {
          Some(f.number -> Vector.fill(rnd.nextInt(11))(scalar(f.typ)))
        } else if (f.hasPresence) {
          // random presence (tests/random_generator.py:123-128)
          if (rnd.nextBoolean()) Some(f.number -> scalar(f.typ)) else None
        } else Some(f.number -> scalar(f.typ))
      }.toMap
      DynamicMessage(md, vals)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // collect_list/typed-aggregator queries build high-cardinality groups
      // (e.g. the 1M+ posting lists of d27/d28); the default 128-group
      // fallback would force them all to sort-based aggregation
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warm-up: JVM/codegen/parquet-reader initialization otherwise
    // lands entirely on the alphabetically-first query (~4 s) and distorts
    // its number; no query data is cached here
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // optional args = query-name prefixes to run (iteration aid); no args
    // runs everything including the encode/decode points
    val only = args.toSet
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.startsWith)

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // min-of-3 per query: this machine shows ~3x run-to-run variance
    // (BASELINE.md), so a single cold call makes round-over-round deltas
    // unreadable. The cache manager is cleared before EVERY iteration —
    // queries cache intermediates, and cached plans canonicalize equal
    // across invocations, so without the clear iterations 2-3 would time
    // cache reads, not the query. OS page cache staying warm across
    // iterations is the intended steady state.
    def minTimed(f: => Unit): Double = (1 to 3).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      time(f)
    }.min
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).foreach { case (name, fn) =>
      results(name) = minTimed {
        try { fn(spark, sfDir).count(); () }
        catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
        }
      }
      // a failed query's "time" is its time-to-failure — meaningless, and
      // summing it into the total would let a fast crash read as a speedup;
      // the failure is reported in `errors` only
      if (errors.contains(name)) results.remove(name)
    }

    // encode/decode throughput at the reference's batch sizes, with the
    // reference's full ExampleMessage shape. Reported as min of 3 warm
    // iterations — pytest-benchmark (the reference harness) also reports
    // warm steady-state over many rounds, and a single cold call here is
    // dominated by JIT, not by the codec. Failures are captured into
    // `errors` exactly like query failures — a codec regression must
    // never abort main before the JSON line prints. Selection is
    // per-point (same prefix semantics as the query loop), so
    // `Bench pa_decode_10000` runs that point alone.
    def minOf3(f: => Unit): Double = (1 to 3).map(_ => time(f)).min
    def timed(key: String)(f: => Unit): Unit = {
      results(key) = minOf3 {
        try f
        catch { case e: Throwable =>
          errors(key) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
        }
      }
      if (errors.contains(key)) results.remove(key) // same rule as queries
    }
    val md = Schemas.msg("ExampleMessage")
    val reg = Schemas.registry
    val gen = new MsgGen(42L)
    for (n <- Seq(10, 100, 1000, 10000)) {
      val (encKey, decKey) = (s"pa_encode_$n", s"pa_decode_$n")
      // messages are generated for every n regardless of selection so the
      // seeded RNG stream (and thus each point's data) is identical
      // whatever subset runs
      val msgs = Vector.fill(n)(gen.message(md))
      if (selected(encKey)) timed(encKey) {
        Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg).count(); ()
      }
      val distKey = s"pa_decode_dist_$n"
      if (selected(decKey) || selected(distKey)) {
        // materialized once outside the timer: the decode points measure
        // the decode only, as in prior rounds
        val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
          .cache()
        try {
          df.count()
          // driver-collect API floor (table_to_messages contract) ...
          if (selected(decKey))
            timed(decKey) { Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg); () }
          // ... vs the distributed twin at the largest batch: decode stays
          // on executors (toProtoBinary), only wire-bytes counts return —
          // the measured counterpart of the "driver-collect floor" claim.
          // The driver-built batch is ONE partition (LocalRelation); spread
          // it outside the timer so the point measures the distributed
          // decode, not an accidental single-task layout
          if (n == 10000 && selected(distKey)) {
            val dfd = df.repartition(cpus.toInt).cache()
            dfd.count()
            try timed(distKey) { Protarrow.toProtoBinary(dfd, md, GraftConfig(), reg).count(); () }
            finally { dfd.unpersist(); () }
          }
        } catch { case e: Throwable =>
          errors(decKey) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
        } finally { df.unpersist(); () }
      }
    }

    val qs = results.map { case (k, v) => JsonOut.str(k) + ":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => JsonOut.str(k) + ":" + JsonOut.str(v) }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
