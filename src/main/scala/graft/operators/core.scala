package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType, TimestampType}

/** One engine query: the Spark implementation plus (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Column names and row order must match between `fn` and `oracle` — the
  * driver sorts columns by name and hashes values.
  *
  * ORACLE TYPING RULE: the driver's hash is raw-byte strict, so column
  * DTYPES must match too, not just values. DuckDB silently promotes
  * `SUM(BIGINT)` to HUGEINT, and any expression built on it — in
  * particular the `SUM(...) * 1000000 // n` ppm idiom — reaches pandas
  * as float64 while Spark emits int64: rows/values green, hash RED (the
  * round-6 q83/t34/t35/t38/t42/x110 incident). Therefore ALWAYS wrap
  * SUM-derived integer columns, and every integer-division result, in
  * `CAST(... AS BIGINT)` in the oracle SQL; literal selects too
  * (`CAST(1 AS BIGINT)`), since bare int literals are int32.
  * `tools/check.py` now fails on float-vs-int dtype mismatches, so a
  * violation is caught at sf0.01 before the driver sees it.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Per-round lineage truncation for the iterative operators (HashMin /
  * star-contraction components, PageRank sweeps, BPE training, the
  * foreachBatch accumulators). Default: eager `localCheckpoint` — zero
  * external storage, but the blocks live on executors, so an executor
  * loss mid-loop kills the job. On a real cluster set
  * `spark.graft.reliableCheckpoint=true` (plus
  * `sparkContext.setCheckpointDir` to durable storage) and every round
  * writes a reliable `checkpoint()` instead — the executor-loss-tolerant
  * variant BASELINE.md names; rounds survive lost executors at the cost
  * of one distributed write per round. One knob, read per call, so a
  * session can flip it without rebuilding frames (CheckpointModeSpec
  * runs d34 both ways). */
object Ckpt {
  val Key = "spark.graft.reliableCheckpoint"
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(Key, "false").toBoolean) df.checkpoint(true)
    else df.localCheckpoint(true)
  /** Postfix form for loop bodies: `frame.ckptRound` (import Ckpt.Rounds). */
  implicit class Rounds(private val df: DataFrame) extends AnyVal {
    def ckptRound: DataFrame = Ckpt(df)
  }
}

/** Cleanup registry for PER-APPLICATION temp layouts (paths carrying the
  * applicationId — x116/x117 exports, the s47 IVF index, pa65's field-id
  * parquet). No later run can ever reuse an app-keyed path, so they are
  * deleted on JVM exit instead of accumulating under java.io.tmpdir one
  * directory per run. The sourceKey-only layouts (partitioned/range/
  * z-order scan sources, d37's corpus) are deliberate content-addressed
  * cross-run caches and are NOT registered. */
object TmpLayouts {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => delete(new java.io.File(p)))
    }, "graft-tmp-layouts-cleanup"))
    true
  }
  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(); ()
  }
  /** Register `path` for deletion at JVM exit; returns it unchanged. */
  def register(path: String): String = {
    hookInstalled; registered.add(path); path
  }
}

object T {
  /** Read one driver-generated table. Filters/projections on the result are
    * pushed into the parquet scan by Catalyst (verify via PushedFilters in
    * `.explain`).
    *
    * CONTRACT: `events.ts` always surfaces as LongType epoch-nanos,
    * WHATEVER the physical parquet encoding is. The engine's event-time
    * operators (sessionization, as-of, range join, resample) all do integer
    * nano arithmetic on it, and the DuckDB oracles read the same column via
    * `epoch_ns(ts)`. The testdata generator has shipped the column as
    * TIMESTAMP(NANOS) in some rounds and `timestamp[us]` in others, so the
    * loader normalizes BY SCHEMA instead of assuming a layout:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it by default; `nanosAsLong`
    *    surfaces it as epoch-nano LongType directly (lossless — Spark's
    *    TimestampType is µs, so a typed read would truncate anyway).
    *  - timestamp[us] (tz-naive → TIMESTAMP_NTZ, or UTC-adjusted →
    *    TIMESTAMP): projected to `unix_micros(ts) * 1000`. For the naive
    *    case the session zone is pinned UTC first, so NTZ→LTZ is
    *    naive-as-UTC — the same reading DuckDB's `epoch_ns` gives the
    *    oracle. Every engine entry point (Bench/Verify/SkewBench/specs)
    *    already pins UTC; the set here makes the loader self-sufficient.
    *  - integral (e.g. engine-written copies of events): passed through.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case Some(TimestampNTZType) =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp_ltz)) * 1000L"))
      case _ => df
    }
  }

}

/** Driver-safe rendering of array columns. The driver's checker hashes
  * cell values with pandas and cannot sort/hash array cells (it crashes on
  * numpy.ndarray), so every driver-facing output surfaces arrays as a
  * comma-joined string — the identical rendering on both engines. Raw-array
  * variants stay available to the ScalaTest specs.
  */
object Csv {
  /** Spark dialect: array column (any element type) → "a,b,c". */
  def spark(c: String): String =
    s"array_join(transform($c, x -> cast(x as string)), ',')"
  /** DuckDB dialect of the same rendering. */
  def duck(c: String): String = s"array_to_string($c, ',')"
}

/** Numeric conventions shared by every query and its oracle.
  *
  * Money columns in the testdata are doubles. Summing doubles is
  * order-dependent, and Spark's and DuckDB's aggregation orders differ — so
  * any double-sum would be a flaky hash. Both sides therefore cast to
  * DECIMAL(12,4) first (exact, order-independent sums; 12+4 digits covers
  * every money column at any SF we run) and cast the final aggregate back to
  * double. Products stay within DECIMAL(38,12) so both engines keep them
  * exact.
  *
  * TRAP (found at sf0.1): DuckDB's `CAST(decimal AS DOUBLE)` is not
  * correctly rounded (int128 × 10^-scale in binary) and can land one ulp
  * off Spark's correctly-rounded BigDecimal.doubleValue once the decimal
  * exceeds ~15 significant digits. Where an oracle hits that regime
  * (q01's product sums), route the oracle's cast through VARCHAR —
  * `CAST(CAST(x AS VARCHAR) AS DOUBLE)` is strtod, correctly rounded,
  * bit-equal to the Spark side.
  */
object Num {
  val Dec = DecimalType(12, 4)
  def dec(c: Column): Column = c.cast(Dec)
  /** Exact order-independent sum, surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** Exact mean: decimal sum cast to double, divided by count. */
  def dmean(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
