package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 registers a [[Q]] in one of
  * the modules aggregated below; `queries` and `oracleSql` are derived from
  * the same objects so names/columns can't drift apart.
  */
object SparkEntry {

  /** Every registered query module. Name collisions fail fast — `toMap`
    * in [[queries]] would otherwise silently drop the shadowed query from
    * Bench/Verify/SkewBench and shrink the round's coverage. */
  def allQueries: Seq[Q] = {
    val qs = Relational.all ++ Relational2.all ++ TextOps.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ Events.all ++ ProtoOps.all ++
      Scale.all ++ Json.all ++ AsOf.all ++ Pipeline.all ++ TpcH.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The corpus-curation pipeline composes quality filtering, exact dedup,
    * and MinHash-LSH near-dup removal — the engine's training-data story
    * end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.x90CorpusPipeline.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
