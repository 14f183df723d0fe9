package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Burden, Dedup, Etl, GeneNetwork, Inheritance, Multimodal, Relational, Similarity, Somatic, Stats, StreamingOps, Sv, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Etl.queries ++ Inheritance.queries ++
      Burden.queries ++ Stats.queries ++ GeneNetwork.queries ++
      Somatic.queries ++ Sv.queries ++ Text.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Etl.oracle ++ Inheritance.oracle ++
      Burden.oracle ++ Stats.oracle ++ GeneNetwork.oracle ++
      Somatic.oracle ++ Sv.oracle ++ Text.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ StreamingOps.oracle

  /** Queries DECLARED non-SQL-expressible (driver records a weaker
    * rows-only check; each carries a ScalaTest accuracy/round-trip spec
    * instead — see SURVEY §2). Every key in [[queries]] must appear in
    * [[oracleSql]] or here — OracleRegistrySpec enforces it, so a new
    * operator cannot register without either an oracle or an explicit,
    * reviewable entry in this set.
    */
  val rowsOnly: Set[String] = Set(
    "q12_distinct_approx", // HLL sketch — ApproxAccuracySpec <5% vs q09
    "q13_percentiles_approx", // KLL sketch — <1% vs q11
    "e08_pack_blob", // zlib blob — round-trip in Vcf2DbSpec
    "s03_ann_ivf", // IVF recall floor — SimilaritySpec
    "s04_ann_pq", // PQ recall floor — SimilaritySpec
    "d11_semantic_dedup" // KMeans cells — DedupQualitySpec exact-cosine
  )
}
