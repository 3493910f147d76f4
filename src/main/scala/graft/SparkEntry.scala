package graft

import graft.gates._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The gate definitions live in per-family files under [[graft.gates]]
  * (round-10 split of the former 10k-line single file); each family object
  * pairs its gated queries with their DuckDB oracle SQL. This object is the
  * driver-facing concatenation. Cross-engine determinism rules used
  * throughout the gates:
  *  - double aggregates are round()ed in BOTH engines, and gated rounded
  *    doubles are normalized with `+ 0.0` on both sides so neither engine
  *    can emit IEEE -0.0 (the q186 class);
  *  - integer sums are CAST(.. AS BIGINT) in DuckDB (it sums ints to
  *    HUGEINT, Spark to long);
  *  - rankings always carry an id tie-break;
  *  - timestamps leave result sets as epoch millis/seconds (BIGINT).
  */
object SparkEntry {

  /** One object per gate family; order is presentation-only (keys are
    * disjoint — GateFamiliesSpec asserts it).
    */
  val families: Seq[GateSupport] = Seq(
    RelationalGates, LoadGates, SessionGates, DedupGates, AnnGates,
    TextGates, TokenGates, SamplingGates, SketchGates, StreamGates,
    PrivacyGates, GraphGates, StatsGates, ClassifyGates, RetrievalGates,
    CurationGates, MultimodalGates, PipelineGates, MaintenanceGates)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_.queries).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    families.iterator.map(_.oracleSql).reduce(_ ++ _)
}
