package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Dedup, Ivf, Multimodal, SemDedup, SetJoin, SimHash, Similarity, Winnow}

/** Single source of truth for every registered query. SparkEntry derives
  * the driver-facing `queries`/`oracleSql` maps from here, so a query wired
  * into any module is automatically visible to Verify (correctness) and
  * Bench (timing).
  */
object Registry {
  val all: Seq[Q] =
    Relational.all ++
      TextQueries.all ++
      Pipeline.all ++
      GraphQueries.all ++
      EventQueries.all ++
      StatsQueries.all ++
      Dedup.all ++
      Similarity.all ++
      Ivf.all ++
      SemDedup.all ++
      SetJoin.all ++
      SimHash.all ++
      Winnow.all ++
      Multimodal.all ++
      graft.ops.MatView.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names in Registry")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
