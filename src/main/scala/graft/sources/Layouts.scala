package graft.sources

import org.apache.spark.sql.SparkSession

/** Root directory for MATERIALIZED layout artifacts — the
  * hive-partitioned and z-ordered rewrites ([[PartitionedWrite]],
  * [[ZOrderedWrite]]) and the derived tables that live beside them
  * (q50's month-sketch parquet). One dial for all of them
  * (`graft.layout.root` conf / `GRAFT_LAYOUT_ROOT` env, default
  * `target`): the default keeps local runs self-contained; on a
  * cluster point it at the warehouse mount, where the partition tree
  * and its sketch sidecar land TOGETHER — the production posture
  * q50's scaladoc describes (a sketch row materialized as each
  * partition is ingested, rollups never re-scanning raw ids).
  *
  * Everything under the root is rebuild-on-miss: each artifact is
  * memoized per (session, corpus) and rewritten when the memo is
  * cold, so a wiped root — `sbt clean` at the demo scale — costs one
  * rebuild pass, never correctness.
  */
object Layouts {
  def root(s: SparkSession): String =
    s.conf.getOption("graft.layout.root")
      .orElse(sys.env.get("GRAFT_LAYOUT_ROOT"))
      .getOrElse("target")
}
