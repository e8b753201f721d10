package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-session scratch paths for query-local artifacts (the q161/q176/
  * q180 materialize-then-reread shapes). Keyed by the Spark
  * applicationId so CONCURRENT harness runs (driver verify + builder
  * bench) never race on a shared literal path's mode("overwrite") —
  * each session reads only artifacts it wrote itself. */
object Scratch {
  def path(s: SparkSession, tag: String): String = {
    val base = System.getProperty("java.io.tmpdir", "/tmp")
    s"$base/graft_${s.sparkContext.applicationId}/$tag"
  }

  /** Published artifact dir for queries whose DuckDB oracle must
    * read_parquet the SAME files the Spark query wrote (the q204
    * stored-trained-index discipline). Keyed by (tag, SF basename,
    * JVM pid): the oracle SQL is dumped by the SAME JVM that ran the
    * query, so the pid in the templated path always matches — while
    * two concurrent sessions (driver verify + builder bench) can
    * NEVER interleave a delete+rename on a shared literal path, the
    * residual race the r16 staged-rename publish still carried. The
    * artifacts must OUTLIVE the JVM (duckcheck replays them after
    * Verify exits), so no cleanup hook — stale pid-dirs in tmp are
    * the accepted cost of a race-free gate. */
  def oraclePath(tag: String, sfBase: String): String = {
    val base = System.getProperty("java.io.tmpdir", "/tmp")
    s"$base/graft_${tag}_${sfBase}_p${ProcessHandle.current().pid()}"
  }
}
