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
}
