package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Model version registry with lifecycle-stage transitions (reference:
 * src/ml/feedback_logging.py:152-190 ModelRegistry table + :572-595
 * ABTestManager.promote_model/rollback — the reference mutates an
 * in-memory traffic dict; here the registry is a durable manifest next
 * to the model artifacts, so a serving tier and a training pipeline
 * share one source of truth). Stages mirror the reference ModelStage
 * enum: development → staging → production → archived
 * (feedback_logging.py:56-61).
 *
 * The manifest is a single tiny JSON file written via the Hadoop
 * FileSystem (works on hdfs:///s3a:// like every other artifact path in
 * the repo) with the same no-external-dep serialization discipline as
 * EnsembleModel.save. Writes land COMPLETE in a side file first, then
 * swap in via delete + rename; read() falls back to the side file when
 * the main manifest is absent, so a crash at ANY point of a transition
 * leaves a readable manifest (old state before the delete, new state
 * after — never torn, never empty). Invariant: at most
 * one version is in 'production' at any time — promote and rollback
 * both archive the incumbent in the same transition.
 */
object Registry {

  /** The reference ModelStage enum — the only stage strings reads
    * recognize. */
  private val Stages =
    Set("development", "staging", "production", "archived")

  final case class Entry(version: String, stage: String, path: String)

  final case class Manifest(entries: Seq[Entry]) {
    def production: Option[Entry] = entries.find(_.stage == "production")
    def apply(version: String): Entry = entries.find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown model version $version"))
  }

  private def manifestPath(dir: String) = new Path(s"$dir/registry.json")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def tmpPath(dir: String) = new Path(s"$dir/.registry.json.tmp")

  /** Crash recovery — WRITE-path only, by design: the side file is
    * always written COMPLETE before the main manifest is touched, so
    * "main absent + side present" means a write died between its delete
    * and its rename. The next WRITER finishes that rename before
    * truncating the side file (without this, the truncation would
    * destroy the only copy). Readers never heal: a mutating read would
    * race an in-flight writer's own rename (stealing it → spurious
    * failure for a transition that landed) and could even publish a
    * half-written FIRST manifest; read() instead falls back to the
    * side file passively. Writers must be serialized by the caller —
    * the same single-maintainer contract as the Layout swap jobs. */
  /** A complete side file ends with ']' — the whole JSON lands in one
    * write buffer, so truncation cannot preserve the terminator. Used
    * by the WRITE path only (writers are serialized, so the re-open
    * cannot race a rename; the read path judges completeness on its
    * own single read). */
  private def sideComplete(f: org.apache.hadoop.fs.FileSystem,
                           tmp: Path): Boolean =
    try {
      val in = f.open(tmp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.trim.endsWith("]")
    } catch { case _: java.io.FileNotFoundException => false }

  private def heal(f: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val p = manifestPath(dir)
    val tmp = tmpPath(dir)
    if (!f.exists(p) && f.exists(tmp)) {
      if (!sideComplete(f, tmp)) {
        // torn side file from a crash mid-FIRST-write: nothing was ever
        // committed — discard instead of publishing a truncated state
        f.delete(tmp, false)
      } else if (!f.rename(tmp, p))
        throw new java.io.IOException(s"registry heal rename failed at $p")
    }
  }

  def read(spark: SparkSession, dir: String): Manifest = {
    val p = manifestPath(dir)
    val f = fs(spark, p)
    // passive crash-window fallback: main absent + side present → the
    // side file IS the committed state (see heal's scaladoc); main
    // present → the side file is a stale pre-delete leftover, ignored.
    // A COMPLETE side file ends with ']' (written in one buffer) — a
    // torn one (crash mid-first-write, no main to fall back to) is
    // treated as no manifest: a first write that never completed
    // committed nothing, and trusting a truncated entry list would let
    // the next heal publish it durably.
    // The probe pair races a concurrent writer's delete→rename window:
    // if both probes miss, the rename may have completed BETWEEN them —
    // re-probe main once before concluding empty (writers are
    // serialized, so one transition is the only thing a read can race).
    def parseText(path: Path): Option[String] =
      try {
        val in = f.open(path)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      } catch {
        // deleted between exists() and open() by the racing writer —
        // None so the caller RE-PROBES (mapping this to an empty
        // manifest would let a fully-successful transition read as
        // "no versions registered" for one racing reader)
        case _: java.io.FileNotFoundException => None
      }
    val entry = """\{"version":"([^"]+)","stage":"([^"]+)","path":"([^"]*)"\}""".r
    def manifestOf(txt: String): Manifest =
      Manifest(entry.findAllMatchIn(txt)
        .map(m => Entry(m.group(1), m.group(2), m.group(3))).toSeq)
    def attempt(): Option[Manifest] =
      if (f.exists(p)) parseText(p).map(manifestOf)
      else {
        val tmp = tmpPath(dir)
        if (f.exists(tmp)) parseText(tmp) match {
          case None => None // rename landed mid-probe: re-probe main
          // completeness judged on the SAME read (a second open would
          // re-widen the rename race): a complete side file ends with
          // ']' — the whole JSON lands in one write buffer
          case Some(txt) if txt.trim.endsWith("]") => Some(manifestOf(txt))
          // genuinely torn side file with no main: nothing committed
          case Some(_) => Some(Manifest(Seq.empty))
        } else None
      }
    attempt()
      .orElse(attempt()) // one re-probe closes the rename race window
      .getOrElse(Manifest(Seq.empty))
  }

  // the manifest is line-protocol JSON parsed by regex (the
  // EnsembleModel.save no-external-dep discipline): reject strings the
  // format cannot carry rather than escaping them — a version id or
  // artifact path with quotes/backslashes/newlines is a caller bug
  private def checkSafe(what: String, s: String,
                        nonEmpty: Boolean = false): Unit = {
    require(!s.exists(c => c == '"' || c == '\\' || c == '\n' || c == '\r'),
      s"""$what "$s" may not contain quotes, backslashes or newlines""")
    // the read regex requires [^"]+ for version/stage — an empty one
    // would write fine and then silently vanish on read
    require(!nonEmpty || s.nonEmpty, s"$what may not be empty")
  }

  private def write(spark: SparkSession, dir: String, m: Manifest): Unit = {
    m.entries.foreach { e =>
      checkSafe("version", e.version, nonEmpty = true)
      checkSafe("stage", e.stage, nonEmpty = true)
      checkSafe("path", e.path)
    }
    heal(fs(spark, manifestPath(dir)), dir)
    val json = m.entries.sortBy(_.version)
      .map(e => s"""{"version":"${e.version}","stage":"${e.stage}","path":"${e.path}"}""")
      .mkString("[", ",", "]")
    val p = manifestPath(dir)
    val f = fs(spark, p)
    val tmp = tmpPath(dir)
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // delete-then-rename is NOT atomic; read()'s side-file fallback
    // covers the window between the two (the side file already holds
    // the complete new state at this point)
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"registry rename failed at $p")
  }

  /** Register a new version (stage 'development' unless given). A
    * re-register of an existing version replaces its entry. */
  def register(spark: SparkSession, dir: String, version: String,
               artifactPath: String, stage: String = "development"): Manifest = {
    // the lifecycle enum is enforced on the one caller-supplied stage
    // entry point: a typo ("Production", "prod") would otherwise write
    // an entry no lookup recognizes and skip the incumbent demotion
    require(Stages.contains(stage),
      s"unknown stage '$stage' (one of ${Stages.toSeq.sorted.mkString(", ")})")
    val m = read(spark, dir)
    // registering straight into production is a promote: the incumbent
    // archives in the SAME transition, or the single-production
    // invariant would be unenforced on this path
    val demoted =
      if (stage == "production")
        m.entries.map(e =>
          if (e.stage == "production" && e.version != version)
            e.copy(stage = "archived")
          else e)
      else m.entries
    val next = Manifest(demoted.filterNot(_.version == version) :+
      Entry(version, stage, artifactPath))
    write(spark, dir, next)
    next
  }

  /** Promote `version` to production; the incumbent production version
    * (if any, and not `version` itself) moves to archived in the SAME
    * transition — the single-production invariant. */
  def promote(spark: SparkSession, dir: String, version: String): Manifest = {
    val m = read(spark, dir)
    m(version) // fail loudly on unknown version
    val next = Manifest(m.entries.map { e =>
      if (e.version == version) e.copy(stage = "production")
      else if (e.stage == "production") e.copy(stage = "archived")
      else e
    })
    write(spark, dir, next)
    next
  }

  /** Emergency rollback: re-promote a previously archived (or staged)
    * version. Same transition semantics as promote — the reference's
    * rollback IS a promote of the old version
    * (feedback_logging.py:585-595). */
  def rollback(spark: SparkSession, dir: String, toVersion: String): Manifest =
    promote(spark, dir, toVersion)
}
