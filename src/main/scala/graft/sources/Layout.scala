package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout for multi-column data skipping —
 * the write-side twin of `Bucketing` (SURVEY §4 physical knobs).
 *
 * Parquet scans prune row groups by min/max statistics. Sorting by ONE
 * column gives perfect skipping on that column and none on any other;
 * interleaving the bits of k quantized columns into a single z-value and
 * range-partitioning + sorting by it gives every interleaved column
 * locality ~2^(bits·(k-1)/k) — each file covers a small HYPER-RECTANGLE
 * of the key space, so a selective predicate on ANY of the columns
 * skips most files. At 100 TB this is the difference between "scan the
 * table" and "read 1% of it" for the second and third filter column.
 *
 * Mechanics (all declarative, whole-stage-codegen'd):
 *  - quantize each column to `bits`-bit ranks with `width_bucket` over
 *    the column's min/max (one tiny agg job for the bounds);
 *  - interleave bits with shift/mask expressions → one LONG z-value
 *    (k·bits ≤ 63);
 *  - `repartitionByRange` on z (range exchange ≈ one shuffle, same cost
 *    class as any sort) + `sortWithinPartitions` so row groups within a
 *    file are tight too.
 *
 * `LayoutSpec` asserts the interleave arithmetic and the locality
 * property: per-partition bounding boxes of a z-ordered layout are
 * multiples smaller than a hash layout's. Uniform-width quantization is
 * skew-sensitive (a hot value crowds one bucket); for skewed columns
 * feed quantile boundaries instead of min/max linearity — the
 * interleave is boundary-agnostic.
 */
object Layout {

  /** Hive-style date-partitioned write: one directory per day of `ts`.
    * Partition pruning is COARSER-GRAINED and cheaper than row-group
    * skipping — a date predicate eliminates directories at PLANNING time
    * (no file footers read at all), which is why event/fact tables at
    * 100 TB are date-partitioned first and z-ordered/sorted within.
    * Day granularity keeps partition counts sane (a year ≈ 365 dirs);
    * hour-partitioning a decade of data makes 87k partitions and a
    * metadata bottleneck — partition on the coarsest unit queries
    * actually filter by. */
  def writeDatePartitioned(df: DataFrame, ts: String, path: String): Unit =
    df.withColumn("_day", to_date(col(ts)))
      .write.mode("overwrite").partitionBy("_day").parquet(path)

  /** Quantize `c` into [0, 2^bits) uniform-width ranks given inclusive
    * bounds. Out-of-range values clamp to the edge buckets. */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val n = 1 << bits
    // degenerate lo==hi → single bucket 0
    val wb = when(hi <= lo, lit(1))
      .otherwise(width_bucket(c.cast("double"), lo.cast("double"),
        hi.cast("double"), lit(n)))
    least(greatest(wb - lit(1), lit(0)), lit(n - 1)).cast("long")
  }

  /** Morton interleave of pre-quantized [0, 2^bits) long columns:
    * bit i of column j lands at position i·k + j. Pure shift/mask
    * expression tree — stays in codegen. */
  def zValue(quantized: Seq[Column], bits: Int): Column = {
    val k = quantized.size
    require(k > 0 && k * bits <= 63, s"k=$k bits=$bits exceeds long range")
    val pieces = for {
      (q, j) <- quantized.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * k + j)
    pieces.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered by `cols` (bounds discovered from the data)
    * into `numFiles` range partitions at `path`. */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 8): Unit =
    zordered(df, cols, numFiles, bits).write.mode("overwrite").parquet(path)

  /**
   * Small-files compaction for an append-only parquet directory — the
   * maintenance job every streaming sink needs: per-trigger appends
   * (T3's per-batch dirs, any `writeStream` parquet sink) accumulate
   * files far below the row-group sweet spot, and at 100 TB a scan's
   * task count and footer-read cost grow with FILE count, not byte
   * count. Rewrites the directory to ceil(totalBytes/targetBytes)
   * files via one read → range-free `repartition` → write-to-temp, then
   * swaps: verified-then-rename, with the previous generation deleted
   * only AFTER the new one is in place.
   *
   * Correctness protocol (rename-atomic FS semantics):
   *  1. the SNAPSHOT is `df.inputFiles` of the frame actually rewritten
   *     — never a separate listing, so files appended by a racing
   *     trigger between list and read cannot be deleted-but-not-copied
   *     or copied-but-not-deleted (they simply stay for the next run);
   *  2. the rewrite lands in a side directory, row-count-verified
   *     BEFORE any destructive step;
   *  3. a `_compaction_pending` marker listing the superseded files is
   *     written, the new generation (unique per-run names — re-running
   *     can never collide with a previous generation) is renamed in
   *     with every rename result CHECKED, then the superseded files are
   *     deleted and the marker removed. A crash mid-swap leaves marker
   *     + both generations; [[recoverCompaction]] (run automatically at
   *     entry) completes the deletion from the marker — duplicates are
   *     transient and self-healing, data loss is impossible.
   * Readers racing the swap on a plain filesystem may glimpse a mixed
   * listing — the documented limit of directory-level parquet at scale;
   * table formats (metadata-tracked file sets) exist precisely to close
   * that gap, and this operator is the pattern they execute internally.
   * Returns the new file count (or the unchanged snapshot count when
   * the directory is already at-or-under target).
   */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
                     targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    recoverCompaction(spark, dir)
    val df = spark.read.parquet(dir)
    // the EXACT file set the rewrite reads — the only set safe to delete
    val snapshot = df.inputFiles.map(new org.apache.hadoop.fs.Path(_))
    // the marker protocol records bare file names resolved against `dir`;
    // a nested (hive-partitioned) layout would flatten on rewrite and its
    // delete lines would silently no-op — refuse up front. The intended
    // target is flat streaming-sink output; partitioned tables compact
    // per-partition (call per leaf directory).
    val qualified = fs.makeQualified(path)
    snapshot.foreach { p =>
      require(fs.makeQualified(p).getParent == qualified,
        s"compactParquet requires a FLAT directory; found nested file $p " +
          s"under $dir — compact partitioned layouts per leaf directory")
    }
    val totalBytes = snapshot.map(p => fs.getFileStatus(p).getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (snapshot.length <= targetFiles) return snapshot.length
    val expected = df.count()
    // unique generation id: a rerun's names can never collide with a
    // surviving previous generation; the tmp dir is per-generation too,
    // so a second maintenance job entering concurrently can never wipe
    // this job's verified-but-unrenamed generation (the former shared
    // tmp was exactly that hazard)
    val gen = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir + TmpInfix + gen)
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    val got = spark.read.parquet(tmp.toString).count()
    require(got == expected,
      s"compaction row-count mismatch ($got != $expected) — original left untouched")
    val newFiles = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val plan = newFiles.zipWithIndex.map { case (f, i) =>
      f.getPath.getName -> s"compacted-$gen-$i.parquet"
    }
    swapIn(fs, path, tmp, plan.toSeq, snapshot.map(_.getName).toSeq)
    // drop cached file listings: a plan built over the dir BEFORE the
    // swap would otherwise resolve deleted files at execution time
    spark.catalog.refreshByPath(dir)
    newFiles.length
  }

  final case class DeleteStats(filesRewritten: Int, filesUntouched: Int,
                               rowsDeleted: Long)

  final case class UpsertStats(filesRewritten: Int, filesUntouched: Int,
                               rowsReplaced: Long, rowsInserted: Long)

  /**
   * Keyed point upsert into a flat parquet lake dir — the serving-store
   * write behind a PATCH-one-row API (reference:
   * src/api/main.py:554-586 updates one recommendation's status/notes
   * in place; here the lake IS the store). `updates` holds FULL rows
   * (same columns as the table, any order); rows whose key already
   * exists REPLACE the stored row, new keys INSERT. The whole upsert is
   * ONE [[compactParquet]]-marker transaction: the new generation =
   * (affected files minus matched keys) ∪ updates, row-count-verified
   * before any destructive step — a crash at any point self-heals via
   * [[recoverCompaction]], and a reader never sees the key absent.
   *
   * Scale contract: this is the POINT-update path — `updates` is a
   * handful of rows (its keys collect to the driver to prune the file
   * scan, bounded by `maxKeys`). Only files CONTAINING a matched key
   * rewrite (parquet min/max skipping + a z-ordered layout on the key
   * make the probe read ~nothing else); a pure insert rewrites no file
   * at all — it lands as one new file. Bulk upserts belong to
   * [[graft.operators.Scd2]] / a partition-overwrite rebuild, not here.
   */
  def upsertByKey(spark: org.apache.spark.sql.SparkSession, dir: String,
                  updates: org.apache.spark.sql.DataFrame, keyCol: String,
                  maxKeys: Int = 1000): UpsertStats = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    recoverCompaction(spark, dir)
    val df = spark.read.parquet(dir)
    require(updates.columns.sorted.sameElements(df.columns.sorted),
      s"upsertByKey: updates columns ${updates.columns.sorted.mkString(",")} " +
        s"must match table columns ${df.columns.sorted.mkString(",")}")
    val u = updates.select(df.columns.map(col): _*)
    // TYPES too, not just names: a pure insert writes `u` verbatim as a
    // new file — a mismatched type (v: INT vs the table's DOUBLE) would
    // land a conflicting physical schema and brick every subsequent
    // read of the directory (the replace path would at least fail in
    // unionByName; the insert path had no check at all)
    val tTypes = df.schema.map(f => f.name -> f.dataType).toMap
    val badTypes = u.schema.filter(f => tTypes(f.name) != f.dataType)
    require(badTypes.isEmpty,
      "upsertByKey: update column type(s) differ from the table: " +
        badTypes.map(f =>
          s"${f.name}: ${f.dataType.simpleString} vs ${tTypes(f.name).simpleString}")
          .mkString(", "))
    val keyRows = u.select(keyCol).distinct().limit(maxKeys + 1).collect()
    require(keyRows.length <= maxKeys,
      s"upsertByKey is the point-update path (> $maxKeys distinct keys); " +
        "use a partition rebuild for bulk upserts")
    require(keyRows.nonEmpty, "upsertByKey: empty updates")
    // a NULL key can never equal a stored key (three-valued isin), so
    // it would re-insert on every replay instead of replacing — reject
    require(!keyRows.exists(_.isNullAt(0)),
      s"upsertByKey: NULL $keyCol in updates — keys must be non-null")
    require(u.count() == keyRows.length,
      s"upsertByKey: duplicate keys in updates — one row per $keyCol")
    val keys = keyRows.map(_.get(0)).toSeq
    val pred = col(keyCol).isin(keys: _*)
    val snapshot = df.inputFiles.map(new org.apache.hadoop.fs.Path(_))
    val qualified = fs.makeQualified(path)
    snapshot.foreach { p =>
      require(fs.makeQualified(p).getParent == qualified,
        s"upsertByKey requires a FLAT directory; found nested file $p")
    }
    val affected = df.filter(pred)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val matched = affected.map(_._2).sum
    // more matches than distinct keys ⇒ the STORED table already holds
    // a duplicated key (corruption outside the marker protocol) — fail
    // loudly rather than emit negative rowsInserted stats
    require(matched <= keys.length,
      s"upsertByKey: stored table holds duplicate $keyCol rows " +
        s"($matched matches for ${keys.length} keys) — repair the table " +
        "(deleteWhere + re-insert) before upserting")
    val affectedSet = affected.map { case (f, _) =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(new java.net.URI(f)))
    }.toSet
    val gen = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir + TmpInfix + gen)
    val (newGen, expected) =
      if (affectedSet.isEmpty) (u, keys.length.toLong)
      else {
        val affectedDf =
          spark.read.parquet(affectedSet.map(_.toString).toSeq: _*)
        // NULL-key rows kept, as in deleteWhere
        (affectedDf.filter(!coalesce(pred, lit(false))).unionByName(u),
          affectedDf.count() - matched + keys.length)
      }
    newGen.write.mode("overwrite").parquet(tmp.toString)
    val got = spark.read.parquet(tmp.toString).count()
    require(got == expected,
      s"upsertByKey row-count mismatch ($got != $expected) — original " +
        "left untouched")
    val newFiles = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val plan = newFiles.zipWithIndex.map { case (f, i) =>
      f.getPath.getName -> s"upserted-$gen-$i.parquet"
    }
    swapIn(fs, path, tmp, plan.toSeq,
      affectedSet.toSeq.sortBy(_.getName).map(_.getName))
    // a long-lived serving plan over the dir (ApiShell's listing) must
    // not resolve the pre-swap file set — refresh the path's cached
    // listings as part of the transaction
    spark.catalog.refreshByPath(dir)
    UpsertStats(newFiles.length, snapshot.length - affectedSet.size,
      matched, keys.length - matched)
  }

  /**
   * PATCH-one-row semantics over [[upsertByKey]] (reference:
   * api/main.py:554-586): read the current row by key (a pruned point
   * lookup), fail loudly when absent (the endpoint's 404), apply the
   * partial `setters` (column → new-value expression, evaluated against
   * the current row), write back through the upsert transaction.
   */
  def patchRow(spark: org.apache.spark.sql.SparkSession, dir: String,
               keyCol: String, keyValue: Any,
               setters: Map[String, Column]): UpsertStats = {
    // recover any crashed swap BEFORE reading: a pending marker means
    // both generations may be on disk — reading through it would see
    // the key twice (tripping the duplicate-key guard) or resolve
    // files that the recovery inside upsertByKey then deletes
    recoverCompaction(spark, dir)
    val df = spark.read.parquet(dir)
    val bad = setters.keySet.filterNot(df.columns.contains)
    require(bad.isEmpty, s"patchRow: unknown column(s) ${bad.mkString(",")}")
    require(!setters.contains(keyCol), "patchRow cannot rewrite the key")
    val current = df.filter(col(keyCol) === lit(keyValue))
    require(!current.isEmpty,
      s"patchRow: no row with $keyCol = $keyValue (not found)")
    val updated = setters.foldLeft(current) { case (acc, (c, e)) =>
      acc.withColumn(c, e)
    }
    upsertByKey(spark, dir, updated, keyCol)
  }

  /**
   * Targeted row deletion from a flat parquet directory — the
   * right-to-erasure / retention-purge maintenance job (the data-plane
   * half of the governance story whose release half is
   * `quality.Privacy`): rewrite ONLY the files that contain matching
   * rows and leave every other file physically untouched (same name,
   * same bytes — downstream caches and replication stay valid).
   *
   * At 100 TB the win is the file-pruning composition: finding the
   * affected files is a predicate scan, so parquet min/max skipping
   * (and a z-ordered layout on the predicate column — [[zorderWrite]])
   * means the files that DON'T contain the subject are never even
   * read, and the rewrite cost is ∝ files-containing-matches, not
   * table size. A table format's DELETE executes exactly this shape
   * internally.
   *
   * Uses the [[compactParquet]] marker transaction verbatim (same
   * marker, same side directory, same [[recoverCompaction]] replay):
   * the kept rows of affected files land in the side dir,
   * row-count-verified BEFORE any destructive step, then marker →
   * renames → deletes. A crash at any point self-heals at the next
   * entry of either maintenance job. An affected file whose every row
   * matches is simply deleted (no empty rewrite file).
   */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, dir: String,
                  predicate: Column): DeleteStats = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    recoverCompaction(spark, dir)
    val df = spark.read.parquet(dir)
    val snapshot = df.inputFiles.map(new org.apache.hadoop.fs.Path(_))
    val qualified = fs.makeQualified(path)
    snapshot.foreach { p =>
      require(fs.makeQualified(p).getParent == qualified,
        s"deleteWhere requires a FLAT directory; found nested file $p " +
          s"under $dir — delete from partitioned layouts per leaf directory")
    }
    // predicate scan: min/max (and partition-file) pruning decides which
    // files are read at all; only files with actual matches rewrite
    val affected = df.filter(predicate)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (affected.isEmpty)
      return DeleteStats(0, snapshot.length, 0L)
    val matched = affected.map(_._2).sum
    val affectedSet = affected.map { case (f, _) =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(new java.net.URI(f)))
    }.toSet
    val affectedDf = spark.read.parquet(affectedSet.map(_.toString).toSeq: _*)
    val expected = affectedDf.count() - matched
    val gen = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir + TmpInfix + gen)
    // NULL-predicate rows are KEPT: an erasure job deletes only rows the
    // predicate PROVES match (`matched` counts true rows only; a plain
    // !predicate would drop NULL rows from the rewrite too and trip the
    // row-count guard — the job could never complete on NULL-bearing data)
    affectedDf.filter(!coalesce(predicate, lit(false)))
      .write.mode("overwrite").parquet(tmp.toString)
    val got = spark.read.parquet(tmp.toString).count()
    require(got == expected,
      s"deleteWhere row-count mismatch ($got != $expected) — original left untouched")
    val newFiles = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val plan = newFiles.zipWithIndex.map { case (f, i) =>
      f.getPath.getName -> s"deleted-$gen-$i.parquet"
    }
    swapIn(fs, path, tmp, plan.toSeq,
      affectedSet.toSeq.sortBy(_.getName).map(_.getName))
    spark.catalog.refreshByPath(dir)
    DeleteStats(newFiles.length, snapshot.length - affectedSet.size, matched)
  }

  /**
   * The shared swap transaction of [[compactParquet]] and
   * [[deleteWhere]]: given a VERIFIED new generation sitting in `tmp`,
   * commit the marker, rename the generation in, delete the superseded
   * files, clean up. The marker IS the transaction: written complete to
   * a side name and renamed into place (atomic — a crash mid-write
   * strands only the ignored side file, never a truncated marker whose
   * R-lines would replay without their D-lines), it records the tmp
   * directory (`T` line) plus every rename and delete, so
   * [[recoverCompaction]] replays it idempotently from ANY crash point
   * — rename atomicity means each planned file exists at exactly one of
   * (tmp src, final dst). Maintenance jobs on one directory must be
   * SERIALIZED by the caller (one maintainer at a time — the same
   * contract every directory-level parquet maintainer has); the
   * per-generation tmp dirs bound the concurrent-entry damage to a
   * failed job, never a wedged directory or destroyed generation.
   */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem,
                     path: org.apache.hadoop.fs.Path,
                     tmp: org.apache.hadoop.fs.Path,
                     plan: Seq[(String, String)],
                     deletes: Seq[String]): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path, MarkerName)
    val markerTmp = new org.apache.hadoop.fs.Path(path, MarkerTmpName)
    val out = fs.create(markerTmp, true)
    try out.write(
      (Seq(s"T ${tmp.getName}") ++
        plan.map { case (s, d) => s"R $s $d" } ++
        deletes.map(n => s"D $n")).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(markerTmp, marker),
      s"maintenance marker rename failed: $markerTmp -> $marker " +
        "(nothing moved yet; original directory untouched)")
    plan.foreach { case (src, dst) =>
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp, src),
        new org.apache.hadoop.fs.Path(path, dst)),
        s"maintenance rename failed: $src -> $dst (marker left in place; " +
          "recoverCompaction completes the swap)")
    }
    deletes.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(path, n), false))
    fs.delete(marker, false)
    fs.delete(tmp, true)
  }

  private val MarkerName = "_compaction_pending"
  // side name for the atomic marker write; underscore-prefixed so parquet
  // scans of the directory ignore it even if a crash strands it
  private val MarkerTmpName = "_compaction_pending.tmp"

  /** Complete an interrupted [[compactParquet]] swap from its marker:
    * finish the planned renames still sitting in the side directory,
    * then apply the planned deletes, then drop the marker. Idempotent
    * from any crash point (each planned file exists at exactly one of
    * its two locations); a no-op without a marker. A stranded marker
    * SIDE file (crash mid-marker-write — the transaction never began)
    * is simply discarded. Runs automatically at every compactParquet
    * entry. */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(path, MarkerName)
    // a .tmp marker means the crash happened BEFORE the transaction was
    // committed (the rename); nothing was moved — drop it and leave the
    // directory as-is (the tmp generation, if any, is re-cleared by the
    // next run's fs.delete(tmp, true))
    fs.delete(new org.apache.hadoop.fs.Path(path, MarkerTmpName), false)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val lines =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
        finally in.close()
      // the `T` line names the transaction's own tmp dir (a sibling of
      // `dir`); markers written before the per-generation tmp scheme
      // carry no T line and used the fixed legacy name
      val tmp = lines.headOption.collect {
        case t if t.startsWith("T ") =>
          new org.apache.hadoop.fs.Path(path.getParent, t.drop(2))
      }.getOrElse(new org.apache.hadoop.fs.Path(dir + "_compact_tmp"))
      lines.filterNot(_.startsWith("T ")).foreach { line =>
        line.split(" ") match {
          case Array("R", src, dst) =>
            val d = new org.apache.hadoop.fs.Path(path, dst)
            val s = new org.apache.hadoop.fs.Path(tmp, src)
            if (!fs.exists(d)) {
              require(fs.exists(s) && fs.rename(s, d),
                s"compaction recovery cannot complete rename $src -> $dst")
            }
          case Array("D", name) =>
            fs.delete(new org.apache.hadoop.fs.Path(path, name), false)
          case other =>
            throw new IllegalStateException(
              s"unrecognized compaction marker line: ${other.mkString(" ")}")
        }
      }
      fs.delete(marker, false)
      fs.delete(tmp, true)
    }
    // sweep pre-commit tmp garbage: any sibling generation dir with no
    // marker referencing it is a crash BEFORE the transaction committed
    // — the originals are intact, the orphan generation is dead weight
    val parent = path.getParent
    if (parent != null && fs.exists(parent)) {
      fs.listStatus(parent)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(path.getName + TmpInfix))
        .foreach(st => fs.delete(st.getPath, true))
      // the pre-per-generation fixed tmp name, same reasoning
      fs.delete(new org.apache.hadoop.fs.Path(dir + "_compact_tmp"), true)
    }
  }

  // per-generation tmp-dir suffix: <dir>_compact_tmp_<gen>
  private val TmpInfix = "_compact_tmp_"

  /** The production fact-table layout, composed: Hive date partitions
    * (PLANNING-time pruning on the time predicate — directories are
    * eliminated before any footer is read) with rows Z-ORDERED inside
    * each partition (row-group min/max skipping on the non-time filter
    * columns). A day-range + key predicate then reads only the matching
    * day directories and, within them, only the row groups whose z-tight
    * min/max straddle the key — the two pruning layers multiply. One
    * shuffle (hash on day), bounds discovered in one tiny agg. */
  def writeDatePartitionedZordered(df: DataFrame, ts: String,
                                   zcols: Seq[String], path: String,
                                   bits: Int = 8): Unit = {
    val aggs = zcols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val qs = zcols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), lit(bounds.get(2 * i)), lit(bounds.get(2 * i + 1)), bits)
    }
    df.withColumn("_day", to_date(col(ts)))
      .withColumn("_z", zValue(qs, bits))
      .repartition(col("_day"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").partitionBy("_day").parquet(path)
  }

  /** The layout transform itself (exposed for spec/inspection). */
  def zordered(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 8): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val qs = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), lit(bounds.get(2 * i)), lit(bounds.get(2 * i + 1)), bits)
    }
    df.withColumn("_z", zValue(qs, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
