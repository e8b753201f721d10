package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.quality.Contracts

/**
 * Schema-evolution reader — the lake-table analog of the reference's
 * alembic migration chain (`/root/reference/alembic/`, models
 * `src/models/database.py:26-317`): a relational store migrates in
 * place, but a parquet lake accumulates PHYSICAL GENERATIONS — files
 * written under the column set that was current at write time. A real
 * user hits this on the first column add/rename; this operator reads N
 * generations of one logical table into the CURRENT schema without
 * rewriting history.
 *
 * Semantics per generation, in order:
 *  1. **rename** — the migration's rename ledger maps the generation's
 *     column names into the current vocabulary (`old -> current`),
 *     exactly what an alembic `op.alter_column(new_column_name=...)`
 *     records;
 *  2. **strictness** — a generation column that is neither in the
 *     target schema nor renamed into it nor explicitly listed in
 *     `dropped` FAILS the read: silently discarding a column is how a
 *     migration eats data (Spark's own `mergeSchema` keeps a superset,
 *     which hides exactly this bug class);
 *  3. **fill** — columns the generation predates are filled from
 *     `defaults` (else typed null), the `server_default` of an alembic
 *     `op.add_column`;
 *  4. **cast** — every column casts to the target type, and the cast
 *     must be a PROVABLY LOSSLESS WIDENING ([[widensLosslessly]]: a
 *     widened Integer→Long migration reads both generations exactly;
 *     a Long→Int or String→Long generation FAILS the read, because
 *     plain `Column.cast` under non-ANSI semantics silently
 *     nulls/truncates exactly the rows a migration must not eat).
 *     A deliberately lossy migration names its column in `allowLossy`
 *     — an explicit, per-column, auditable opt-out.
 *
 * Scale shape: per generation this is one scan projection — no
 * shuffle, no driver data; the union is a plan-level concatenation, so
 * predicate pushdown and column pruning still reach every generation's
 * parquet scan (a filter on the merged frame prunes files in ALL
 * generations). Contract validation (`contracts` per generation — the
 * reference's data_contracts applied per schema version) is one
 * aggregate pass per generation, the Contracts.validate discipline.
 */
object SchemaEvolution {

  /** One physical generation: where its files live + the renames that
    * map its column names into the current generation's vocabulary. */
  final case class Generation(path: String,
                              renames: Map[String, String] = Map.empty)

  /** True when every value of `from` casts to `to` without loss —
    * the ONLY casts the reader performs implicitly. The ladder is
    * value-exact, not merely representable: Int→Float is REFUSED
    * (24-bit mantissa), Long→Double is REFUSED (53-bit mantissa),
    * Decimal→Double is REFUSED; integral→Decimal needs the digits
    * (Long needs p−s ≥ 19). Atomic→String is lossless (decimal
    * rendering round-trips); String→anything is not. Containers
    * recurse; nullability may only widen. */
  def widensLosslessly(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if f == t => true
      case (NullType, _) => true
      case (BooleanType | ByteType | ShortType | IntegerType | LongType |
            FloatType | DoubleType | _: DecimalType | DateType |
            TimestampType | TimestampNTZType, StringType) => true
      case (ByteType, ShortType | IntegerType | LongType |
                      FloatType | DoubleType) => true
      case (ShortType, IntegerType | LongType | FloatType |
                       DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case (ByteType, d: DecimalType) => d.precision - d.scale >= 3
      case (ShortType, d: DecimalType) => d.precision - d.scale >= 5
      case (IntegerType, d: DecimalType) => d.precision - d.scale >= 10
      case (LongType, d: DecimalType) => d.precision - d.scale >= 19
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale
      case (DateType, TimestampType | TimestampNTZType) => true
      case (ArrayType(fe, fn), ArrayType(te, tn)) =>
        widensLosslessly(fe, te) && (tn || !fn)
      case (MapType(fk, fv, fn), MapType(tk, tv, tn)) =>
        widensLosslessly(fk, tk) && widensLosslessly(fv, tv) && (tn || !fn)
      case (StructType(ff), StructType(tf)) =>
        ff.length == tf.length && ff.zip(tf).forall { case (a, b) =>
          a.name == b.name && widensLosslessly(a.dataType, b.dataType) &&
            (b.nullable || !a.nullable)
        }
      case _ => false
    }

  /** The DataFrame-level kernel (file-free, spec-testable): align each
    * generation frame to `target` per the class contract and union. */
  def alignGenerations(gens: Seq[(DataFrame, Map[String, String])],
                       target: StructType,
                       defaults: Map[String, Column] = Map.empty,
                       dropped: Set[String] = Set.empty,
                       allowLossy: Set[String] = Set.empty): DataFrame = {
    require(gens.nonEmpty, "need at least one generation")
    val unknownDefaults = defaults.keySet -- target.fieldNames.toSet
    require(unknownDefaults.isEmpty,
      s"defaults for columns not in the target schema: $unknownDefaults")
    gens.zipWithIndex.map { case ((df, renames), i) =>
      val missingRenameSrc = renames.keySet -- df.columns.toSet
      require(missingRenameSrc.isEmpty,
        s"generation $i: rename sources not present: $missingRenameSrc")
      // renames apply ATOMICALLY (one projection, every mapping read
      // against the ORIGINAL names) — so a replacement chain like
      // {price_v2 -> price, price -> price_legacy} is legal, while a
      // sequential foldLeft of withColumnRenamed would create duplicate
      // names mid-chain depending on map order. Any duplicate in the
      // FINAL name list (e.g. a dual-write generation keeping both
      // `price` and `total_price` while renaming price -> total_price)
      // is refused here with the operator's own message instead of a
      // downstream AMBIGUOUS_REFERENCE crash.
      val finalNames = df.columns.map(c => renames.getOrElse(c, c))
      val dups = finalNames.groupBy(identity)
        .collect { case (nm, vs) if vs.length > 1 => nm }
      require(dups.isEmpty,
        s"generation $i: renames produce duplicate column name(s) " +
          s"${dups.mkString(", ")} (sources: ${df.columns
            .zip(finalNames).collect { case (c, f) if dups.exists(_ == f) =>
              s"$c->$f" }.mkString(", ")}) — a dual-write generation " +
          "must drop one copy explicitly before the merge")
      val renamed = df.select(df.columns.zip(finalNames).map {
        case (c, f) => col(c).as(f)
      }.toSeq: _*)
      val extra = renamed.columns.toSet -- target.fieldNames.toSet -- dropped
      require(extra.isEmpty,
        s"generation $i carries columns ${extra.toSeq.sorted.mkString(", ")} " +
          "that are neither in the target schema, renamed into it, nor " +
          "declared dropped — refusing to silently discard data")
      val have = renamed.columns.toSet
      val lossy = target.fields.toSeq.collect {
        case f if have.contains(f.name) && !allowLossy.contains(f.name) &&
          !widensLosslessly(renamed.schema(f.name).dataType, f.dataType) =>
          s"${f.name} (${renamed.schema(f.name).dataType.simpleString} " +
            s"-> ${f.dataType.simpleString})"
      }
      require(lossy.isEmpty,
        s"generation $i requires lossy cast(s) ${lossy.mkString(", ")} — " +
          "a narrowing cast silently nulls/truncates under non-ANSI " +
          "semantics and crashes mid-read under ANSI; widen the target " +
          "type, or name the column in allowLossy to opt out explicitly")
      renamed.select(target.fields.toSeq.map { f =>
        // an allowLossy column casts via try_cast — the opt-out means
        // "tolerate and null", identical under ANSI and non-ANSI, never
        // a mid-read crash on the first malformed legacy value
        if (have.contains(f.name)) {
          if (allowLossy.contains(f.name))
            col(f.name).try_cast(f.dataType).as(f.name)
          else col(f.name).cast(f.dataType).as(f.name)
        } else defaults.getOrElse(f.name, lit(null))
          .cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Read N parquet generations of one logical table into the current
    * schema. `contracts(i)` (optional, by generation index) validates
    * that generation BEFORE it joins the union — a generation that no
    * longer honors its own version's contract fails the read loudly. */
  def readEvolved(spark: SparkSession, gens: Seq[Generation],
                  target: StructType,
                  defaults: Map[String, Column] = Map.empty,
                  dropped: Set[String] = Set.empty,
                  contracts: Map[Int, Contracts.DataContract] = Map.empty,
                  allowLossy: Set[String] = Set.empty)
      : DataFrame = {
    val frames = gens.map(g => spark.read.parquet(g.path))
    contracts.foreach { case (i, c) =>
      require(i >= 0 && i < frames.size, s"contract index $i out of range")
      val r = Contracts.validate(frames(i), c)
      require(r.isValid,
        s"generation $i fails its contract '${c.name}': " +
          r.errors.mkString("; "))
    }
    alignGenerations(frames.zip(gens.map(_.renames)), target, defaults,
      dropped, allowLossy)
  }
}
