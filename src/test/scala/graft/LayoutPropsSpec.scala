package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.sources.Layout

/** Property invariants for the targeted-deletion maintenance job under
  * generated layouts and predicates: for ANY file layout and ANY
  * predicate, deleteWhere must leave exactly `filter(!pred)` behind,
  * preserve untouched files BY NAME, and report reconciling stats.
  * Few, fat cases — each spins a filesystem rewrite. */
class LayoutPropsSpec extends SparkSpec with PropsCases {

  override protected def seedBase: Long = 1234L

  test("deleteWhere == filter(!pred) for random layouts and predicates; " +
      "untouched files preserved by name, stats reconcile") {
    val caseGen = for {
      rows <- Gen.choose(500, 2000)
      nFiles <- Gen.choose(1, 12)
      modBase <- Gen.choose(2L, 9L)
      target <- Gen.choose(0L, modBase - 1)
      byRange <- Gen.oneOf(true, false)
    } yield (rows, nFiles, modBase, target, byRange)
    cases(caseGen, 6).foreach { case (rows, nFiles, modBase, target, byRange) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-delprop")
        .resolve("t").toString
      val df = spark.range(rows.toLong)
        .selectExpr("id", s"id % $modBase AS k", "id * 2 AS v")
      val writer = if (byRange) df.repartitionByRange(nFiles, col("k"))
        else df.repartition(nFiles)
      writer.write.parquet(dir)
      def files() = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      val before = files()
      val pred = col("k") === target
      val expectSurvivors = df.filter(!pred)
        .select("id").collect().map(_.getLong(0)).toSet
      val expectDeleted = rows - expectSurvivors.size
      val stats = Layout.deleteWhere(spark, dir, pred)
      assert(stats.rowsDeleted === expectDeleted.toLong,
        s"rows=$rows files=$nFiles mod=$modBase target=$target range=$byRange")
      val survivors = spark.read.parquet(dir)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(survivors === expectSurvivors)
      val after = files()
      assert(before.intersect(after).size === stats.filesUntouched)
      assert(after.size === stats.filesUntouched + stats.filesRewritten)
      // second application is a no-op
      assert(Layout.deleteWhere(spark, dir, pred) ===
        Layout.DeleteStats(0, after.size, 0L))
    }
  }

  test("random upsert/delete sequences: the lake equals an in-memory " +
      "key-value reference after every operation; stats reconcile") {
    import spark.implicits._
    val opGen = for {
      n <- Gen.choose(1, 4)
      ops <- Gen.listOfN(n, for {
        isUpsert <- Gen.oneOf(true, true, false) // upsert-biased
        keys <- Gen.nonEmptyListOf(Gen.choose(0L, 120L)).map(_.distinct.take(5))
        v <- Gen.choose(-1000, 1000)
      } yield (isUpsert, keys, v.toDouble))
    } yield ops
    cases(opGen, 5).foreach { ops =>
      val dir = java.nio.file.Files.createTempDirectory("graft-upprop")
        .resolve("t").toString
      val init = spark.range(100)
        .selectExpr("id", "cast(id as double) AS v")
      init.repartitionByRange(4, col("id")).write.parquet(dir)
      // in-memory reference state
      val ref = scala.collection.mutable.Map[Long, Double](
        (0L until 100L).map(k => k -> k.toDouble): _*)
      ops.foreach { case (isUpsert, keys, v) =>
        if (isUpsert) {
          val updates = keys.map(k => (k, v)).toDF("id", "v")
          val stats = Layout.upsertByKey(spark, dir, updates, "id")
          val (replaced, inserted) = keys.partition(ref.contains)
          assert(stats.rowsReplaced === replaced.size.toLong &&
            stats.rowsInserted === inserted.size.toLong,
            s"op=($isUpsert,$keys,$v)")
          keys.foreach(k => ref(k) = v)
        } else {
          val stats = Layout.deleteWhere(spark, dir,
            col("id").isin(keys: _*))
          assert(stats.rowsDeleted === keys.count(ref.contains).toLong)
          keys.foreach(ref.remove)
        }
        val rows0 = spark.read.parquet(dir).as[(Long, Double)].collect()
        // row count FIRST: toMap would silently collapse a duplicate-key
        // bug (stale + updated row both present) into a passing equality
        assert(rows0.length === ref.size, s"after op=($isUpsert,$keys,$v)")
        assert(rows0.toMap === ref.toMap, s"after op=($isUpsert,$keys,$v)")
      }
    }
  }
}
