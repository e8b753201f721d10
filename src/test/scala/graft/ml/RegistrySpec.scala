package graft.ml

import graft.SparkSpec

/**
 * Manifest-transition gates for the model registry (reference
 * ModelStage lifecycle + ABTestManager.promote_model/rollback,
 * feedback_logging.py:56-61, 572-595): durable round-trip, the
 * single-production invariant across promote and rollback, loud
 * failure on unknown versions.
 */
class RegistrySpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-registry").toString

  test("register → promote → register → promote → rollback walks the " +
      "reference lifecycle with at most one production version") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1.0", s"$dir/art/v1.0")
    var m = Registry.read(spark, dir)
    assert(m("v1.0").stage === "development" && m.production.isEmpty)

    m = Registry.promote(spark, dir, "v1.0")
    assert(m.production.map(_.version) === Some("v1.0"))

    Registry.register(spark, dir, "v2.0", s"$dir/art/v2.0", stage = "staging")
    m = Registry.promote(spark, dir, "v2.0")
    // incumbent archived in the SAME transition
    assert(m.production.map(_.version) === Some("v2.0"))
    assert(m("v1.0").stage === "archived")
    assert(m.entries.count(_.stage == "production") === 1)

    // emergency rollback IS a promote of the old version
    m = Registry.rollback(spark, dir, "v1.0")
    assert(m.production.map(_.version) === Some("v1.0"))
    assert(m("v2.0").stage === "archived")
    assert(m.entries.count(_.stage == "production") === 1)

    // durable: a fresh read sees the same state
    val reread = Registry.read(spark, dir)
    assert(reread.entries.toSet === m.entries.toSet)
  }

  test("a crash between delete and rename is recovered: read falls " +
      "back to the complete side file; a stale side file never shadows " +
      "the main manifest") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1.0", "p1", stage = "production")
    Registry.register(spark, dir, "v2.0", "p2")
    // simulate the crash window: main deleted, side file (complete new
    // state) still in place
    val main = new java.io.File(s"$dir/registry.json")
    val side = new java.io.File(s"$dir/.registry.json.tmp")
    val bytes = java.nio.file.Files.readAllBytes(main.toPath)
    java.nio.file.Files.write(side.toPath, bytes)
    assert(main.delete())
    val recovered = Registry.read(spark, dir)
    assert(recovered.entries.map(_.version).toSet === Set("v1.0", "v2.0"))
    assert(recovered.production.map(_.version) === Some("v1.0"))
    // stale side file + main present → main wins
    Registry.register(spark, dir, "v3.0", "p3")
    java.nio.file.Files.write(side.toPath, "[]".getBytes)
    assert(Registry.read(spark, dir).entries.map(_.version).toSet ===
      Set("v1.0", "v2.0", "v3.0"))
  }

  test("versions/paths the line format cannot carry are rejected at " +
      "write, not corrupted") {
    val dir = freshDir()
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "v1\"beta", "p")
    }
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "v1", "a\\b")
    }
    // empty version/stage would write fine and then silently vanish on
    // read (the regex requires a non-empty match) — rejected up front
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "", "p")
    }
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "v1", "p", stage = "")
    }
    assert(Registry.read(spark, dir).entries.isEmpty)
  }

  test("a write AFTER the crash window heals first — it never truncates " +
      "the only surviving copy") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1.0", "p1", stage = "production")
    // simulate the crash window: main deleted, side file holds the state
    val main = new java.io.File(s"$dir/registry.json")
    val side = new java.io.File(s"$dir/.registry.json.tmp")
    java.nio.file.Files.copy(main.toPath, side.toPath)
    assert(main.delete())
    // next WRITE (not read) — must heal before touching the side file
    Registry.register(spark, dir, "v2.0", "p2")
    val m = Registry.read(spark, dir)
    assert(m.entries.map(_.version).toSet === Set("v1.0", "v2.0"))
    assert(m.production.map(_.version) === Some("v1.0"))
  }

  test("register(stage = production) archives the incumbent — the " +
      "single-production invariant holds on the register path too") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1", "p1", stage = "production")
    val m = Registry.register(spark, dir, "v2", "p2", stage = "production")
    assert(m.production.map(_.version) === Some("v2"))
    assert(m("v1").stage === "archived")
    assert(m.entries.count(_.stage == "production") === 1)
  }

  test("a torn side file (crash mid-first-write) is treated as no " +
      "manifest, never published") {
    val dir = freshDir()
    val side = new java.io.File(s"$dir/.registry.json.tmp")
    side.getParentFile.mkdirs()
    java.nio.file.Files.write(side.toPath,
      "[{\"version\":\"v1\",\"stage\":\"produc".getBytes)
    assert(Registry.read(spark, dir).entries.isEmpty)
    // the next write discards the torn file and commits cleanly
    Registry.register(spark, dir, "v2", "p2")
    assert(Registry.read(spark, dir).entries.map(_.version) === Seq("v2"))
  }

  test("promote of an unknown version fails loudly and mutates nothing") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1.0", "p1", stage = "production")
    intercept[IllegalArgumentException] {
      Registry.promote(spark, dir, "ghost")
    }
    assert(Registry.read(spark, dir).production.map(_.version) === Some("v1.0"))
  }

  test("random register/promote/rollback sequences: the manifest equals " +
      "an in-memory state machine after every transition; at most one " +
      "production version always") {
    val versions = Seq("v1", "v2", "v3", "v4")
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val dir = freshDir()
      // reference state machine: version -> stage
      val ref = scala.collection.mutable.LinkedHashMap[String, String]()
      (0 until 12).foreach { _ =>
        val v = versions(rnd.nextInt(versions.size))
        rnd.nextInt(3) match {
          case 0 =>
            Registry.register(spark, dir, v, s"art/$v")
            ref(v) = "development"
          case _ if !ref.contains(v) =>
            // promote/rollback of an unregistered version fails loudly
            // and mutates nothing
            intercept[IllegalArgumentException] {
              Registry.promote(spark, dir, v)
            }
          case _ =>
            Registry.promote(spark, dir, v)
            ref.keys.foreach(k =>
              if (ref(k) == "production") ref(k) = "archived")
            ref(v) = "production"
        }
        val m = Registry.read(spark, dir)
        assert(m.entries.map(e => e.version -> e.stage).toMap === ref.toMap)
        assert(m.entries.count(_.stage == "production") <= 1)
        assert(m.production.map(_.version) ===
          ref.find(_._2 == "production").map(_._1))
      }
    }
  }

  test("re-register replaces the entry; artifact paths round-trip " +
      "through the manifest") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1.0", "old/path")
    Registry.register(spark, dir, "v1.0", "new/path", stage = "staging")
    val m = Registry.read(spark, dir)
    assert(m.entries.size === 1)
    assert(m("v1.0") === Registry.Entry("v1.0", "staging", "new/path"))
  }

  test("a stage outside the lifecycle enum is rejected at register " +
      "(a typo would silently skip incumbent demotion and every lookup)") {
    val dir = freshDir()
    Registry.register(spark, dir, "v1", "p1")
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "v2", "p2", stage = "Production")
    }
    intercept[IllegalArgumentException] {
      Registry.register(spark, dir, "v2", "p2", stage = "prod")
    }
    assert(Registry.read(spark, dir).entries.map(_.version) === Seq("v1"))
  }
}
