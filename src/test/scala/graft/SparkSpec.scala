package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (small core count — specs use tiny
  * literal frames; parallelism is tested at bench scale, not here). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // keep session for other suites
}

/** Deterministic ScalaCheck case driver shared by the *PropsSpec
  * suites: n generator draws from fixed per-index seeds (reproducible
  * across runs and suites; a failed draw is dropped rather than
  * retried, so keep generators total). */
trait PropsCases {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed
  protected def seedBase: Long = 42L
  protected def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seedBase + i)))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
