package graft

import org.apache.spark.sql.{SQLImplicits, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local SparkSession (lazy,
  * process-wide via getOrCreate) keeps test startup cost O(1).
  * Routed through Engine.session so tests run with the engine's real
  * config (UTC, AQE, nanosAsLong, GraftExtensions functions). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session("graft-test", "local[4]")
  protected lazy val testImplicits: SQLImplicits = spark.implicits
  val sf: String = "/root/testdata/sf0.001"
}
