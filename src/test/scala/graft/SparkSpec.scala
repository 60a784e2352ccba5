package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.create(
    master = "local[4]", shufflePartitions = 4, appName = "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
