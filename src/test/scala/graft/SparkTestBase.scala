package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (sessions are
  * expensive; specs only read).
  */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.build(master = "local[4]", appName = "graft-test")
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}
