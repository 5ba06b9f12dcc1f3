package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (getOrCreate dedups). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session("local[4]", shufflePartitions = 4)
  val sfDir = "/root/testdata/sf0.001"
}
