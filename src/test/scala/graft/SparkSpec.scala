package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared session for specs; small parallelism, same config surface as
  * GraftSession so behavior under test matches Verify/Bench. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.build("2")
}
