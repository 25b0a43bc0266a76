package graft.physical

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functional.{Fail, MayFail}

/** The Kafka/Mongo surfaces need connector jars this sandbox does not
  * carry — what IS testable offline, and what a user hits first, is the
  * graceful-failure contract: every connector entry point must return a
  * `Fail` carrying Spark's clear data-source error, never throw through
  * the monadic API and never return a silently-broken frame. */
class ConnectorContractSpec extends AnyFunSuite {
  implicit private lazy val spark: org.apache.spark.sql.SparkSession =
    SparkTestBase.spark
  import spark.implicits._

  private def assertGracefulFail[A](r: MayFail[A], what: String): Unit = r match {
    case Fail(e) =>
      val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
        .toLowerCase
      assert(msg.contains("kafka") || msg.contains("mongo") ||
        msg.contains("data source") || msg.contains("failed to find"),
        s"$what failed for an unexpected reason: ${e.getMessage}")
    case other => fail(s"$what must Fail without its connector jar, got $other")
  }

  test("Read.kafka / Read.kafkaStream Fail cleanly without the connector") {
    assertGracefulFail(Read.kafka("t", "localhost"), "Read.kafka")
    assertGracefulFail(Read.kafkaStream("t", "localhost"), "Read.kafkaStream")
  }

  test("Read.mongo Fails cleanly without the connector") {
    assertGracefulFail(Read.mongo("localhost", "db", "coll"), "Read.mongo")
  }

  test("Write.kafka / Write.mongo Fail cleanly without the connector") {
    val df = Seq(("k", "v")).toDF("key", "value")
    assertGracefulFail(Write.kafka(df, "t", "localhost"), "Write.kafka")
    assertGracefulFail(Write.mongo(df, "localhost", "db", "coll"), "Write.mongo")
  }

  test("Read.dynamo / Write.dynamo are the documented upstream-parity Fail stubs") {
    assert(Read.dynamo("r", "localhost", "t").isFailing)
    assert(Write.dynamo(Seq(1).toDF("a"), "r", "t").isFailing)
  }
}
