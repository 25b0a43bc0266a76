package graft.physical

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Offline exercise of the Avro payload codec behind `Read.kafka` /
  * `Write.kafka` (the reference only drives it through a dockerised
  * broker — `thundercats` run-test.sh + AllTest.scala:102-205). The
  * encode/decode pair needs no broker: it is a column transform, so an
  * in-memory frame round-trips it. spark-avro is an OPTIONAL module
  * resolved reflectively (IO.scala decodePayload/encodePayload); when the
  * jar is absent (this sandbox's /opt/spark/jars carries only avro-core,
  * not spark-avro) the spec asserts the graceful-failure contract
  * instead, so the gap is a checked reason, not silence. */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"msg","fields":[
       {"name":"id","type":"long"},{"name":"body","type":"string"}]}"""

  test("Avro payload round-trip (or checked graceful failure without spark-avro)") {
    // Spark 4 always carries a to_avro/from_avro STUB (RuntimeReplaceable)
    // that raises AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at analysis when
    // the spark-avro module jar is absent — so availability can only be
    // probed by building the plan, not by Class.forName.
    val rows = Seq((1L, "alpha"), (2L, "beta"))
    val df = rows.toDF("id", "body")
    try {
      val encoded = Write.encodePayload(df, ColumnEncoder.Avro(schemaJson))
      assert(encoded.columns.toSeq == Seq("value"))
      val decoded = Read.decodePayload(encoded, ColumnEncoder.Avro(schemaJson))
      val out = decoded.select(col("value.id"), col("value.body"))
        .as[(Long, String)].collect().toSet
      assert(out == rows.toSet)
    } catch {
      // the graceful-Fail contract: without the module the codec surfaces
      // Spark's explicit error (kafka callers wrap it in MayFail -> Fail);
      // bytes are NEVER silently passed through undecoded
      case e: org.apache.spark.sql.AnalysisException =>
        assert(e.getCondition == "AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE",
          s"unexpected analysis error: ${e.getMessage}")
        info("spark-avro module absent: codec fails with Spark's " +
          "AVRO_NOT_LOADED error — checked graceful-failure path")
    }
  }

  test("ColumnEncoder.None is an exact pass-through on both sides") {
    val df = Seq((1L, "x")).toDF("id", "body")
    assert(Read.decodePayload(df, ColumnEncoder.None) eq df)
    assert(Write.encodePayload(df, ColumnEncoder.None) eq df)
  }
}
