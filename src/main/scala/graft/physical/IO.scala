package graft.physical

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.functional.{Fail, MayFail, Ok}

/** Partitioning directive for file sinks.
  *
  * Mirrors the reference's sink partition switch (reference
  * `thundercats/src/main/scala/com/tao/thundercats/physical/IO.scala:189-198`):
  * no partitioning coalesces to a single output file; column partitioning
  * maps to `DataFrameWriter.partitionBy`.
  *
  * Scale note: `NoPartition` (single-file output) serializes the write
  * through one task — fine for small exports, wrong for TB-scale output.
  * Use `DefaultPartition` (keep upstream parallelism) or `PartitionCol`
  * for production-size sinks.
  */
sealed trait Partition
case object DefaultPartition extends Partition
case object NoPartition extends Partition
final case class PartitionCol(cols: Seq[String]) extends Partition

/** Console display modes (reference IO.scala:24-32). */
sealed trait Show
object Show {
  case object Default extends Show
  case object Truncate extends Show
  final case class Max(n: Int) extends Show
  /** Replace array/struct columns with a type placeholder before display
    * (reference IO.scala:34-54). */
  case object HideComplex extends Show
}

/** Column payload encoding for message-bus sources/sinks
  * (reference IO.scala 136-142, 240-246: plain string vs Avro). */
sealed trait ColumnEncoder
object ColumnEncoder {
  case object None extends ColumnEncoder
  final case class Avro(jsonSchema: String) extends ColumnEncoder
}

/** Batch + streaming sources. Every op returns `MayFail[DataFrame]` so
  * pipelines compose in `for` comprehensions. */
object Read {

  /** CSV scan with schema inference (reference IO.scala:89-102 always
    * infers). Header and delimiter are options.
    *
    * Scale note: `inferSchema` costs an extra pass over the input; for
    * 100 TB inputs callers should pass an explicit schema.
    */
  def csv(
      path: String,
      withHeader: Boolean = true,
      delimiter: String = ",",
      schema: Option[StructType] = None
  )(implicit spark: SparkSession): MayFail[DataFrame] = MayFail {
    val base = spark.read
      .option("header", withHeader.toString)
      .option("delimiter", delimiter)
    val reader = schema match {
      case Some(s) => base.schema(s)
      case None    => base.option("inferSchema", "true")
    }
    reader.csv(path)
  }

  def parquet(path: String)(implicit spark: SparkSession): MayFail[DataFrame] =
    MayFail(spark.read.parquet(path))

  def json(path: String)(implicit spark: SparkSession): MayFail[DataFrame] =
    MayFail(spark.read.json(path))

  def orc(path: String)(implicit spark: SparkSession): MayFail[DataFrame] =
    MayFail(spark.read.orc(path))

  /** Batch Kafka scan; key/value cast to STRING, optional Avro decode
    * (reference IO.scala:146-166). Requires the spark-sql-kafka connector
    * jar on the classpath; fails gracefully (as a `Fail`) when absent,
    * which is the offline-CI posture for this environment. */
  def kafka(
      topic: String,
      serverAddr: String,
      port: Int = 9092,
      colEncoder: ColumnEncoder = ColumnEncoder.None
  )(implicit spark: SparkSession): MayFail[DataFrame] = MayFail {
    val df = spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", s"$serverAddr:$port")
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    decodePayload(df, colEncoder)
  }

  /** Streaming Kafka source, `startingOffsets=earliest` default
    * (reference IO.scala:116-144). Gated like [[kafka]]. */
  def kafkaStream(
      topic: String,
      serverAddr: String,
      port: Int = 9092,
      offset: String = "earliest",
      colEncoder: ColumnEncoder = ColumnEncoder.None
  )(implicit spark: SparkSession): MayFail[DataFrame] = MayFail {
    val df = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", s"$serverAddr:$port")
      .option("subscribe", topic)
      .option("startingOffsets", offset)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    decodePayload(df, colEncoder)
  }

  /** Streaming file source (parquet/csv/orc/json) — the offline-testable
    * stream entry point; pair with `Write.streamToFile` or a memory sink. */
  def fileStream(
      path: String,
      fileType: String,
      schema: StructType
  )(implicit spark: SparkSession): MayFail[DataFrame] =
    MayFail(spark.readStream.schema(schema).format(fileType).load(path))

  /** MongoDB collection scan (reference IO.scala:168-173; connector 10.x
    * format name `"mongodb"`). Gated: `Fail` without the connector jar. */
  def mongo(serverAddr: String, db: String, collection: String)(implicit
      spark: SparkSession
  ): MayFail[DataFrame] = MayFail {
    spark.read
      .format("mongodb")
      .option("spark.mongodb.read.connection.uri", s"mongodb://$serverAddr/$db.$collection")
      .load()
  }

  /** DynamoDB scan. The reference's implementation is known-broken and its
    * test permanently ignored (reference `physical/amazon.scala:16-20`,
    * `AllTest.scala:180-191`); a graceful `Fail` is full parity. */
  def dynamo(region: String, serverAddr: String, table: String)(implicit
      spark: SparkSession
  ): MayFail[DataFrame] =
    Fail(new UnsupportedOperationException(
      s"DynamoDB source is unsupported (region=$region, table=$table); " +
        "the reference implementation is broken upstream"))

  private[physical] def decodePayload(df: DataFrame, enc: ColumnEncoder): DataFrame =
    enc match {
      case ColumnEncoder.None => df
      case ColumnEncoder.Avro(schema) =>
        // spark-avro's from_avro; resolved reflectively so the core
        // library does not hard-depend on the optional module jar.
        val avro = Class.forName("org.apache.spark.sql.avro.functions$")
        val mod = avro.getField("MODULE$").get(null)
        val m = avro.getMethod("from_avro", classOf[org.apache.spark.sql.Column], classOf[String])
        val decoded = m.invoke(mod, col("value"), schema).asInstanceOf[org.apache.spark.sql.Column]
        df.withColumn("value", decoded)
    }
}

/** Batch + streaming sinks. */
object Write {

  private def writer(df: DataFrame, partition: Partition, overwrite: Boolean) = {
    val base = partition match {
      case NoPartition         => df.coalesce(1).write
      case DefaultPartition    => df.write
      case PartitionCol(cols)  => df.write.partitionBy(cols: _*)
    }
    if (overwrite) base.mode(SaveMode.Overwrite) else base
  }

  /** CSV sink; header always on (reference IO.scala:200-215). Returns the
    * input frame so sinks compose mid-pipeline. */
  def csv(
      df: DataFrame,
      path: String,
      partition: Partition = NoPartition,
      delimiter: String = ",",
      overwrite: Boolean = false
  ): MayFail[DataFrame] = MayFail {
    writer(df, partition, overwrite)
      .option("header", "true")
      .option("delimiter", delimiter)
      .csv(path)
    df
  }

  def parquet(
      df: DataFrame,
      path: String,
      partition: Partition = NoPartition,
      overwrite: Boolean = false,
      options: Map[String, String] = Map.empty
  ): MayFail[DataFrame] = MayFail {
    writer(df, partition, overwrite).options(options).parquet(path)
    df
  }

  def json(
      df: DataFrame,
      path: String,
      partition: Partition = NoPartition,
      overwrite: Boolean = false,
      options: Map[String, String] = Map.empty
  ): MayFail[DataFrame] = MayFail {
    writer(df, partition, overwrite).options(options).json(path)
    df
  }

  def orc(
      df: DataFrame,
      path: String,
      partition: Partition = NoPartition,
      overwrite: Boolean = false,
      options: Map[String, String] = Map.empty
  ): MayFail[DataFrame] = MayFail {
    writer(df, partition, overwrite).options(options).orc(path)
    df
  }

  /** Bucketed + sorted managed table: co-locates rows by key so
    * equi-joins/aggs between tables bucketed the same way skip their
    * shuffle entirely — the pre-partitioning story for repeatedly joined
    * 100 TB fact tables. (File-path writes cannot carry bucket metadata;
    * this goes through the catalog.) */
  def bucketedTable(
      df: DataFrame,
      table: String,
      bucketBy: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Nil,
      overwrite: Boolean = false
  ): MayFail[DataFrame] = MayFail {
    val base = df.write.format("parquet")
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    val sorted =
      if (sortBy.isEmpty) base else base.sortBy(sortBy.head, sortBy.tail: _*)
    (if (overwrite) sorted.mode(SaveMode.Overwrite) else sorted).saveAsTable(table)
    df
  }

  /** Batch Kafka sink (reference IO.scala:265-287). Gated like `Read.kafka`. */
  def kafka(
      df: DataFrame,
      topic: String,
      serverAddr: String,
      port: Int = 9092,
      colEncoder: ColumnEncoder = ColumnEncoder.None
  ): MayFail[DataFrame] = MayFail {
    val payload = encodePayload(df, colEncoder)
    payload.write
      .format("kafka")
      .option("kafka.bootstrap.servers", s"$serverAddr:$port")
      .option("topic", topic)
      .save()
    df
  }

  /** Streaming Kafka sink, append mode, explicit checkpoint
    * (reference IO.scala:229-263). Blocks until `terminationTimeout`. */
  def kafkaStream(
      df: DataFrame,
      topic: String,
      serverAddr: String,
      port: Int = 9092,
      colEncoder: ColumnEncoder = ColumnEncoder.None,
      checkpointLocation: String = "./chk",
      terminationTimeout: Option[Long] = None
  ): MayFail[DataFrame] = MayFail {
    val q = encodePayload(df, colEncoder).writeStream
      .format("kafka")
      .outputMode("append")
      .option("kafka.bootstrap.servers", s"$serverAddr:$port")
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .start()
    terminationTimeout.fold(q.awaitTermination())(t => { q.awaitTermination(t); () })
    df
  }

  /** Streaming file sink (parquet/csv/orc/json), append mode
    * (reference IO.scala:289-322 — which honours only the first partition
    * column; we honour all of them, documented deviation). */
  def streamToFile(
      df: DataFrame,
      fileType: String,
      path: String,
      partition: Partition = DefaultPartition,
      checkpointLocation: String = "./chk",
      timeout: Option[Long] = None
  ): MayFail[DataFrame] = MayFail {
    val base = df.writeStream
      .format(fileType)
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpointLocation)
    val q = (partition match {
      case PartitionCol(cols) => base.partitionBy(cols: _*)
      case _                  => base
    }).start()
    timeout.fold(q.awaitTermination())(t => { q.awaitTermination(t); () })
    df
  }

  def mongo(df: DataFrame, serverAddr: String, db: String, collection: String): MayFail[DataFrame] =
    MayFail {
      df.write
        .format("mongodb")
        .mode(SaveMode.Append)
        .option("spark.mongodb.write.connection.uri", s"mongodb://$serverAddr/$db.$collection")
        .save()
      df
    }

  /** Unimplemented in the reference (IO.scala:336-338); `Fail` is parity. */
  def dynamo(df: DataFrame, region: String, table: String): MayFail[DataFrame] =
    Fail(new UnsupportedOperationException("DynamoDB sink is not implemented"))

  private[physical] def encodePayload(df: DataFrame, enc: ColumnEncoder): DataFrame =
    enc match {
      case ColumnEncoder.None => df
      case ColumnEncoder.Avro(_) =>
        val avro = Class.forName("org.apache.spark.sql.avro.functions$")
        val mod = avro.getField("MODULE$").get(null)
        val m = avro.getMethod("to_avro", classOf[org.apache.spark.sql.Column])
        val encoded = m.invoke(mod, struct(df.columns.map(col).toSeq: _*))
          .asInstanceOf[org.apache.spark.sql.Column]
        df.select(encoded.as("value"))
    }
}

/** Console sinks (reference IO.scala:56-84). */
object Screen {

  def showDF(
      df: DataFrame,
      title: Option[String] = None,
      showOpt: Show = Show.Truncate
  ): MayFail[DataFrame] = MayFail {
    title.foreach(t => println(s"=== $t ==="))
    showOpt match {
      case Show.Default      => df.show(20, truncate = false)
      case Show.Truncate     => df.show(20, truncate = true)
      case Show.Max(n)       => df.show(n, truncate = false)
      case Show.HideComplex  => hideComplex(df).show(20, truncate = false)
    }
    df
  }

  /** Replace array/struct columns with a `<type>` placeholder so wide
    * nested frames stay readable (reference IO.scala:34-54). */
  private[physical] def hideComplex(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: ArrayType | _: StructType =>
          acc.withColumn(f.name, lit(s"<${f.dataType.simpleString}>"))
        case _ => acc
      }
    }

  def showDFStream(df: DataFrame, title: Option[String] = None): MayFail[DataFrame] =
    MayFail {
      title.foreach(t => println(s"=== $t ==="))
      val q = df.writeStream.outputMode("append").format("console").start()
      try q.awaitTermination(50)
      finally q.stop() // a peek, not a sink — don't leak a live query
      df
    }

  def showSchema(df: DataFrame): MayFail[DataFrame] = MayFail {
    df.printSchema()
    df
  }
}
