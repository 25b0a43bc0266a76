package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.physical._

/** Sweep over the smaller API surfaces not covered by the dedicated specs. */
class MiscSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  test("Read.json and Read.orc round-trip") {
    implicit val s = spark
    val df = Seq((1, "a"), (2, "b")).toDF("i", "v")
    val jd = tmpDir("json"); val od = tmpDir("orc")
    df.write.mode("overwrite").json(jd)
    df.write.mode("overwrite").orc(od)
    assert(Read.json(jd).get.count() == 2)
    assert(Read.orc(od).get.orderBy("i").select("v").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("Text.trim_ trims a string column in place") {
    val df = Seq("  padded  ").toDF("t")
    assert(Text.trim_(df, "t").get.select("t").as[String].head() == "padded")
  }

  test("Wnd wrappers: lag, rowNumber, running, sliding") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0))
      .toDF("k", "seq", "v")
    val lagged = Wnd.lag_(df, "v", 1, Seq("k"), Seq("seq")).get
      .filter($"k" === "a" && $"seq" === 2).select("lag").as[Double].head()
    assert(lagged == 10.0)
    val rn = Wnd.rowNumber(df, Seq("k"), Seq("seq")).get
      .filter($"k" === "a" && $"seq" === 3).select("row_number").as[Int].head()
    assert(rn == 3)
    val run = Wnd.running(df, sum($"v"), Seq("k"), Seq("seq"), "rsum").get
      .filter($"k" === "a" && $"seq" === 3).select("rsum").as[Double].head()
    assert(run == 60.0)
    val slide = Wnd.sliding(df, sum($"v"), Seq("k"), Seq("seq"), -1, 0, "ssum").get
      .filter($"k" === "a" && $"seq" === 3).select("ssum").as[Double].head()
    assert(slide == 50.0)
  }

  test("Debugger renders pipeline and model structure") {
    import graft.model.{Debugger, Preset}
    val pipe = Preset.linearReg(label = "v")
    assert(Debugger.pipelineToString(pipe).contains("LinearRegression"))
    val train = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("d", "v")
    val spec = graft.evaluation.SupervisedModelDesign("prediction", "v", pipe)
      .toSpecimen(graft.evaluation.Feature("d"), train)
    val rendered = Debugger.modelToString(spec.model)
    assert(rendered.contains("VectorAssembler") && rendered.contains("LinearRegressionModel"))
  }

  test("GraftSession.builder applies the scale configuration") {
    // the shared test session already exists; builder must at least
    // produce a session with the expected confs when reused
    val s = graft.GraftSession.builder(master = Some("local[2]"), shufflePartitions = 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.parquet.compression.codec") == "zstd")
  }

  test("streaming file sink writes append-mode output that reads back") {
    implicit val s = spark
    import graft.streaming.Stream
    val src = tmpDir("sink_src"); val out = tmpDir("sink_out")
    val chk = tmpDir("sink_chk")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = Read.fileStream(src, "parquet", schema).get
    val q = Stream.startFileSink(stream, "parquet", out, chk).get
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("Write.csv honors delimiter and partitioning options") {
    implicit val s = spark
    val df = Seq((1, "r1"), (2, "r2")).toDF("i", "v")
    val out = tmpDir("csvopt") + "/out"
    Write.csv(df, out, NoPartition, delimiter = ";", overwrite = true).get
    val lines = spark.read.text(out).as[String].collect()
    assert(lines.exists(_.contains("1;r1")))
    // NoPartition ⇒ single data file
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".csv")) == 1)
  }
}
