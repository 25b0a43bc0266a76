package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the TF-IDF similarity path (not part of the
  * API): how much of `similarPairs` is postings re-execution vs the
  * term join itself. */
object TfIdfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup
    graft.operators.TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.95).get.count()

    time("similarPairs-current")(
      graft.operators.TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.95).get.count())

    // variant: postings materialized once (localCheckpoint) before reuse
    val w0 = graft.operators.TfIdf.postings(docs, "text", "doc_id")
    time("postings-materialize")(w0.localCheckpoint().count())
    val w = w0.localCheckpoint()
    time("sparse-on-checkpoint") {
      val norms = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nm"))
      val dots = w.select(col("term"), col("id").as("idA"), col("w").as("wa"))
        .join(w.select(col("term"), col("id").as("idB"), col("w").as("wb")), Seq("term"))
        .filter(col("idA") < col("idB"))
        .groupBy("idA", "idB")
        .agg(sum(col("wa") * col("wb")).as("dot"))
      dots
        .join(norms.select(col("id").as("idA"), col("nm").as("na")), Seq("idA"))
        .join(norms.select(col("id").as("idB"), col("nm").as("nb")), Seq("idB"))
        .withColumn("cosine", col("dot") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.95).count()
    }

    // dense-path stage breakdown
    {
      val w = graft.operators.TfIdf.postings(docs, "text", "doc_id")
      val nTerms = w.select("term").distinct().count().toInt
      import org.apache.spark.sql.expressions.Window
      val vocab = w.select("term").distinct()
        .withColumn("__ti",
          row_number().over(Window.partitionBy(lit(0)).orderBy("term")).cast("int") - 1)
      val vecs = w.join(broadcast(vocab), Seq("term"))
        .groupBy("id")
        .agg(map_from_entries(collect_list(struct(col("__ti"), col("w")))).as("__m"))
        .select(col("id"),
          transform(sequence(lit(0), lit(nTerms - 1)),
            i => coalesce(try_element_at(col("__m"), i), lit(0.0))).as("__v"))
      val unit = vecs
        .withColumn("__nm", sqrt(aggregate(col("__v"), lit(0.0), (a, x) => a + x * x)))
        .filter(col("__nm") > 0)
        .select(col("id"), transform(col("__v"), x => x / col("__nm")).as("__u"))
        .localCheckpoint()
      time("dense:unit-build")(unit.count())
      var t0 = System.nanoTime()
      val pruneDim = unit
        .select(posexplode(col("__u")).as(Seq("__d", "__x")))
        .groupBy("__d").agg(var_pop(col("__x")).as("__s2"))
        .orderBy(desc("__s2"), asc("__d"))
        .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)
      println(f"dense:prunedim               ${(System.nanoTime() - t0) / 1e9}%8.2f s  dim=$pruneDim")
      val delta = math.max(math.sqrt(2.0 * (1.0 - 0.95)), 1e-6)
      val keyed = unit.withColumn("__bk",
        floor(element_at(col("__u"), pruneDim + 1) / delta).cast("long"))
      val aSide = keyed.select(col("id").as("idA"), col("__u").as("__ua"), col("__bk").as("__bka"))
      val bSide = keyed.select(col("id").as("idB"), col("__u").as("__ub"),
        explode(array(col("__bk") - 1, col("__bk"), col("__bk") + 1)).as("__bkb"))
      val joined = bSide.join(broadcast(aSide),
        col("__bkb") === col("__bka") && col("idA") < col("idB"))
      time("dense:candidates")(joined.count())
      def scored = joined
        .withColumn("cosine",
          graft.functions.VectorFunctions.vecCosineDouble(col("__ua"), col("__ub")))
        .filter(col("cosine") >= 0.95)
      time("dense:join+cosine")(scored.count())
      // codegen differential: if interpreted mode costs the same, the
      // codegen path never engaged and the 6 us/pair is interpretation
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      time("dense:join+cosine-nocodegen")(scored.count())
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      time("dense:join+cosine-again")(scored.count())
    }

    // how big is the term join actually
    val tf = docs.select(col("doc_id").as("id"),
      explode(filter(split(lower(col("text")), "[ \t\n\r\f]+"), t => t =!= "")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfn"))
    println("vocab=" + dfreq.count())
    println("sum df^2 = " + dfreq.agg(sum(col("dfn") * col("dfn"))).head().get(0))
    spark.stop()
  }
}
