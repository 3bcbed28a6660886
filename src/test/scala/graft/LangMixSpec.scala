package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-4 extension: mixed-language detection (q124). */
class LangMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("primary/secondary stopword hits and the mixed verdict") {
    val df = Seq(
      (1L, "the cat sat on a mat with the dog"),       // pure en: 3 hits, 0 secondary
      (2L, "the house el la de que grande the casa"),  // en 2, es 4 -> es primary, mixed
      (3L, "der hund und die katze the end"),          // de 3, en 1 -> mixed (2*1 < 3? no)
      (4L, "nothing matching here")).toDF("doc_id", "text")
    val got = df.select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.langHitsPrimary(col("text")).as("p"),
        TextAnalysis.langHitsSecondary(col("text")).as("s"))
      .withColumn("mixed", col("s") > 0 && col("s") * 2 >= col("p"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq

    assert(got == Seq(
      (1L, "en", 3L, 0L, false),
      (2L, "es", 4L, 2L, true),
      (3L, "de", 3L, 1L, false),
      (4L, "und", 0L, 0L, false)))
  }
}
