package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      ("the cat is on the mat and it was good", "en"),
      ("der Hund ist nicht mit der Katze auf dem Sofa", "de"),
      ("el perro y la casa de los gatos es una cosa", "es"),
      ("le chien et les chats sont dans une maison", "fr"),
      ("zzz qqq xxx", "unknown")
    ).toDF("text", "want")
    val bad = df.filter(TextAnalysis.langId(col("text")) =!= col("want"))
    bad.count() shouldBe 0L
  }

  test("token counts: whitespace vs BPE-ish subwords") {
    val r = Seq("hello world, internationalization 42!")
      .toDF("text")
      .select(TextAnalysis.tokenCount(col("text")),
        TextAnalysis.subwordCount(col("text"))).head()
    r.getInt(0) shouldBe 4
    // hell|o wor|ld , inte|rnat|iona|liza|tion 42 ! → 12
    r.getInt(1) shouldBe 12
  }

  test("quality score components in [0,1], quarters only") {
    val scores = TextAnalysis.analyze(
      spark.read.parquet(s"$sf0001/documents.parquet"), "text")
      .select("quality").collect().map(_.getDouble(0))
    all(scores) should (be >= 0.0 and be <= 1.0)
    scores.foreach(s => (s * 4).isWhole shouldBe true)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val r = Seq(("A  B\tc", "a b c", "a b d")).toDF("x", "y", "z")
      .select(TextAnalysis.fingerprint(col("x")),
        TextAnalysis.fingerprint(col("y")),
        TextAnalysis.fingerprint(col("z"))).head()
    r.getString(0) shouldBe r.getString(1)
    r.getString(0) should not be r.getString(2)
  }
}
