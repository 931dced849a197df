package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextFunctions beyond what the x1–x6 oracles cover: the HTML strip
  * chain on real markup shapes (the oracles only see synthesized
  * fragments over plain-text docs). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(TextFunctions.stripHtml(col("h")))
      .head().getString(0)

  test("stripHtml: tags, nesting, attributes, self-closing") {
    strip("<p>Hello <b>world</b></p>") shouldBe "Hello world"
    strip("<div class='a'><span data-x=\"1\">x</span><br/>y</div>") shouldBe
      "x y"
    // tags become spaces so block boundaries keep words apart
    strip("<p>a</p><p>b</p>") shouldBe "a b"
  }

  test("stripHtml: script/style/comment bodies drop whole, " +
    "case-insensitive, across newlines") {
    strip("before<SCRIPT>\nvar a = '<p>not text</p>';\n</SCRIPT>after")
      .shouldBe("before after")
    strip("a<style media=\"x\">p { color: red }\nq::after{}</style>b")
      .shouldBe("a b")
    strip("a<!-- multi\nline\ncomment -->b") shouldBe "a b"
  }

  test("stripHtml: entity unescape once, &amp; last (HTML5 " +
    "double-escape rule)") {
    strip("1 &lt; 2 &amp;&amp; 3 &gt; 0") shouldBe "1 < 2 && 3 > 0"
    strip("&quot;q&quot; &#39;a&#39; &apos;b&apos;") shouldBe
      "\"q\" 'a' 'b'"
    // &amp;lt; is the ESCAPED text "&lt;" — must not double-unescape
    strip("x &amp;lt; y") shouldBe "x &lt; y"
    strip("a&nbsp;b") shouldBe "a b"
  }

  test("stripHtml: whitespace collapse + trim, plain text unchanged") {
    strip("  a \n\t b  ") shouldBe "a b"
    strip("no markup at all.") shouldBe "no markup at all."
    strip("") shouldBe ""
  }
}
