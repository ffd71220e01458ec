package graft

import org.apache.spark.sql.functions._
import graft.textops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("s").select(c.as("r")).collect()(0).getAs[T]("r")

  private def arr(c: org.apache.spark.sql.Column, input: String): List[String] =
    one[scala.collection.Seq[String]](c, input).toList

  test("tokenize keeps hyphen/underscore-joined tokens, lowercases, strips punctuation") {
    val got = arr(TextOps.tokenize(col("s")),
      "Need details on INC-49217 now! user_id=42; foo.bar")
    assert(got == List("need", "details", "on", "inc-49217", "now", "user_id", "42", "foo", "bar"))
  }

  test("tokenize on empty / punctuation-only input") {
    assert(arr(TextOps.tokenize(col("s")), "") == Nil)
    assert(arr(TextOps.tokenize(col("s")), "!!! ...") == Nil)
  }

  test("charNgrams: sliding 4-grams over ws-normalized lowercase") {
    val got = arr(TextOps.charNgrams(col("s"), 4), "Ab  cD")
    // normalized: "ab cd" → 4-grams: "ab c", "b cd"
    assert(got == List("ab c", "b cd"))
  }

  test("charNgrams: whole string when shorter than n; empty for empty") {
    assert(arr(TextOps.charNgrams(col("s"), 4), " ab ") == List("ab"))
    assert(arr(TextOps.charNgrams(col("s"), 4), "   ") == Nil)
    assert(arr(TextOps.charNgrams(col("s"), 4), "abcd") == List("abcd"))
  }

  test("joinTopSentences: first two sentences, trailing terminator ensured") {
    val got = one[String](TextOps.joinTopSentences(col("s")),
      "One fish. Two fish! Red fish? Blue fish.")
    assert(got == "One fish. Two fish.")
    val keep = one[String](TextOps.joinTopSentences(col("s")), "Only one sentence")
    assert(keep == "Only one sentence.")
    val excl = one[String](TextOps.joinTopSentences(col("s")), "Wow! Great. More. Stuff.")
    assert(excl == "Wow. Great.")
  }

  test("emKey: case/whitespace-insensitive normalization") {
    assert(one[String](TextOps.emKey(col("s")), "  Hello   World \n") == "hello world")
  }

  test("hasDigits") {
    assert(one[Boolean](TextOps.hasDigits(col("s")), "abc1"))
    assert(!one[Boolean](TextOps.hasDigits(col("s")), "abc"))
  }
}
