package graft

import org.apache.spark.sql.functions._

/** The native NormalizeText / TokenClassCounts kernels must be
  * bit-identical to the composed regex forms they replaced (the DuckDB
  * oracles were written against those contracts), including non-ASCII
  * fallback rows and whitespace/punctuation edges. */
class NormalizeTextSpec extends SparkSpec {

  private def composedNorm(text: org.apache.spark.sql.Column) =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  test("native normalize == regex chain across the documents fixture") {
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.NormalizeText(col("text")).as("a"),
        composedNorm(col("text")).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() === 0)
  }

  test("native normalize == regex chain on adversarial rows") {
    import spark.implicits._
    val rows: Seq[Option[String]] = Seq(
      Some(""), None, Some("   "), Some("\t\n\f\r"),
      Some("Hello, World!  42x"), Some("--a--b--"), Some("a"),
      Some("...!!!"), Some("MiXeD CaSe 007"),
      Some("café touché"),           // non-ASCII fallback path
      Some("Kelvin"),                      // U+212A lowercases to ASCII k
      Some("emoji 😀 tail"),          // astral code point
      Some("nbsp joined"),                 // U+00A0 is NOT Java \s
      Some("ends with punct."), Some(".starts with punct"))
    val df = rows.toDF("t").select(
      graft.functions.NormalizeText(col("t")).as("a"),
      composedNorm(col("t")).as("b"))
    val bad = df.filter(not(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  private def regexCounts(text: org.apache.spark.sql.Column) = Seq(
    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", "[A-Za-z]+", "[0-9]+",
    "[^A-Za-z0-9\\s]").map(p =>
    size(regexp_extract_all(text, lit(p), lit(0))).cast("long"))

  test("native token class counts == four-regex form across the fixture") {
    val Seq(bpe, word, num, other) = regexCounts(col("text"))
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.TokenClassCounts(col("text")).as("tc"),
        bpe.as("bpe"), word.as("word"), num.as("num"), other.as("other"))
    assert(df.filter(
      not(col("tc.n_bpe_tokens") <=> col("bpe")) ||
      not(col("tc.n_word_tokens") <=> col("word")) ||
      not(col("tc.n_number_tokens") <=> col("num")) ||
      not(col("tc.n_other_tokens") <=> col("other"))).count() === 0)
  }

  test("native token class counts == four-regex form on adversarial rows") {
    import spark.implicits._
    val rows: Seq[Option[String]] = Seq(
      Some(""), None, Some("abc123def"), Some("a1b2c3"),
      Some("Hello, World! 42"), Some("...!!!"), Some("\t \n"),
      Some("café touché"), Some("emoji 😀 42"),
      Some("nbsp x"), Some("a-b_c.d"), Some("2026-08-14T00:00:00Z"))
    val Seq(bpe, word, num, other) = regexCounts(col("t"))
    val df = rows.toDF("t").select(
      graft.functions.TokenClassCounts(col("t")).as("tc"),
      bpe.as("bpe"), word.as("word"), num.as("num"), other.as("other"))
    val bad = df.filter(
      not(col("tc.n_bpe_tokens") <=> col("bpe")) ||
      not(col("tc.n_word_tokens") <=> col("word")) ||
      not(col("tc.n_number_tokens") <=> col("num")) ||
      not(col("tc.n_other_tokens") <=> col("other"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("both kernels run inside whole-stage codegen") {
    val df = graft.sources.Tables.documents(spark, sfDir).select(
      graft.functions.NormalizeText(col("text")).as("n"),
      graft.functions.TokenClassCounts(col("text")).as("tc"))
    val hasWsc = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
      case _ => false
    }
    assert(hasWsc,
      s"expected codegen'd project, got:\n${df.queryExecution.executedPlan}")
  }
}
