package graft

import org.apache.spark.sql.functions._

/** The native WordShingles expression must be bit-identical to the HOF
  * form it replaced (the DuckDB oracles were written against that
  * contract), including the empty/short/null edges. */
class WordShinglesSpec extends SparkSpec {

  test("native shingles == HOF form across the documents fixture") {
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    val hof = when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => array_join(slice(toks, i, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.WordShingles(toks, 3).as("a"), hof.as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() === 0)
  }

  test("native rolling hash == per-character HOF fold across the fixture") {
    val text = col("text")
    val hof = aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.RollingHash(text).as("a"), hof.as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() === 0)
    // null propagates, empty string hashes to 0
    import spark.implicits._
    val edge = Seq(Some(""), None, Some("a")).toDF("t")
      .select(graft.functions.RollingHash(col("t")).as("h"))
      .as[Option[Long]].collect()
    assert(edge(0) === Some(0L))
    assert(edge(1) === None)
    assert(edge(2) === Some('a'.toLong))
  }

  test("edge contract: short, exact-width, null, and empty token arrays") {
    import spark.implicits._
    val df = Seq(
      Some(Seq("a", "b")),
      Some(Seq("a", "b", "c")),
      Some(Seq("a", "b", "c", "d")),
      None,
      Some(Seq.empty[String])).toDF("toks")
    val got = df.select(graft.functions.WordShingles(col("toks"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq.empty)
    assert(got(1) === Seq("a b c"))
    assert(got(2) === Seq("a b c", "b c d"))
    assert(got(3) === Seq.empty)
    assert(got(4) === Seq.empty)
  }
}
