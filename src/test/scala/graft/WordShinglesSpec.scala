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
