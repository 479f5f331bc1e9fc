package graft

import graft.quality.Quality

class QualitySpec extends SparkSpec {

  test("withinTolerance edges (reference SQLValueCheckOperator semantics)") {
    // pass iff |actual - expected| <= tolerance * expected
    assert(Quality.withinTolerance(240, 240, 0.02))
    // 240 +- 4.8; exact float edges are FP-sensitive, probe just inside/out
    assert(Quality.withinTolerance(236, 240, 0.02))
    assert(Quality.withinTolerance(244, 240, 0.02))
    assert(!Quality.withinTolerance(235, 240, 0.02))   // 5 > 4.8
    assert(!Quality.withinTolerance(245, 240, 0.02))
  }

  test("countGate returns count on pass, throws on fail") {
    import spark.implicits._
    val df = (1 to 100).toDF("n")
    assert(Quality.countGate(df, 100, 0.0) === 100)
    assert(Quality.countGate(df, 98, 0.03) === 100)
    val e = intercept[Quality.QualityCheckFailure] {
      Quality.countGate(df, 90, 0.02)
    }
    assert(e.actual === 100.0)
  }
}
