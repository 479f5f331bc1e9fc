package graft

import java.sql.Timestamp
import graft.ops.AsofJoin

/** As-of join edge semantics: equal timestamps match (<=), earlier-only
  * rows get the latest prior value, rows before any right row get NULL,
  * and keys never cross. */
class AsofJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof picks latest right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "a"), // before any right row -> null
      (1L, t("2024-01-01 11:00:00"), "b"), // equal ts -> matches 11:00 right
      (1L, t("2024-01-01 12:30:00"), "c"), // between -> 12:00 right
      (2L, t("2024-01-01 23:00:00"), "d")  // other key: only key-2 rights
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 11:00:00"), 10.0),
      (1L, t("2024-01-01 12:00:00"), 20.0),
      (2L, t("2024-01-01 09:00:00"), 99.0)
    ).toDF("user_id", "ts", "price")

    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("price"))
      .select($"tag", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("a") === None)
    assert(out("b") === Some(10.0))
    assert(out("c") === Some(20.0))
    assert(out("d") === Some(99.0))
  }

  test("all asof values come from the SAME right row (no torn back-fill)") {
    import spark.implicits._
    // the newest right row has price=NULL: per-column carry would take
    // qty from it but back-fill price from the OLDER row — a torn result
    val left = Seq((1L, t("2024-01-01 13:00:00"), "x"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 11:00:00"), Some(10.0), Some(100L)),
      (1L, t("2024-01-01 12:00:00"), None: Option[Double], Some(200L))
    ).toDF("user_id", "ts", "price", "qty")
    val row = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("price", "qty"))
      .select($"asof_price", $"asof_qty")
      .as[(Option[Double], Option[Long])].collect().head
    assert(row === (None, Some(200L))) // both from the 12:00 row, atomically
  }

  test("tolerance gates the matched row (merge_asof semantics, no older fallback)") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 12:00:00"), "in"),     // match 30 min old: inside 1h
      (1L, t("2024-01-01 14:00:00"), "out"),    // match 2.5 h old: outside
      (2L, t("2024-01-01 12:00:00"), "edge"),   // match exactly 1h old: inside (<=)
      (3L, t("2024-01-01 12:00:00"), "none")    // no right row at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 11:30:00"), 10.0),
      // user 1 also has an OLD in-window-for-nobody row: tolerance must
      // NOT fall back to it for the 14:00 click (the 11:30 row is the
      // as-of match and it is out of window -> NULL)
      (1L, t("2024-01-01 09:00:00"), 77.0),
      (2L, t("2024-01-01 11:00:00"), 20.0)
    ).toDF("user_id", "ts", "price")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("price"), tolerance = Some(3600L * 1000000L))
      .select($"tag", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("in") === Some(10.0))
    assert(out("out") === None)
    assert(out("edge") === Some(20.0))
    assert(out("none") === None)
    // and tolerance = None keeps the original unbounded behavior
    val unbounded = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("price"))
      .select($"tag", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(unbounded("out") === Some(10.0))
  }
}
