package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, ts(5)), (2L, 10L, ts(15)), (3L, 10L, ts(30)),
      (4L, 20L, ts(10)),                      // key with no prior right
      (5L, 10L, ts(20))                       // equal-ts match (>= semantics)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(4), 1.0), (10L, ts(12), 2.0), (10L, ts(20), 3.0),
      (20L, ts(50), 9.0)                      // only AFTER left's row
    ).toDF("user_id", "ts", "value")
    val got = AsofJoin.asofJoin(left, right, "user_id", "ts", Seq("value"), "event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(
      1L -> Some(1.0),  // ts 5 → right ts 4
      2L -> Some(2.0),  // ts 15 → right ts 12
      3L -> Some(3.0),  // ts 30 → right ts 20
      4L -> None,       // no right row at or before
      5L -> Some(3.0))) // ts 20 matches right AT 20 (>=)
  }

  test("rangeJoinBands buckets values with [lo, hi) boundaries") {
    val bands = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0)).toDF("band", "band_lo", "band_hi")
    val df = Seq(0.0, 9.99, 10.0, 19.99).toDF("v")
    val got = AsofJoin.rangeJoinBands(df, org.apache.spark.sql.functions.col("v"), bands)
      .collect().map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((0.0, "a"), (9.99, "a"), (10.0, "b"), (19.99, "b")))
  }

  test("upsert: updates win by key, untouched rows survive") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val got = Upsert.upsert(target, updates, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }
}
