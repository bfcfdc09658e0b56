package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regression pin for the iterative-checkpoint stats explosion: bare
  * `localCheckpoint` carries `originStats` whose sizeInBytes compounds
  * multiplicatively across generations (join estimate = product of
  * children, unknown leaf = Long.MaxValue), eventually livelocking the
  * planner inside BigInteger arithmetic — observed in the g22 SCC trim
  * loop. [[Lineage.checkpoint]] clamps per generation. */
class LineageSpec extends SparkSpec {

  private def sizeBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  /** One "iteration": a self-join shaped like the label-propagation
    * loops (each generation's estimate = product over the previous). */
  private def step(df: DataFrame): DataFrame = {
    val other = df.select(col("id").as("jid"), col("v").as("jv"))
    df.join(other, df("v") === other("jid"))
      .select(df("id"), least(df("v"), col("jv")).as("v"))
  }

  test("bare localCheckpoint compounds carried stats geometrically") {
    import spark.implicits._
    var df: DataFrame = Seq((1L, 1L), (2L, 1L)).toDF("id", "v")
      .localCheckpoint(true)
    val bits0 = sizeBits(df)
    for (_ <- 1 to 6) df = step(df).localCheckpoint(true)
    // 6 generations is safe to plan but already shows the explosion
    assert(sizeBits(df) > 4 * bits0,
      s"expected compounding growth, got ${sizeBits(df)} bits vs $bits0")
  }

  test("Lineage.checkpoint keeps carried stats bounded over many generations") {
    import spark.implicits._
    var df: DataFrame = Lineage.checkpoint(
      Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "v"), eager = true)
    for (i <- 1 to 25) {
      df = Lineage.checkpoint(step(df), eager = true)
      assert(sizeBits(df) <= 64, s"generation $i carried ${sizeBits(df)} bits")
    }
    // and the data survived the round-trips untouched
    assert(df.count() == 3)
    assert(df.orderBy("id").collect().map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
  }

  test("clamp is a no-op on frames with in-bounds stats") {
    import spark.implicits._
    val small = Seq(1L, 2L).toDF("id").localCheckpoint(true)
    // already within bounds: the helper must return the same plan object
    val wrapped = Lineage.checkpoint(small, eager = true)
    assert(sizeBits(wrapped) <= 64)
    assert(wrapped.count() == 2)
  }
}
