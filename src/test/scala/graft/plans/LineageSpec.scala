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

  /** Round-14 keep-2 generation release: rolling a loop variable must
    * bound its resident checkpoint blocks at two generations AND leave
    * results untouched (a wrongly-released generation fails loudly —
    * localCheckpoint lineage is truncated — so a green run plus the
    * block bound IS the contract). */
  test("Gen.roll bounds resident generations at two (eager chain)") {
    import spark.implicits._
    val sc = spark.sparkContext
    def trackedIds(dfs: Seq[DataFrame]): Set[Int] = dfs.flatMap(df =>
      org.apache.spark.sql.graft.LineageStats.checkpointRdd(df).map(_.id)).toSet
    val gen = Lineage.gen()
    var df = gen.roll(Seq((1L, 5L), (2L, 3L), (3L, 7L)).toDF("id", "v"), true)
    val gens = scala.collection.mutable.ArrayBuffer(df)
    for (_ <- 1 to 6) {
      df = gen.roll(df.select(col("id"), (col("v") + 1L).as("v")), true)
      gens += df
    }
    val persisted = sc.getPersistentRDDs.keySet
    val mine = trackedIds(gens.toSeq)
    // only the last two generations' RDDs may still be persisted
    val resident = mine intersect persisted
    val lastTwo = trackedIds(gens.takeRight(2).toSeq)
    assert(resident == (lastTwo intersect persisted),
      s"stale generations resident: ${resident -- lastTwo}")
    assert(resident.size <= 2)
    // and the final generation still computes correctly
    assert(df.orderBy("id").collect().map(_.getLong(1)).toSeq == Seq(11L, 9L, 13L))
  }

  /** Round-17 truthful carried size: an EAGER checkpoint's stats are the
    * MEASURED block bytes, not the origin plan's join-product estimate.
    * This is load-bearing for loop plan shape: since SPARK-41986,
    * EnsureRequirements re-shuffles a SinglePartition join child whose
    * ESTIMATED sizeInBytes exceeds spark.sql.maxSinglePartitionBytes
    * (128 MB) — a KB-sized loop frame carrying a GB-sized estimate paid
    * two phantom Exchanges per loop join. */
  test("eager checkpoint carries measured bytes, and claimed joins stay exchange-free") {
    import spark.implicits._
    // loop-entry contract (keyedEntry): a 1-partition materialized frame
    // whose checkpoint claims SinglePartition
    var df: DataFrame = Lineage.checkpoint(
      Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "v").coalesce(1),
      eager = true)
    // several join-shaped generations: the ESTIMATE would compound into
    // the GB range (see the tests above); the measured size must stay
    // at the physical few-hundred-bytes of 3 rows
    for (_ <- 1 to 4) df = Lineage.checkpoint(step(df), eager = true)
    val carried = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(carried < BigInt(1L << 20),
      s"carried stats should be measured (KBs), got $carried bytes")
    // and a hinted equi-join of two such checkpoints plans NO shuffle:
    // both sides claim SinglePartition and the measured size is under
    // maxSinglePartitionBytes, so EnsureRequirements keeps them
    val other = Lineage.checkpoint(
      Seq((1L, 7L), (2L, 9L)).toDF("jid", "w").coalesce(1), eager = true)
    val joined = df.join(other.hint("shuffle_hash"), df("id") === other("jid"))
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("hashpartitioning"),
      s"claimed single-partition join must not re-shuffle:\n$plan")
    assert(joined.orderBy("id").collect().map(_.getLong(3)).toSeq == Seq(7L, 9L))
  }

  /** Round-17: the per-round loop-gate count rides the eager
    * checkpoint's own materialization as an observed metric instead of
    * a separate count() job. Correctness contract: the returned count
    * must equal what filter(pred).count() would say, and the rolled
    * frame must be intact. */
  test("Gen.rollCounted piggybacks the gate count on the materialization") {
    import spark.implicits._
    val gen = Lineage.gen()
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, true))
      .toDF("id", "flag").coalesce(1)
    val (all, nAll) = gen.rollCounted(df)
    assert(nAll == 4)
    assert(all.count() == 4)
    val (gated, nGated) = gen.rollCounted(
      all.select(col("id"), col("flag")), col("flag"))
    assert(nGated == 3, s"gated count: $nGated")
    assert(gated.count() == 4) // the FRAME is ungated; only the metric is
    // and a join-shaped generation (the AQE path) still reports exactly
    val stepped = gated.join(gated.select(col("id").as("jid")), col("id") === col("jid"))
    val (joined, nJoined) = gen.rollCounted(stepped)
    assert(nJoined == 4, s"join-shaped count: $nJoined")
    assert(joined.count() == 4)
  }

  test("Gen.roll lazy generations stay readable across the keep-2 window") {
    import spark.implicits._
    val gen = Lineage.gen()
    var df = gen.roll(Seq((1L, 10L), (2L, 4L)).toDF("id", "v"), true)
    for (_ <- 1 to 5) {
      // lazy roll + immediate materialization: the loop contract every
      // graft loop satisfies (a count or an eager descendant per round)
      df = gen.roll(df.select(col("id"), (col("v") * 2L).as("v")), false)
      assert(df.count() == 2)
    }
    assert(df.orderBy("id").collect().map(_.getLong(1)).toSeq ==
      Seq(320L, 128L))
  }
}
