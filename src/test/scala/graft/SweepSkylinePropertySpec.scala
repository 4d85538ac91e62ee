package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Randomized equivalence for the two round-10 algorithmic kernels:
  * the day-clipped interval sweep vs a driver replay with exact
  * RANGE-frame peer semantics, and the filter-refine skyline vs brute
  * force — across seeds that force midnight boundaries, multi-day
  * spans, tied timestamps, duplicate points and degenerate bucketing.
  */
class SweepSkylinePropertySpec extends SparkTestBase {

  private val DayUs = 86400000000L
  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  private def tsOf(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L))

  private def checkSweep(seed: Int, n: Int, maxDurUs: Long,
      quantizeUs: Long, midnightEvery: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val ivals = (0 until n).map { i =>
      var s = baseUs + (math.abs(rng.nextLong()) % (4 * DayUs))
      if (quantizeUs > 1) s = s / quantizeUs * quantizeUs
      if (midnightEvery > 0 && i % midnightEvery == 0) s = s / DayUs * DayUs
      val e = s + 1 + (math.abs(rng.nextLong()) % maxDurUs)
      (s, e)
    }
    val got = operators.Relational.intervalSweep(
        ivals.map { case (s, e) => (tsOf(s), tsOf(e)) }.toDF("start_t", "end_t"))
      .collect()
      .map(r => ((r.getAs[String]("day"), r.getAs[Long]("hr")),
        (r.getAs[Long]("max_concurrency"), r.getAs[Long]("n_boundaries")))).toMap
    // driver replay with EXACT RANGE-frame semantics: every member of
    // a tied (t, delta) peer group carries the sum INCLUDING the group
    val pts = ivals.flatMap { case (s, e) =>
      (s / DayUs to e / DayUs).flatMap { day =>
        Seq((day, math.max(s, day * DayUs), 1), (day, math.min(e, (day + 1) * DayUs), -1))
      }
    }
    val expect = pts.groupBy(_._1).toSeq.flatMap { case (day, ps) =>
      var c = 0L
      ps.groupBy(p => (p._2, p._3)).toSeq.sortBy(_._1)
        .flatMap { case ((t, d), grp) =>
          c += d.toLong * grp.size
          grp.map(_ => (t, c))
        }
        .filter { case (t, _) => t / DayUs == day }
        .groupBy { case (t, _) => (day, (t % DayUs) / 3600000000L) }
        .map { case ((dd, hr), g) =>
          ((java.time.LocalDate.ofEpochDay(dd).toString, hr),
            (g.map(_._2).max, g.size.toLong))
        }
    }.toMap
    assert(got == expect,
      s"seed=$seed: keys ${(got.keySet -- expect.keySet).take(2)}/${(expect.keySet -- got.keySet).take(2)} " +
        s"diff=${expect.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("sweep: short intervals, microsecond times") {
    checkSweep(seed = 11, n = 300, maxDurUs = 2 * 3600000000L, quantizeUs = 1, midnightEvery = 0)
  }
  test("sweep: multi-day spans force repeated clipping") {
    checkSweep(seed = 12, n = 120, maxDurUs = 3 * DayUs, quantizeUs = 1, midnightEvery = 0)
  }
  test("sweep: second-quantized times force tied peer groups") {
    checkSweep(seed = 13, n = 400, maxDurUs = 3600000000L, quantizeUs = 60000000L, midnightEvery = 0)
  }
  test("sweep: exact-midnight starts and zero-clip artifacts") {
    checkSweep(seed = 14, n = 200, maxDurUs = DayUs, quantizeUs = 3600000000L, midnightEvery = 3)
  }

  private def checkSkyline(seed: Int, n: Int, costRange: Int, qtyRange: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val pts = (0 until n).map(i =>
      (i.toLong, (rng.nextInt(costRange) + 100).toLong, (rng.nextInt(qtyRange) + 1).toLong))
    val expect = pts.filter { case (_, c, q) =>
      !pts.exists { case (_, c2, q2) => c2 < c && q2 > q }
    }.sortBy { case (id, c, _) => (c, id) }
    // both refine routes (round 18): the driver scan (default budget)
    // and the distributed two-pass prefix scan (driverMax = 0 forces
    // it at any size) must agree with brute force
    Seq(operators.Relational.skylineDriverMaxSurvivors, 0L).foreach { budget =>
      val got = operators.Relational.skyline(
          pts.toDF("id", "cost_c", "qty_l").repartition(5).localCheckpoint(),
          driverMax = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect,
        s"seed=$seed budget=$budget: got ${got.take(4)} want ${expect.take(4)}")
    }
  }

  test("skyline: dense ties and duplicate points") {
    checkSkyline(seed = 21, n = 500, costRange = 20, qtyRange = 10)
  }
  test("skyline: wide spread") {
    checkSkyline(seed = 22, n = 400, costRange = 100000, qtyRange = 100000)
  }
  test("skyline: all costs equal collapses to one bucket") {
    checkSkyline(seed = 23, n = 200, costRange = 1, qtyRange = 50)
  }
  test("skyline: single point") {
    checkSkyline(seed = 24, n = 1, costRange = 10, qtyRange = 10)
  }
}
