package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Temporal, Transpose}

/** Randomized (fixed-seed, deterministic) cross-checks: each operator is
  * compared against an independent brute-force formulation on generated
  * data — the correctness net for input shapes no hand-written fixture
  * thought of (duplicate timestamps, absent keys, null cells, skew).
  */
class RandomizedCrossCheckSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("asofJoinBackward equals brute-force latest-at-or-before on random data") {
    val rnd = new scala.util.Random(20240812L)
    // keys 0..4; right side deliberately missing key 4; duplicate ts included
    val rightRows = Seq.tabulate(60)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, s"v$i"))
    val leftRows = Seq.tabulate(80)(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong))
    val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "t")
    val right = rightRows.toDF("k", "rt", "payload")

    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "t", "rt",
        payload = Seq("payload"))
      .select($"lid", $"asof_rt", $"asof_payload")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2)))))
      .toMap

    // brute force: for each left row, the right row with max rt <= t; the
    // window breaks payload ties by union order, so compare rt only (and
    // payload just when the (k, rt) pair is unique)
    val rightByKey = rightRows.groupBy(_._1)
    leftRows.zipWithIndex.foreach { case ((k, t), i) =>
      val candidates = rightByKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val (gotRt, gotPayload) = got(i.toLong)
      if (candidates.isEmpty) {
        assert(gotRt.isEmpty && gotPayload.isEmpty, s"lid=$i expected no match")
      } else {
        val bestRt = candidates.map(_._2).max
        assert(gotRt.contains(bestRt), s"lid=$i k=$k t=$t: rt $gotRt != $bestRt")
        val tied = candidates.filter(_._2 == bestRt)
        if (tied.size == 1) assert(gotPayload.contains(tied.head._3), s"lid=$i")
      }
    }
    assert(got.size === leftRows.size) // as-of never drops or duplicates left rows
  }

  test("funnel equals a brute-force per-user chain scan on random data") {
    val rnd = new scala.util.Random(99L)
    val types = Seq("view", "click", "buy", "noise")
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(40).toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L),
        types(rnd.nextInt(types.length))))
    val events = rows.toDF("user_id", "ts", "event_type")
    val stages = Seq("view", "click", "buy")
    val got = graft.operators.Behavior.funnel(events, stages)
      .orderBy("stage_idx").as[(Int, String, Long)].collect().map(_._3).toSeq

    // brute force: walk each user's (ts, type) history sorted like the
    // operator (ts asc, then type asc as the struct-sort tiebreak)
    val expected = Array.fill(3)(0L)
    rows.groupBy(_._1).foreach { case (_, es) =>
      val hist = es.map(e => (e._2.getTime, e._3)).sortBy(identity)
      var reached = Array.fill[Option[Long]](3)(None)
      hist.foreach { case (t, ty) =>
        val i = stages.indexOf(ty)
        if (i >= 0 && reached(i).isEmpty &&
          (i == 0 || reached(i - 1).exists(_ < t))) reached(i) = Some(t)
      }
      reached.zipWithIndex.foreach { case (r, i) => if (r.isDefined) expected(i) += 1 }
    }
    assert(got === expected.toSeq, s"got $got expected ${expected.toSeq}")
  }

  test("transpose then untranspose returns the original rows on random data") {
    val rnd = new scala.util.Random(7L)
    val classes = Seq("AAA", "BBB", "CCC", "DDD")
    // one value per (id, class) — pivot's first() is lossless exactly then
    val rows = (for { id <- 0L until 30L; c <- classes if rnd.nextBoolean() }
      yield (id, c, math.floor(rnd.nextDouble() * 1000) / 100)).toSeq
    val df = rows.toDF("ID", "CLASS", "SALES")
    val wide = Transpose(df, Seq("ID"), "CLASS", Seq("SALES"))
    val back = Transpose.untranspose(wide, Seq("ID"), "CLASS", Seq("SALES"))
      .as[(Long, String, Double)].collect().toSet
    assert(back === rows.toSet)
  }
}
