package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("deleteVariants emits the string plus each single-char deletion") {
    val out = Seq(Tuple1("abc")).toDF("s")
      .select(Linkage.deleteVariants(col("s")).as("v"))
      .collect()(0).getSeq[String](0)
    assert(out.toSet === Set("abc", "bc", "ac", "ab"))
  }

  test("fuzzyPairs equals the naive blocked levenshtein product (lossless blocking)") {
    // randomized corpus over a tiny alphabet so distance-1 collisions are
    // common; fixed seed for reproducibility
    val rnd = new scala.util.Random(42)
    val rows = (0L until 200L).map { id =>
      val len = 4 + rnd.nextInt(3)
      val name = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (id, name, (id % 2).toInt)
    }
    val df = rows.toDF("id", "name", "block")
    val got = Linkage.fuzzyPairs(df, "id", "name", Seq("block"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ba == bb && ia < ib && lev(na, nb) <= 1
    } yield (ia, ib)).toSet
    assert(want.nonEmpty, "seed produced no distance-1 pairs; strengthen the generator")
    assert(got === want)
  }

  test("fuzzyPairs never pairs across blocks") {
    val df = Seq((1L, "abc", 0), (2L, "abd", 1)).toDF("id", "name", "block")
    assert(Linkage.fuzzyPairs(df, "id", "name", Seq("block")).count() === 0L)
  }

  test("fuzzyPairs hot-bucket guard drops flooded variants, keeps the rest intact") {
    // 500 records with the IDENTICAL name (the exact-dup flood the guard
    // exists for) plus one clean distance-1 pair in the same block
    val flood = (1L to 500L).map(i => (i, "samename", 0))
    val clean = Seq((1001L, "qwerty", 0), (1002L, "qwertz", 0))
    val df = (flood ++ clean).toDF("id", "name", "block")
    val guarded = Linkage.fuzzyPairs(df, "id", "name", Seq("block"),
        maxBucketSize = 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the flooded name contributes nothing; the clean pair survives
    assert(guarded === Set((1001L, 1002L)))
    val dropped = Linkage.droppedVariantBuckets(df, "id", "name", Seq("block"),
      maxBucketSize = 100L)
    assert(dropped.count() === 9L) // "samename" itself + its 8 deletions
    // guard off: the flood pairs all come back (C(500,2) + the clean one)
    val unguarded = Linkage.fuzzyPairs(df, "id", "name", Seq("block"),
      maxBucketSize = 0L)
    assert(unguarded.count() === 500L * 499L / 2 + 1)
  }
}
