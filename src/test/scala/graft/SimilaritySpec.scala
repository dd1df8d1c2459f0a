package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f), 0.0)) // zero vector → 0 by definition
      .toDF("a", "b", "expected")
    val got = df.select(
      Similarity.cosine(transform($"a", x => x.cast("double")),
        transform($"b", x => x.cast("double"))).as("sim"), $"expected")
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceKnn exact on a tiny fixture") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceKnn(vecs, vecs.where($"vec_id" === 0), k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(out === Seq((1L, 1), (2L, 2))) // nearest is the 0.9/0.1 vector
  }

  test("lshKnn: identical vectors always share a bucket (recall=1 on dups)") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where($"vec_id" < 3)
    val out = Similarity.lshKnn(e, q, k = 1, numPlanes = 4)
    // each query's own duplicate isn't present, but results are well-formed:
    assert(out.count() <= 3)
    assert(out.where($"rank" === 1).count() === out.count())
  }

  test("lshKnn recall vs brute force on real embeddings (fewer planes → higher)") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where($"vec_id" < 10)
    val brute = Similarity.bruteForceKnn(e, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshKnn(e, q, k = 5, numPlanes = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall") // 2 planes = 4 buckets → decent recall
  }

  test("cosineNearDupPairs finds injected duplicates at threshold 0.99") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val injected = e.unionByName(
      e.where($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 1000L))
    val pairs = Similarity.cosineNearDupPairs(injected, threshold = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert((0L until 5L).forall(i => pairs.contains((i, i + 1000L))))
  }

  test("ivfKnn recall vs brute force with generous probes") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where($"vec_id" < 10)
    val brute = Similarity.bruteForceKnn(e, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(e, q, k = 5, nCentroids = 8, nProbe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall") // probing half the cells
    // deterministic across runs (sampled centroids are hash-ordered)
    val again = Similarity.ivfKnn(e, q, k = 5, nCentroids = 8, nProbe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(ivf === again)
  }

  test("ivfKnn spill: exhaustive probes = brute force, partial probes never lose recall") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .where($"vec_id" < 300)
    val q = e.where($"vec_id" < 6)
    val brute = Similarity.bruteForceKnn(e, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // all cells probed: the spilled duplicates must collapse, not shadow a
    // distinct neighbor out of the top-k — result is exactly brute force
    val exhaustive = Similarity.ivfKnn(e, q, k = 5, nCentroids = 4, nProbe = 4,
        spill = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(exhaustive === brute)
    // partial probes: the spill-2 inverted lists contain every spill-1 list,
    // so recall can only go up
    def recallAt(spill: Int): Double = {
      val got = Similarity.ivfKnn(e, q, k = 5, nCentroids = 8, nProbe = 2,
          spill = spill)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    assert(recallAt(2) >= recallAt(1))
  }

  test("kmeansCentroids recovers planted direction clusters") {
    // three tight blobs around orthogonal axes in 4-d
    val rnd = new scala.util.Random(7)
    def blob(axis: Int, off: Long) = (0 until 20).map { i =>
      (off + i, Seq.tabulate(4)(j =>
        (if (j == axis) 1.0 else 0.0) + rnd.nextGaussian() * 0.05))
    }
    val df = (blob(0, 0L) ++ blob(1, 100L) ++ blob(2, 200L))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, k = 3, iters = 5)
    assert(cents.size === 3)
    // every centroid is unit-norm and dominated by a distinct planted axis
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"norm=$n")
    }
    val axes = cents.map(c => c.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes === Set(0, 1, 2), cents.toString)
  }

  test("ivfKnn with trained centroids keeps recall and stays deterministic") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where($"vec_id" < 10)
    val brute = Similarity.bruteForceKnn(e, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val trained = Similarity.ivfKnn(e, q, k = 5, nCentroids = 8, nProbe = 4,
        trainIters = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & trained).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall")
    val again = Similarity.ivfKnn(e, q, k = 5, nCentroids = 8, nProbe = 4,
        trainIters = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(trained === again)
  }

  test("randomProject: JL geometry roughly preserved, deterministic, right width") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .where($"vec_id" < 30)
    val p = Similarity.randomProject(e, outDims = 32)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("o"), $"proj")
      .collect()
      .map(r => (r.getSeq[Double](1), r.getSeq[Double](2)))
    assert(p.forall(_._2.size === 32))
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val errs = for (i <- p.indices; j <- i + 1 until p.length if j < i + 3) yield {
      val orig = dist(p(i)._1, p(j)._1)
      math.abs(dist(p(i)._2, p(j)._2) - orig) / orig
    }
    val meanErr = errs.sum / errs.size
    assert(meanErr < 0.35, s"mean JL distortion $meanErr over ${errs.size} pairs")
    // deterministic: same seed → identical projection
    val again = Similarity.randomProject(e, outDims = 32)
      .select($"proj").collect().map(_.getSeq[Double](0))
    assert(p.map(_._2).toSeq === again.toSeq)
  }

  test("mmrRerankPool fails loudly when a pool id has no vector row") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where($"vec_id" < 1)
    val pool = Seq(1L, 2L, 999999999L).toDF("nid") // last id not in the corpus
    val err = intercept[IllegalArgumentException] {
      Similarity.mmrRerankPool(e, q, pool, k = 2).collect()
    }
    assert(err.getMessage.contains("id-space mismatch"), err.getMessage)
    // the all-resolvable pool still serves
    assert(Similarity.mmrRerankPool(e, q, Seq(1L, 2L, 3L).toDF("nid"), k = 2)
      .count() == 2L)
  }

  test("native vec_dot matches the interpreted HOF dot bit-for-bit") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val both = e.select($"vec_id",
      Similarity.dot($"v", $"v").as("native"),
      Similarity.dotHof($"v", $"v").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(1) === r.getDouble(2),
      s"vec_id=${r.getLong(0)}"))
    // null and length-mismatch semantics match zip_with truncation
    val edge = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0)),      // truncates to shorter
      (Seq.empty[Double], Seq(1.0)))             // empty → 0
      .toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(edge === Seq(8.0, 0.0))
  }

  test("SQL vec_cosine matches the Column-side cosine, incl. zero-norm -> 0.0") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    e.createOrReplaceTempView("vecs")
    val sql = spark.sql(
      "SELECT vec_id, vec_cosine(v, v) AS c FROM vecs ORDER BY vec_id LIMIT 50")
      .collect()
    sql.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"vec_id=${r.get(0)}"))
    // the two public surfaces agree on degenerate input: zero-norm → 0.0
    val zero = spark.sql(
      """SELECT vec_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c""").collect()
    assert(zero.head.getDouble(0) === 0.0)
    val scalaSide = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).collect()
    assert(scalaSide.head.getDouble(0) === zero.head.getDouble(0))
    // NULL input stays NULL on both surfaces
    val nul = spark.sql(
      "SELECT vec_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()
    assert(nul.head.isNullAt(0))
  }

  test("lshKnn derives hyperplane width from the data (non-64-dim fixture)") {
    // 8-dim embeddings: the old hardcoded dims=64 would hash on a prefix
    // of garbage; derived dims must bucket exact duplicates together
    val base = (0L until 40L).map { i =>
      val v = (0 until 8).map(d => math.sin(i * 1.7 + d).toFloat)
      (i, v)
    }
    val e = base.toDF("vec_id", "embedding")
    val dup = base.take(3).map { case (i, v) => (i + 1000L, v) }.toDF("vec_id", "embedding")
    val out = Similarity.lshKnn(e.unionByName(dup), dup, k = 1, numPlanes = 4)
    val top = out.where($"rank" === 1).select("qid", "nid")
      .as[(Long, Long)].collect().toMap
    // each injected duplicate's nearest neighbour is its identical original
    assert(Similarity.vecDims(e, "embedding") === 8)
    (0L until 3L).foreach(i => assert(top(i + 1000L) === i))
    // degenerate corpus (no non-empty vectors) fails with a clear message
    val empty = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException](Similarity.vecDims(empty, "embedding"))
    assert(err.getMessage.contains("embedding width"))
  }

  test("hyperplanes are deterministic per seed") {
    assert(Similarity.hyperplanes(8, 4, 7L) === Similarity.hyperplanes(8, 4, 7L))
    assert(Similarity.hyperplanes(8, 4, 7L) !== Similarity.hyperplanes(8, 4, 8L))
  }

  test("incremental semantic dedup: copies die against the stored index, uniques survive") {
    val base = (0L until 20L).map { i =>
      val v = (0 until 8).map(d => math.sin(i * 1.7 + d).toFloat)
      (i, v)
    }
    val corpus = base.toDF("vec_id", "embedding")
    val index = Similarity.cosineLshIndex(corpus)
    // batch: two exact copies of corpus vectors + two negated (cosine −1)
    val batch = (base.take(2).map { case (i, v) => (i + 100L, v) } ++
      base.slice(2, 4).map { case (i, v) => (i + 200L, v.map(x => -x)) })
      .toDF("vec_id", "embedding")
    val matches = Similarity.incrementalCosineMatchesWithIndex(
      batch, corpus, index, threshold = 0.999)
    val got = matches.select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 0L), (101L, 1L)),
      s"expected exactly the planted copy matches, got $got")
    assert(matches.where($"sim" < 0.999).count() === 0)
    val kept = Similarity.incrementalSemanticDedup(
        batch, corpus, index, threshold = 0.999)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(202L, 203L), "negated vectors must survive")
  }

  test("labelCentroids: exact unit-normalized per-label means") {
    val df = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 1, Seq(0.0f, 2.0f)),
      (3L, 1, Seq(0.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val cents = Similarity.labelCentroids(df).toMap
    assert(cents.keySet === Set(0, 1))
    assert(cents(0).zip(Seq(1.0, 0.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(cents(1).zip(Seq(0.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("labelConfusion: separable labels go diagonal, a planted stray crosses") {
    val df = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),
      (1L, 0, Seq(0.9f, 0.1f)),
      (2L, 1, Seq(0.0f, 1.0f)),
      (3L, 1, Seq(0.1f, 0.9f)),
      (4L, 0, Seq(0.0f, 1.0f))) // labeled 0, sits in label-1 space
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.labelConfusion(df)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got((0, 0)) === 2L)
    assert(got((1, 1)) === 2L)
    assert(got((0, 1)) === 1L, "the stray must be assigned to label 1")
    assert(!got.contains((1, 0)))
  }

  test("kmeansAssign: every row keeps a valid cell, deterministically") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val a1 = Similarity.kmeansAssign(e, k = 4, iters = 2)
    assert(a1.count() === e.count())
    assert(a1.where($"cell" < 0 || $"cell" >= 4).count() === 0)
    val a2 = Similarity.kmeansAssign(e, k = 4, iters = 2)
    assert(a1.select($"vec_id", $"cell")
      .exceptAll(a2.select($"vec_id", $"cell")).isEmpty)
  }

  test("labelOutliers puts the farthest-from-prototype vector first") {
    // label 0 clusters near e1 with one adversarial vector at −e1: that
    // vector is the re-annotation candidate and must rank rn=1 with the
    // (strictly) lowest own-label score
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(1.0f, 0.1f), 0), (4L, Seq(-1.0f, 0.0f), 0),
      (10L, Seq(0.0f, 1.0f), 1), (11L, Seq(0.1f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(rows, k = 2)
      .orderBy($"label", $"rn").collect()
    assert(out.length === 4) // 2 per label
    assert(out(0).getLong(0) === 4L && out(0).getInt(1) === 0
      && out(0).getInt(3) === 1)
    // scores non-decreasing with rank inside each label
    out.groupBy(_.getInt(1)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo.getDouble(2) <= hi.getDouble(2))
        case _ =>
      }
    }
    // k is a bound, not a requirement: a 1-vector label yields one row
    val tiny = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(0.1f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val counts = Similarity.labelOutliers(tiny, k = 5)
      .groupBy($"label").count().orderBy($"label")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(counts.toSeq === Seq((0, 1L), (1, 2L)))
  }

  test("hybridRrf fuses disagreeing lexical and vector ranks deterministically") {
    import SparkTestSession.spark
    import spark.implicits._
    // query doc 0 "a b c d e"; lexical ranks: 1 (exact copy), 2, 3
    val docs = Seq(
      (0L, "a b c d e"), (1L, "a b c d e"),
      (2L, "a b c x y"), (3L, "z q w r t"))
      .toDF("doc_id", "text")
    // vector ranks disagree: 2 closest, 3 second, 1 last
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.hybridRrf(docs, docs.where(col("doc_id") === 0),
        vecs, vecs.where(col("vec_id") === 0), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getInt(3))).toSeq
    // rrf: doc2 1/62+1/61 = .03252 > doc1 1/61+1/63 = .03227 > doc3 .03200
    assert(got == Seq((2L, 1), (1L, 2), (3L, 3)))
  }

  test("rrfFuse: one-sided candidates score one term, both-sided two, ties break on id") {
    val lex = Seq((10L, 1), (11L, 2)).toDF("nid", "lrank")
    val vec = Seq((11L, 1), (12L, 2)).toDF("nid", "vrank")
    val got = Similarity.rrfFuse(lex, vec, k = 3).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    // 11: 1/62+1/61 = .032516..; 10: 1/61 = .016393..; 12: 1/62 = .016129..
    assert(got.map(_._1) == Seq(11L, 10L, 12L))
    assert(math.abs(got(0)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(1)._2 - 1.0 / 61) < 1e-12)
    assert(got.map(_._3) == Seq(1, 2, 3))
  }

  test("mmrRerank: greedy integer MMR matches a replayed fixture; duplicates penalized") {
    val raw = Map(
      0L -> (1.0, 0.0), 1L -> (4.0, 1.0), 2L -> (5.0, 2.0),
      3L -> (0.0, 5.0), 4L -> (3.0, 4.0))
    val vecs = raw.toSeq.sortBy(_._1)
      .map { case (id, (x, y)) => (id, Seq(x.toFloat, y.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(vecs, vecs.where(col("vec_id") === 0),
        k = 3, poolK = 4)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // replay the greedy with the same arithmetic (x1e4-rounded cosines)
    def sim4(a: Long, b: Long): Long = {
      val ((ax, ay), (bx, by)) = (raw(a), raw(b))
      math.round((ax * bx + ay * by)
        / (math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by)) * 1e4)
    }
    var selected = Seq.empty[(Int, Long, Long)]
    var remaining = Set(1L, 2L, 3L, 4L)
    for (rank <- 1 to 3) {
      val best = remaining.toSeq.map { nid =>
        val pen = if (selected.isEmpty) 0L
          else selected.map { case (_, s, _) => sim4(nid, s) }.max
        (nid, sim4(0L, nid) - pen)
      }.minBy { case (nid, s) => (-s, nid) }
      selected = selected :+ ((rank, best._1, best._2))
      remaining -= best._1
    }
    assert(got == selected, s"got $got want $selected")
    // rank 1 is the most relevant; the near-duplicate directions rank
    // with their penalty applied (every later score strictly below)
    assert(got.head._2 == 1L && got.head._3 == sim4(0L, 1L))
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("hybridStoredServe: wiring equals hand-fused sides; both stores scanned pruned") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    spark.catalog.clearCache() // scan census below — no foreign cache substitution
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val tix = "/tmp/graft/simspec_hybrid_tix"
    val aix = "/tmp/graft/simspec_hybrid_aix"
    TextIndex.writeRebuildBaseline(docs, tix)
    AnnIndex.writeRebuildBaseline(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      aix, nCentroids = 16, trainIters = 2, spill = 2)
    val served = Similarity.hybridStoredServe(spark, tix, aix, e, terms, q,
      k = 5, poolK = 20, rerank = 60, nProbe = 3)
    // collect served ITSELF (not a derived frame): the scan census below
    // reads runtime metrics off this exact plan, which must have executed
    val got = served.collect().sortBy(_.getInt(2))
      .map(r => (r.getLong(0), r.getInt(2))).toSeq
    // the same fusion composed by hand from the two serves
    val lex = TextIndex.bm25Search(spark, tix, terms, k = 20)
      .select(col("doc_id").as("nid"), col("rank").cast("int").as("lrank"))
    val vec = AnnIndex.knn(spark, aix, e, q, k = 20, rerank = 60, nProbe = 3)
      .select(col("nid"), col("rank").as("vrank"))
    val want = Similarity.rrfFuse(lex, vec, k = 5).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(got == want && got.size == 5)

    // the composed plan reads ONLY the pruned store directories: the
    // postings scan the query terms' shards, the codes scan the probed
    // cells (the ANN side sits behind knn's materialized cache)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec       => scans(qs.plan)
      case m: InMemoryTableScanExec => scans(m.relation.cachedPlan)
      case other                    => other.children.flatMap(scans)
    }
    val all = scans(served.queryExecution.executedPlan)
    val postings = all.find(_.toString.contains("postings.parquet"))
      .getOrElse(fail("no postings.parquet scan in the composed plan"))
    val nShards = terms.map(TextIndex.shardOf).distinct.size
    assert(postings.toString.contains("PartitionFilters"))
    val shardsRead = postings.metrics("numPartitions").value
    assert(shardsRead > 0 && shardsRead <= nShards,
      s"expected <= $nShards postings shards read, got $shardsRead")
    val codes = all.find(_.toString.contains("codes.parquet"))
      .getOrElse(fail("no codes.parquet scan in the composed plan"))
    assert(codes.toString.contains("PartitionFilters"))
    val cellsRead = codes.metrics("numPartitions").value
    assert(cellsRead > 0 && cellsRead <= 3,
      s"expected <= 3 of 16 cell partitions read, got $cellsRead")
    spark.catalog.clearCache()
  }

  test("threeStageServe: composed = fused shortlist through the shared greedy; stores pruned end to end") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    spark.catalog.clearCache() // scan census below — no foreign cache substitution
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val tix = "/tmp/graft/simspec_3stage_tix"
    val aix = "/tmp/graft/simspec_3stage_aix"
    TextIndex.writeRebuildBaseline(docs, tix)
    AnnIndex.writeRebuildBaseline(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      aix, nCentroids = 16, trainIters = 2, spill = 2)
    val got = Similarity.threeStageServe(spark, tix, aix, e, terms, q,
        k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

    // the same composition built BY HAND from the public stages: the
    // stored fusion at fuseK, then the shared pool-greedy. Equality pins
    // the wiring — the composed serve cannot secretly pool from
    // anything but the fused stored-index shortlist
    val fused = Similarity.hybridStoredServe(spark, tix, aix, e, terms, q,
      k = 15, poolK = 20, rerank = 60, nProbe = 3)
    // collect fused ITSELF: the scan census reads runtime metrics off
    // this exact executed plan — the store-touching stage of the serve
    val fusedRows = fused.collect()
    assert(fusedRows.length == 15)
    val want = Similarity.mmrRerankPool(e, q, fused.select(col("nid")),
        k = 5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.size == 5, s"got $got want $want")
    // diversification really happened off the fused list: every served
    // nid is a fused candidate. (No monotone-score assertion — with
    // negative pairwise cosines a later step's `qsim4 − max psim4` can
    // legitimately exceed an earlier one's.)
    val fusedIds = fusedRows.map(_.getLong(0)).toSet
    assert(got.forall(r => fusedIds.contains(r._2)))

    // the store-touching stage reads ONLY pruned directories: postings
    // scan limited to the query terms' shards, codes scan to the probed
    // cells — end to end, the composed serve touches the two stores
    // nowhere else (the MMR stage reads only the shortlist's own
    // vectors through a broadcast semi-join on the embeddings table)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec       => scans(qs.plan)
      case m: InMemoryTableScanExec => scans(m.relation.cachedPlan)
      case other                    => other.children.flatMap(scans)
    }
    val all = scans(fused.queryExecution.executedPlan)
    val postings = all.find(_.toString.contains("postings.parquet"))
      .getOrElse(fail("no postings.parquet scan in the fused stage"))
    val nShards = terms.map(TextIndex.shardOf).distinct.size
    assert(postings.toString.contains("PartitionFilters"))
    val shardsRead = postings.metrics("numPartitions").value
    assert(shardsRead > 0 && shardsRead <= nShards,
      s"expected <= $nShards postings shards read, got $shardsRead")
    val codes = all.find(_.toString.contains("codes.parquet"))
      .getOrElse(fail("no codes.parquet scan in the fused stage"))
    assert(codes.toString.contains("PartitionFilters"))
    val cellsRead = codes.metrics("numPartitions").value
    assert(cellsRead > 0 && cellsRead <= 3,
      s"expected <= 3 of 16 cell partitions read, got $cellsRead")
    spark.catalog.clearCache()
  }

  test("threeStageServeBundle equals the flat threeStageServe over the same stores") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val tix = "/tmp/graft/simspec_b3_tix"
    val aix = "/tmp/graft/simspec_b3_aix"
    val root = java.nio.file.Files.createTempDirectory("graft-b3").toString
    val books = Embeddings.pqTrain(
      RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2)
    // the same corpus through both store protocols: the deterministic
    // builds (shared trainCentroids/encodeAssign, shared postings pass)
    // must produce byte-equivalent indexes, and the shared serve cores
    // must then produce the identical three-stage result — flat and
    // bundle deployments of the production stack cannot drift
    TextIndex.writeRebuildBaseline(docs, tix)
    AnnIndex.writeRebuildBaseline(e, books, aix, nCentroids = 16, trainIters = 2, spill = 2)
    TextIndex.writeBundle(docs, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(e, books, root, "ann", nCentroids = 16,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    val flat = Similarity.threeStageServe(spark, tix, aix, e, terms, q,
        k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val bundle = Similarity.threeStageServeBundle(spark, root, "tix",
        root, "ann", e, terms, q,
        k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bundle == flat && bundle.size == 5, s"bundle $bundle flat $flat")
    spark.catalog.clearCache()
  }

  test("batched serve: per-qid results equal the single-query serve, caps enforced") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val tix = "/tmp/graft/simspec_batch_tix"
    val aix = "/tmp/graft/simspec_batch_aix"
    TextIndex.writeRebuildBaseline(docs, tix)
    AnnIndex.writeRebuildBaseline(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      aix, nCentroids = 16, trainIters = 2, spill = 2)
    val batch = Seq(0L -> Seq("join", "vector"), 1L -> Seq("hash", "scan"),
      2L -> Seq("merge", "table"))
    val qvecs = e.where(col("vec_id") < 3)
    val got = Similarity.threeStageServeBatch(spark, tix, aix, e, batch,
        qvecs, k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq }
    assert(got.keySet == Set(0L, 1L, 2L))
    batch.foreach { case (qid, ts) =>
      val single = Similarity.threeStageServe(spark, tix, aix, e, ts,
          e.where(col("vec_id") === qid), k = 5, fuseK = 15, poolK = 20,
          rerank = 60, nProbe = 3)
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got(qid) == single && single.size == 5,
        s"qid $qid: batch ${got(qid)} != single $single")
      spark.catalog.clearCache()
    }
    // caps are explicit, not silent: an over-wide per-query pool refuses
    val wide = e.limit(300).select(lit(0L).as("qid"),
      col("vec_id").as("nid"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.mmrRerankPoolBatch(e, e.where(col("vec_id") < 1), wide, 5)
    }
    assert(ex.getMessage.contains("256-candidate"))
    spark.catalog.clearCache()

    // the filtered batch: within restricts BOTH retrieval sides before
    // top-k per query, exactly as the single filtered serve does
    val allowed = e.where(col("label") < 5).select(col("vec_id"))
    val gotF = Similarity.threeStageServeBatch(spark, tix, aix, e,
        batch.take(2), e.where(col("vec_id") < 2), k = 5, fuseK = 15,
        poolK = 20, rerank = 60, nProbe = 3, within = Some(allowed))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq }
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    batch.take(2).foreach { case (qid, ts) =>
      val single = Similarity.threeStageServe(spark, tix, aix, e, ts,
          e.where(col("vec_id") === qid), k = 5, fuseK = 15, poolK = 20,
          rerank = 60, nProbe = 3, within = Some(allowed))
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotF(qid) == single && single.size == 5,
        s"filtered qid $qid: batch ${gotF(qid)} != single $single")
      assert(gotF(qid).forall(r => allowedIds.contains(r._2)),
        s"filtered qid $qid served an id outside the allowed set")
      spark.catalog.clearCache()
    }
  }

  test("filtered serve: results within the allowed set; wiring equals hand-filtered stages") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val tix = "/tmp/graft/simspec_filt_tix"
    val aix = "/tmp/graft/simspec_filt_aix"
    TextIndex.writeRebuildBaseline(docs, tix)
    AnnIndex.writeRebuildBaseline(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      aix, nCentroids = 16, trainIters = 2, spill = 2)
    val allowed = e.where(col("label") < 5).select(col("vec_id"))
    val got = Similarity.threeStageServe(spark, tix, aix, e, terms, q,
        k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3,
        within = Some(allowed))
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == 5)
    // the filter is honored end to end: nothing outside the allowed set
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    assert(got.forall(r => allowedIds.contains(r._2)),
      s"served ids outside filter: ${got.map(_._2).filterNot(allowedIds)}")
    // wiring: identical to composing the filtered stages by hand
    val lex = TextIndex.bm25Search(spark, tix, terms, k = 20,
        within = Some(allowed))
      .select(col("doc_id").as("nid"), col("rank").cast("int").as("lrank"))
    val vec = AnnIndex.knn(spark, aix, e, q, k = 20, rerank = 60,
        nProbe = 3, within = Some(allowed))
      .select(col("nid"), col("rank").as("vrank"))
    val fused = Similarity.rrfFuse(lex, vec, k = 15)
    val want = Similarity.mmrRerankPool(e, q, fused.select(col("nid")),
        k = 5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got want $want")
    // bm25Search keeps GLOBAL statistics under a filter: the per-doc
    // score of a doc that survives filtering is unchanged, only ranks
    // renumber within the filtered set
    val unfiltered = TextIndex.bm25Search(spark, tix, terms, k = 200)
      .select(col("doc_id"), col("score_x10k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val filteredScores = TextIndex.bm25Search(spark, tix, terms, k = 200,
        within = Some(allowed))
      .select(col("doc_id"), col("score_x10k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(filteredScores.nonEmpty)
    filteredScores.foreach { case (id, sc) =>
      assert(allowedIds.contains(id))
      assert(unfiltered.get(id).forall(_ == sc),
        s"doc $id score changed under filter")
    }
    spark.catalog.clearCache()
  }

  test("serve under maintenance: a serve pinned before compaction+append+takedown answers exactly the pinned version") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    import graft.sources.Catalog
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val docsA = docs.where(col("doc_id") % 7 =!= 6)
    val eA = e.where(col("vec_id") % 7 =!= 6)
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val root = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val books = Embeddings.pqTrain(
      RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2)
    TextIndex.writeBundle(docsA, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(eA, books, root, "ann", nCentroids = 16,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    val tv = Catalog.latestBundleVersion(spark, root, "tix").get
    val av = Catalog.latestBundleVersion(spark, root, "ann").get
    def serve(tvv: Option[Long], avv: Option[Long]) =
      Similarity.threeStageServeBundle(spark, root, "tix", root, "ann",
          e, terms, q, k = 5, fuseK = 15, poolK = 20, rerank = 60,
          nProbe = 3, textVersion = tvv, annVersion = avv)
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val before = serve(None, None)
    assert(before.size == 5)
    spark.catalog.clearCache()
    // the full concurrent story, serialized deterministically: an
    // append, a compaction AND a takedown all commit on both stores.
    // The serve's ONLY read of mutable state is latestBundleVersion at
    // entry — everything downstream threads that version — so a serve
    // that resolved before these commits is exactly a pinned serve,
    // and must return the pinned version's answer end to end.
    assert(TextIndex.appendBundle(spark, root, "tix",
      docs.where(col("doc_id") % 7 === 6), "b1"))
    assert(AnnIndex.appendBundle(spark, root, "ann",
      e.where(col("vec_id") % 7 === 6), "b1"))
    Catalog.compactBundle(spark, root, "tix")
    Catalog.compactBundle(spark, root, "ann")
    val rm = before.map(_._2).take(2).toDF("doc_id")
    TextIndex.retractBundle(spark, root, "tix", rm)
    AnnIndex.retractBundle(spark, root, "ann", rm, idCol = "vec_id")
    val pinned = serve(Some(tv), Some(av))
    assert(pinned == before,
      s"pinned serve drifted under maintenance: $pinned vs $before")
    spark.catalog.clearCache()
    // the fresh serve resolves the post-maintenance latest: the
    // taken-down ids are gone, and it still returns a full top-k
    val after = serve(None, None)
    val removed = rm.collect().map(_.getLong(0)).toSet
    assert(after.size == 5 && after.forall(r => !removed.contains(r._2)),
      s"post-takedown serve returned a removed id: $after")
    spark.catalog.clearCache()
  }

  test("filtered batched bundle serve equals the flat filtered batch per qid") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val tix = "/tmp/graft/simspec_fbb_tix"
    val aix = "/tmp/graft/simspec_fbb_aix"
    val root = java.nio.file.Files.createTempDirectory("graft-fbb").toString
    val aligned = docs.join(e.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val books = Embeddings.pqTrain(
      RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2)
    TextIndex.writeRebuildBaseline(aligned, tix)
    AnnIndex.writeRebuildBaseline(e, books, aix, nCentroids = 16, trainIters = 2, spill = 2)
    TextIndex.writeBundle(aligned, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(e, books, root, "ann", nCentroids = 16,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    val batch = Seq(0L -> Seq("join", "vector"), 1L -> Seq("hash", "scan"))
    val qvecs = e.where(col("vec_id") < 2)
    val allowed = e.where(col("label") < 5).select(col("vec_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    val flat = rows(Similarity.threeStageServeBatch(spark, tix, aix, e,
      batch, qvecs, k = 5, fuseK = 15, poolK = 20, rerank = 60,
      nProbe = 3, within = Some(allowed)))
    spark.catalog.clearCache()
    val bundle = rows(Similarity.threeStageServeBatchBundle(spark, root,
      "tix", root, "ann", e, batch, qvecs, k = 5, fuseK = 15, poolK = 20,
      rerank = 60, nProbe = 3, within = Some(allowed)))
    assert(bundle == flat && bundle.size == 10,
      s"bundle $bundle != flat $flat")
    spark.catalog.clearCache()
  }

  test("per-qid (qid,id) filter: batch equals each single serve with that query's own allowed set") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val tix = "/tmp/graft/simspec_wp_tix"
    val aix = "/tmp/graft/simspec_wp_aix"
    val aligned = docs.join(e.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    TextIndex.writeRebuildBaseline(aligned, tix)
    AnnIndex.writeRebuildBaseline(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      aix, nCentroids = 16, trainIters = 2, spill = 2)
    val batch = Seq(0L -> Seq("join", "vector"), 1L -> Seq("hash", "scan"))
    val qvecs = e.where(col("vec_id") < 2)
    // DIFFERENT allowed set per query — the per-request ACL shape the
    // shared `within` cannot express
    val allow0 = e.where(col("label") < 5).select(col("vec_id"))
    val allow1 = e.where(col("label") >= 3).select(col("vec_id"))
    val pairs = allow0.select(lit(0L).as("qid"), col("vec_id").as("id"))
      .unionByName(allow1.select(lit(1L).as("qid"), col("vec_id").as("id")))
    val got = Similarity.threeStageServeBatch(spark, tix, aix, e, batch,
        qvecs, k = 5, fuseK = 15, poolK = 20, rerank = 60, nProbe = 3,
        withinPairs = Some(pairs))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq }
    spark.catalog.clearCache()
    val allowed = Map(0L -> allow0, 1L -> allow1)
    batch.foreach { case (qid, ts) =>
      val single = Similarity.threeStageServe(spark, tix, aix, e, ts,
          e.where(col("vec_id") === qid), k = 5, fuseK = 15, poolK = 20,
          rerank = 60, nProbe = 3, within = Some(allowed(qid)))
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got(qid) == single && single.size == 5,
        s"qid $qid: per-qid-pairs batch ${got(qid)} != single-within $single")
      val ok = allowed(qid).collect().map(_.getLong(0)).toSet
      assert(got(qid).forall(r => ok.contains(r._2)),
        s"qid $qid served an id outside ITS allowed set")
      spark.catalog.clearCache()
    }
  }

  test("deployment pins: deployed serve equals explicitly-pinned serve; missing artifact refuses loudly") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    import graft.sources.Catalog
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val root = java.nio.file.Files.createTempDirectory("graft-dep").toString
    val aligned = docs.join(e.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    TextIndex.writeBundle(aligned, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      root, "ann", nCentroids = 16, trainIters = 2, spill = 2,
      seedBatchIds = Seq("b0"))
    val tv = Catalog.latestBundleVersion(spark, root, "tix").get
    val av = Catalog.latestBundleVersion(spark, root, "ann").get
    val d1 = Catalog.commitDeployment(spark, root, "serving",
      Map("tix" -> tv, "ann" -> av))
    assert(Catalog.readDeployment(spark, root, "serving") ==
      Map("tix" -> tv, "ann" -> av))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("rank")).collect().map(_.toSeq).toSeq
    val deployed = rows(Similarity.threeStageServeDeployed(spark, root,
      "serving", root, "tix", root, "ann", e, terms, q, k = 5, fuseK = 15,
      poolK = 20, rerank = 60, nProbe = 3))
    spark.catalog.clearCache()
    val pinned = rows(Similarity.threeStageServeBundle(spark, root, "tix",
      root, "ann", e, terms, q, k = 5, fuseK = 15, poolK = 20, rerank = 60,
      nProbe = 3, textVersion = Some(tv), annVersion = Some(av)))
    assert(deployed == pinned && deployed.size == 5)
    spark.catalog.clearCache()
    // the deployment itself time-travels: a later pin set doesn't
    // change what d1 answers. A pin naming no committed bundle version
    // refuses at the FLIP (not at the thousand serves that resolve it)
    // unless the caller opts out of validation for non-bundle artifacts
    val exv = intercept[RuntimeException] {
      Catalog.commitDeployment(spark, root, "serving",
        Map("tix" -> tv, "ann" -> av, "extra" -> 1L))
    }
    assert(exv.getMessage.contains("does not resolve"),
      s"wrong failure: ${exv.getMessage}")
    val d2 = Catalog.commitDeployment(spark, root, "serving",
      Map("tix" -> tv, "ann" -> av, "extra" -> 1L), validate = false)
    assert(d2 == d1 + 1)
    assert(Catalog.readDeployment(spark, root, "serving", Some(d1)) ==
      Map("tix" -> tv, "ann" -> av))
    // a pin set missing a required artifact refuses loudly
    Catalog.commitDeployment(spark, root, "broken", Map("tix" -> tv))
    val ex = intercept[RuntimeException] {
      Similarity.threeStageServeDeployed(spark, root, "broken", root,
        "tix", root, "ann", e, terms, q, k = 5, fuseK = 15, poolK = 20,
        rerank = 60, nProbe = 3)
    }
    assert(ex.getMessage.contains("no pin for artifact 'ann'"),
      s"wrong failure: ${ex.getMessage}")
    spark.catalog.clearCache()
  }

  test("deployed batched serve equals the explicitly-pinned batch; takedownServingStack retracts both stores then flips last") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    import graft.sources.Catalog
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val batch = Seq(0L -> Seq("join", "vector"), 1L -> Seq("hash", "scan"),
      2L -> Seq("merge", "table"))
    val qvecs = e.where(col("vec_id") < 3)
    val root = java.nio.file.Files.createTempDirectory("graft-depb").toString
    val aligned = docs.join(e.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    TextIndex.writeBundle(aligned, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      root, "ann", nCentroids = 16, trainIters = 2, spill = 2,
      seedBatchIds = Seq("b0"))
    val tv = Catalog.latestBundleVersion(spark, root, "tix").get
    val av = Catalog.latestBundleVersion(spark, root, "ann").get
    Catalog.commitDeployment(spark, root, "serving",
      Map("tix" -> tv, "ann" -> av))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    val deployed = rows(Similarity.threeStageServeBatchDeployed(spark,
      root, "serving", root, "tix", root, "ann", e, batch, qvecs, k = 5,
      fuseK = 15, poolK = 20, rerank = 60, nProbe = 3))
    spark.catalog.clearCache()
    val pinned = rows(Similarity.threeStageServeBatchBundle(spark, root,
      "tix", root, "ann", e, batch, qvecs, k = 5, fuseK = 15, poolK = 20,
      rerank = 60, nProbe = 3, textVersion = Some(tv),
      annVersion = Some(av)))
    assert(deployed == pinned && deployed.size == 15)
    spark.catalog.clearCache()
    // the stack takedown as one library call: both stores retracted
    // (each one atomic bundle commit), the pin flipped LAST to the new
    // versions — and the post-takedown serve never returns a removed id
    val rm = deployed.filter(r => r(1) == 1).map(_(2).asInstanceOf[Long])
    val rmDf = rm.toDF("doc_id")
    val newPins = Similarity.takedownServingStack(spark, root, "serving",
      "tix", "ann", rmDf)
    assert(newPins == Map("tix" -> (tv + 1), "ann" -> (av + 1)))
    assert(Catalog.readDeployment(spark, root, "serving") == newPins)
    val post = rows(Similarity.threeStageServeBatchDeployed(spark, root,
      "serving", root, "tix", root, "ann", e, batch, qvecs, k = 5,
      fuseK = 15, poolK = 20, rerank = 60, nProbe = 3))
    assert(post.size == 15 &&
      !post.exists(r => rm.contains(r(2).asInstanceOf[Long])))
    spark.catalog.clearCache()
  }

  test("stack incident: wrong takedown → rollback → realign → corrected takedown serves only the right removal, ledger intact") {
    import graft.operators.{AnnIndex, Embeddings, RelOps, TextIndex}
    import graft.sources.Catalog
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = e.where(col("vec_id") < 1)
    val terms = Seq("join", "vector")
    val root = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val aligned = docs.join(e.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    TextIndex.writeBundle(aligned, root, "tix", seedBatchIds = Seq("b0"))
    AnnIndex.writeBundle(e, Embeddings.pqTrain(
        RelOps.hashSample(e, "vec_id", 0.25), m = 8, k = 16, iters = 2),
      root, "ann", nCentroids = 16, trainIters = 2, spill = 2,
      seedBatchIds = Seq("b0"))
    val d1 = Catalog.commitDeployment(spark, root, "serving", Map(
      "tix" -> Catalog.latestBundleVersion(spark, root, "tix").get,
      "ann" -> Catalog.latestBundleVersion(spark, root, "ann").get))
    def serve(): Seq[(Int, Long)] =
      Similarity.threeStageServeDeployed(spark, root, "serving", root,
        "tix", root, "ann", e, terms, q, k = 5, fuseK = 15, poolK = 20,
        rerank = 60, nProbe = 3)
        .select(col("rank"), col("nid")).collect()
        .map(r => (r.getAs[Number]("rank").intValue, r.getAs[Long]("nid")))
        .sortBy(_._1).toSeq
    val pre = serve()
    assert(pre.size == 5)
    // the incident: ranks 1-2 get taken down... and they were the WRONG
    // ids — rank 3 was the contaminated doc
    val wrong = pre.filter(_._1 <= 2).map(_._2)
    val right = pre.filter(_._1 == 3).map(_._2)
    spark.catalog.clearCache()
    Similarity.takedownServingStack(spark, root, "serving", "tix", "ann",
      wrong.toDF("doc_id"))
    // response: one flip back (serves answer pre-incident versions),
    // then re-align the stores with the pins — without it the corrected
    // takedown below would derive from the wrong-takedown versions and
    // COMPOUND the removal instead of replacing it
    Catalog.rollbackDeployment(spark, root, "serving", d1)
    val aligned2 = Catalog.realignStack(spark, root, "serving")
    assert(aligned2 == Map("tix" -> 3L, "ann" -> 3L))
    // the corrected takedown is ordinary forward maintenance again
    Similarity.takedownServingStack(spark, root, "serving", "tix", "ann",
      right.toDF("doc_id"))
    val post = serve()
    // greedy MMR picks the first two slots on pure relevance-rank, so
    // removing the rank-3 doc cannot move them: the wrongly-removed ids
    // serve again, the right id is gone
    assert(post.filter(_._1 <= 2).map(_._2) == wrong,
      s"wrongly-removed ids must serve again: pre=$pre post=$post")
    assert(post.forall(r => !right.contains(r._2)),
      s"the contaminated id must be gone: post=$post")
    // ledger intact throughout the whole dance: the seed batch id rode
    // every restore and retract, so its replay stays rejected
    assert(Catalog.bundleManifest(spark, root, "tix").batches == Seq("b0"))
    assert(Catalog.bundleManifest(spark, root, "ann").batches == Seq("b0"))
    spark.catalog.clearCache()
  }

  test("mmrRerankPoolBatch fails loudly when a pooled qid has no query-vector row") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val pool = Seq((0L, 10L), (0L, 11L), (7777L, 10L), (7777L, 12L))
      .toDF("qid", "nid")
    // qid 7777 has no row in the query-vector table: the batch must
    // refuse, not silently return zero rows for that query
    val ex = intercept[IllegalArgumentException] {
      Similarity.mmrRerankPoolBatch(e, e.where(col("vec_id") === 0L),
        pool, k = 2)
    }
    assert(ex.getMessage.contains("no 'vec_id' row in the query-vector"),
      s"wrong failure: ${ex.getMessage}")
    spark.catalog.clearCache()
  }
}
