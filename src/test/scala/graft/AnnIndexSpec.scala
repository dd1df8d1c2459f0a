package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Embeddings, RelOps, Similarity}

class AnnIndexSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def trainedBooks = Embeddings.pqTrain(
    RelOps.hashSample(embeddings, "vec_id", 0.5), m = 8, k = 16, iters = 2)

  test("index tables round-trip: books and centroids read back exactly") {
    val idx = "/tmp/graft/annindex_spec_rt"
    val books = trainedBooks
    AnnIndex.writeRebuildBaseline(embeddings, books, idx, nCentroids = 8)
    assert(AnnIndex.readBooks(spark, idx) == books)
    val cents = AnnIndex.readCentroids(spark, idx)
    assert(cents.map(_._1) == (0 until 8))
    assert(cents == Similarity.sampleCentroids(embeddings, 8))
  }

  test("exhaustive serve (all cells probed, full rerank) equals brute force") {
    // with every cell probed and the rerank wider than the corpus, the
    // stored-index path degenerates to exact search — any deviation from
    // bruteForceKnn means codes/cells/decode corrupted something
    val idx = "/tmp/graft/annindex_spec_exact"
    val corpus = embeddings.where(col("vec_id") < 200)
    AnnIndex.writeRebuildBaseline(corpus, trainedBooks, idx, nCentroids = 4)
    val q = corpus.where(col("vec_id") < 3)
    val got = AnnIndex.knn(spark, idx, corpus, q, k = 5, rerank = 300,
        nProbe = 4)
      .orderBy(col("qid"), col("rank")).collect()
    val want = Similarity.bruteForceKnn(corpus, q, k = 5)
      .orderBy(col("qid"), col("rank")).collect()
    assert(got.length == want.length && got.length == 15)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1),
        s"got $g want $w")
    }
    spark.catalog.clearCache()
  }

  test("append without retraining: frozen quantizer, merged index = brute force") {
    // build on 90% of a small corpus with spill 2, append the held-out 10%:
    // the quantizer/books must not move (frozen on disk), the id set must
    // cover the whole corpus, and an exhaustive serve (all cells, corpus-
    // wide rerank) must equal brute force over the FULL corpus — i.e. the
    // appended vectors are first-class index residents, and the spill
    // duplicates collapse instead of double-counting a neighbor
    val idx = "/tmp/graft/annindex_spec_append"
    val corpus = embeddings.where(col("vec_id") < 200)
    val base = corpus.where(col("vec_id") % 10 =!= 0)
    val batch = corpus.where(col("vec_id") % 10 === 0)
    val books = trainedBooks
    AnnIndex.writeRebuildBaseline(base, books, idx, nCentroids = 4, trainIters = 2, spill = 2)
    val centsBefore = AnnIndex.readCentroids(spark, idx)
    AnnIndex.appendRebuildBaseline(spark, idx, batch, spill = 2)
    assert(AnnIndex.readCentroids(spark, idx) == centsBefore,
      "append must not move the stored quantizer")
    assert(AnnIndex.readBooks(spark, idx) == books,
      "append must not move the stored codebooks")
    val indexed = spark.read.parquet(s"$idx/codes.parquet")
      .select(col("vec_id")).distinct().count()
    assert(indexed == corpus.count(), "index id set must cover the corpus")
    val q = corpus.where(col("vec_id") < 3)
    val got = AnnIndex.knn(spark, idx, corpus, q, k = 5, rerank = 500,
        nProbe = 4)
      .orderBy(col("qid"), col("rank")).collect()
    val want = Similarity.bruteForceKnn(corpus, q, k = 5)
      .orderBy(col("qid"), col("rank")).collect()
    assert(got.length == want.length && got.length == 15)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1),
        s"got $g want $w")
    }
    spark.catalog.clearCache()
  }

  test("serve scans only the probed cell partitions") {
    val idx = "/tmp/graft/annindex_spec_prune"
    AnnIndex.writeRebuildBaseline(embeddings, trainedBooks, idx, nCentroids = 16)
    val q = embeddings.where(col("vec_id") < 2)
    val ann = AnnIndex.knn(spark, idx, embeddings, q, k = 3, rerank = 20,
      nProbe = 3)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec       => scans(qs.plan)
      // the serve result comes back persisted (Lifecycle) — the real plan
      // lives behind the cache substitution
      case m: InMemoryTableScanExec => scans(m.relation.cachedPlan)
      case other                    => other.children.flatMap(scans)
    }
    val codesScan = scans(ann.queryExecution.executedPlan)
      .find(_.toString.contains("codes.parquet"))
      .getOrElse(fail("no codes.parquet scan in the serve plan"))
    assert(codesScan.toString.contains("PartitionFilters"),
      "probe list must bind as a partition filter")
    val read = codesScan.metrics("numPartitions").value
    // 2 queries × nProbe 3 probe at most 6 of the 16 cells — the scan must
    // touch only those directories, never the whole index
    assert(read > 0 && read <= 6,
      s"expected <= 6 of 16 cell partitions read, got $read")
    spark.catalog.clearCache()
  }

  test("bundle index: atomic build, ledgered append, serve stable across compaction") {
    val root = java.nio.file.Files.createTempDirectory("graft-annb").toString
    val corpus = embeddings.where(col("vec_id") < 200)
    val base = corpus.where(col("vec_id") % 10 =!= 0)
    val batch = corpus.where(col("vec_id") % 10 === 0)
    val books = trainedBooks
    AnnIndex.writeBundle(base, books, root, "ann", nCentroids = 4,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    // append is ledgered: first lands, replay rejected with index untouched
    assert(AnnIndex.appendBundle(spark, root, "ann", batch, "b1"))
    val nCodes = graft.sources.Catalog
      .readBundleTable(spark, root, "ann", "codes").count()
    assert(!AnnIndex.appendBundle(spark, root, "ann", batch, "b1"),
      "replayed append must be rejected")
    assert(graft.sources.Catalog
      .readBundleTable(spark, root, "ann", "codes").count() == nCodes,
      "replay mutated the index")
    // exhaustive serve equals brute force over the merged corpus — the
    // appended vectors are first-class residents, assigned by the build's
    // own spill read back from the params member
    val q = corpus.where(col("vec_id") < 3)
    def serve() = AnnIndex.knnBundle(spark, root, "ann", corpus, q, k = 5,
      rerank = 500, nProbe = 4).orderBy(col("qid"), col("rank")).collect()
    val got = serve()
    val want = Similarity.bruteForceKnn(corpus, q, k = 5)
      .orderBy(col("qid"), col("rank")).collect()
    assert(got.length == want.length && got.length == 15)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1),
        s"got $g want $w")
    }
    spark.catalog.clearCache()
    // compaction rewrites the delta file sets; serve is bit-identical and
    // the ledger survives (a replay after compaction is still rejected)
    graft.sources.Catalog.compactBundle(spark, root, "ann")
    val post = serve()
    assert(post.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq,
      "serve changed across compaction")
    assert(!AnnIndex.appendBundle(spark, root, "ann", batch, "b1"),
      "compaction must not reopen the ledger")
    spark.catalog.clearCache()
  }

  test("bundle takedown: codes rewritten, quantizer carried by reference, serve equals brute force on the remainder") {
    val root = java.nio.file.Files.createTempDirectory("graft-annrm").toString
    val corpus = embeddings.where(col("vec_id") < 200)
    AnnIndex.writeBundle(corpus, trainedBooks, root, "ann", nCentroids = 4,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    val m1 = graft.sources.Catalog.bundleManifest(spark, root, "ann")
    val rm = corpus.where(col("vec_id") % 10 === 3).select(col("vec_id"))
    AnnIndex.retractBundle(spark, root, "ann", rm)
    val m2 = graft.sources.Catalog.bundleManifest(spark, root, "ann")
    // only codes moved: quantizer/books/params file sets are the SAME
    // manifest references — the takedown never read or rewrote them
    assert(m2.dirs("centroids") == m1.dirs("centroids"))
    assert(m2.dirs("books") == m1.dirs("books"))
    assert(m2.dirs("params") == m1.dirs("params"))
    assert(m2.dirs("codes") != m1.dirs("codes"))
    assert(m2.batches == m1.batches, "takedown must preserve the ledger")
    // exhaustive serve over the post-takedown index = brute force over
    // the REMAINING corpus: a leftover code would surface a removed id,
    // a lost one would drop a survivor
    val q = corpus.where(col("vec_id") < 3)
    val got = AnnIndex.knnBundle(spark, root, "ann", corpus, q, k = 5,
      rerank = 500, nProbe = 4).orderBy(col("qid"), col("rank")).collect()
    val want = Similarity.bruteForceKnn(
        corpus.join(rm, Seq("vec_id"), "left_anti"), q, k = 5)
      .orderBy(col("qid"), col("rank")).collect()
    assert(got.length == want.length && got.length == 15)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1),
        s"got $g want $w")
    }
    spark.catalog.clearCache()
  }

  test("version pinning: serve answers ONE committed version; append encoded against a superseded quantizer fails loudly") {
    import graft.sources.Catalog
    val root = java.nio.file.Files.createTempDirectory("graft-annpin").toString
    val corpus = embeddings.where(col("vec_id") < 200)
    val half = corpus.where(col("vec_id") < 100)
    val books = trainedBooks
    AnnIndex.writeBundle(half, books, root, "ann", nCentroids = 4,
      trainIters = 2, spill = 2, seedBatchIds = Seq("b0"))
    val v1 = Catalog.latestBundleVersion(spark, root, "ann").get
    def exhaustive(c: org.apache.spark.sql.DataFrame,
        version: Option[Long]) =
      AnnIndex.knnBundle(spark, root, "ann", c,
          corpus.where(col("vec_id") < 3), k = 5, rerank = 500, nProbe = 4,
          version = version)
        .orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    val servedV1 = exhaustive(half, None)
    spark.catalog.clearCache()
    // a superseding REBUILD over the full corpus with a retrained
    // quantizer (different codebooks, different centroids)
    val books2 = Embeddings.pqTrain(
      RelOps.hashSample(corpus, "vec_id", 0.4), m = 8, k = 16, iters = 3)
    AnnIndex.writeBundle(corpus, books2, root, "ann", nCentroids = 8,
      trainIters = 3, spill = 1, seedBatchIds = Seq("b0v2"))
    val v2 = Catalog.latestBundleVersion(spark, root, "ann").get
    assert(v2 == v1 + 1)
    // a serve that resolved its version BEFORE the rebuild committed
    // (every member read threads that one version) answers entirely
    // from v1 — never v2 centroids beside v1 codes
    assert(exhaustive(half, Some(v1)) == servedV1,
      "pinned serve mixed versions")
    spark.catalog.clearCache()
    // and the default serve answers entirely from the new latest:
    // exhaustive over v2 (all 8 cells probed) = brute force over the
    // FULL corpus
    val wantV2 = Similarity.bruteForceKnn(corpus,
        corpus.where(col("vec_id") < 3), k = 5)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val gotV2 = AnnIndex.knnBundle(spark, root, "ann", corpus,
        corpus.where(col("vec_id") < 3), k = 5, rerank = 500, nProbe = 8)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotV2 == wantV2, s"got $gotV2 want $wantV2")
    spark.catalog.clearCache()
    // an append whose encode inputs were read at v1 (the superseded
    // quantizer) must FAIL LOUDLY at claim: committing those codes
    // would poison the v2 index with rows no committed quantizer wrote
    val batch = embeddings
      .where(col("vec_id") >= 200 && col("vec_id") < 210)
    val ex = intercept[RuntimeException] {
      AnnIndex.appendBundle(spark, root, "ann", batch, "b1",
        version = Some(v1))
    }
    assert(ex.getMessage.contains("advanced since pinned"),
      s"wrong failure: ${ex.getMessage}")
    assert(!Catalog.bundleManifest(spark, root, "ann").batches.contains("b1"),
      "failed append must not touch the ledger")
    // control: pinning the CURRENT version appends fine, and a later
    // codes-only append does not invalidate a pin on v2's quantizer
    // (only the encode-input members are pinned, not the codes)
    assert(AnnIndex.appendBundle(spark, root, "ann", batch, "b1",
      version = Some(v2)))
    assert(AnnIndex.appendBundle(spark, root, "ann",
      embeddings.where(col("vec_id") >= 210 && col("vec_id") < 220), "b2",
      version = Some(v2)),
      "codes-only appends must still interleave under a quantizer pin")
    spark.catalog.clearCache()
  }

  test("bundle index crash states: half-rebuilt version invisible, old index serves") {
    val root = java.nio.file.Files.createTempDirectory("graft-anncrash").toString
    val corpus = embeddings.where(col("vec_id") < 100)
    AnnIndex.writeBundle(corpus, trainedBooks, root, "ann", nCentroids = 4)
    val q = corpus.where(col("vec_id") < 2)
    val before = AnnIndex.knnBundle(spark, root, "ann", corpus, q, k = 3,
      rerank = 200, nProbe = 4).orderBy(col("qid"), col("rank")).collect()
    spark.catalog.clearCache()
    // a rebuild that crashed AFTER writing new centroids/codes but BEFORE
    // the manifest: the version directory exists with member data, yet
    // stays invisible — the serve still resolves the committed v1, so new
    // centroids can never pair with old codes
    val base = new java.io.File(graft.sources.Catalog.bundleDir(root, "ann"))
    val half = new java.io.File(base, "2")
    corpus.limit(3).select(col("vec_id")).write
      .parquet(s"$half/centroids.parquet")
    val after = AnnIndex.knnBundle(spark, root, "ann", corpus, q, k = 3,
      rerank = 200, nProbe = 4).orderBy(col("qid"), col("rank")).collect()
    assert(after.map(_.toSeq).toSeq == before.map(_.toSeq).toSeq,
      "half-committed rebuild leaked into the serve")
    // the crashed rebuild's slot is reclaimed by the next committer
    AnnIndex.writeBundle(corpus, trainedBooks, root, "ann", nCentroids = 4)
    assert(graft.sources.Catalog.latestBundleVersion(spark, root, "ann")
      .contains(2L), "crashed slot not reclaimed")
    spark.catalog.clearCache()
  }
}
