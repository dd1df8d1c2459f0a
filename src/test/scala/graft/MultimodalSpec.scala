package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(
    spark, spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet"))

  test("assetsFromDocuments produces the binary+metadata schema") {
    val s = assets.schema
    assert(s("bytes").dataType.typeName === "binary")
    assert(assets.count() > 0)
    val kinds = assets.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("extractFeatures: deterministic fixed-width vectors, byte counts real") {
    val f1 = Multimodal.extractFeatures(assets, dims = 16).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, dims = 16).collect().sortBy(_.asset_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("decodeStub differs across payloads, stable per payload") {
    val a = Multimodal.decodeStub("abc".getBytes, 8).toSeq
    assert(a === Multimodal.decodeStub("abc".getBytes, 8).toSeq)
    assert(a !== Multimodal.decodeStub("abd".getBytes, 8).toSeq)
  }

  test("sampleFrames emits duration/step frames for videos only") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    val byAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    val videos = assets.filter(_.kind == "video").collect()
    assert(videos.forall(v => byAsset.get(v.asset_id).contains(v.duration_ms / 1000)))
    val nonVideo = assets.filter(_.kind != "video").map(_.asset_id).collect().toSet
    assert(byAsset.keySet.intersect(nonVideo).isEmpty)
  }

  test("resize rewrites image metadata only") {
    val out = Multimodal.resize(assets, 224, 224)
    assert(out.filter(a => a.kind == "image" && a.width != 224).count() === 0)
    assert(out.filter(a => a.kind == "video" && a.width == 224).count() === 0)
  }
}
