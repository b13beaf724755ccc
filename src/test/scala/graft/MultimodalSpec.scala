package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))

  test("assets table has the multimodal schema: opaque binary + typed metadata") {
    val sch = assets.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("kind").dataType.typeName == "string")
    assert(assets.select("kind").distinct().count() == 4)
  }

  test("feature extraction: normalized 16-bin histogram, deterministic") {
    val f = Multimodal.extractFeatures(spark, assets)
    val rows = f.limit(20).collect()
    rows.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0) < 1e-9)
      assert(r.n_bytes > 0)
    }
    val again = Multimodal.extractFeatures(spark, assets).limit(20).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("frame sampling covers the payload with the configured stride") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 64)
    val one = frames.filter($"asset_id" === 1L).count()
    val expected = assets.filter($"asset_id" === 1L)
      .select(greatest(expr("length(payload) div 64"), lit(1)).cast("long"))
      .head().getLong(0)
    assert(one == expected)
  }
}
