package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("asset table: binary payload + typed metadata struct") {
    val a = Multimodal.assets(spark, dir)
    val t = a.schema("payload").dataType.typeName
    assert(t == "binary")
    assert(a.schema("meta").dataType.typeName == "struct")
    assert(a.count() == 500)
  }

  test("stub decode is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(spark, dir).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(spark, dir).collect().sortBy(_.asset_id)
    assert(f1.length == 500)
    assert(f1.head.features.length == 8)
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // n_bytes is the real payload size, not stubbed
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("frame sampling slices video payloads with stride") {
    val frames = Multimodal.frameSample(spark, dir, frameBytes = 64, stride = 4).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.getLong(0))
    byAsset.values.foreach { fs =>
      val idxs = fs.map(_.getLong(1)).sorted.toSeq
      assert(idxs.head == 0L && idxs.sliding(2).forall {
        case Seq(a, b) => b - a == 4L; case _ => true })
    }
  }
}
