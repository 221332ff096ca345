package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { item =>
      assert(item.payload.length.toLong === item.n_bytes)
      assert(Set("image/fake", "audio/fake", "video/fake")(item.media_type))
    }
  }

  test("feature extraction: fixed dim, L1≈1, video frame-sampled") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect()
    f.foreach { r =>
      assert(r.features.length === Multimodal.FeatureDim)
      val l1 = r.features.sum
      assert(math.abs(l1 - 1f) < 1e-3, s"L1=$l1 for ${r.doc_id}")
      if (r.media_type == "video/fake") assert(r.n_frames >= 1)
      else assert(r.n_frames === 1)
    }
    // videos with >256B payloads sample multiple frames
    assert(f.exists(r => r.media_type == "video/fake" && r.n_frames > 1))
  }

  test("q70 is deterministic across runs") {
    val a = Multimodal.q70(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.q70(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
