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

  test("PNG encode→decode is lossless: decoded pixels equal the source function") {
    val items = Multimodal.imageTable(spark, sf).collect()
    assert(items.nonEmpty)
    // PNG magic bytes — these are real encoded images, not stubs
    items.foreach { im =>
      assert((im.payload(0) & 0xFF) === 0x89 && im.payload(1) === 'P'.toByte)
    }
    items.take(5).foreach { im =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(im.payload))
      assert(img.getWidth === im.width && img.getHeight === im.height)
      for (y <- 0 until im.height; x <- 0 until im.width)
        assert((img.getRGB(x, y) & 0xFFFFFF) ===
          Multimodal.pixel(im.doc_id, x, y),
          s"pixel ($x,$y) of doc ${im.doc_id} corrupted in round-trip")
    }
  }

  test("q71 image features match a direct recomputation that never touches PNG") {
    val got = Multimodal.decodeImageFeatures(
      Multimodal.imageTable(spark, sf)).collect()
    assert(got.nonEmpty)
    val g = Multimodal.GridDim
    got.foreach { f =>
      // recompute features straight from the pixel function — equality
      // proves the encode→decode→extract path is bit-faithful
      val sums = new Array[Long](g * g); val counts = new Array[Long](g * g)
      for (y <- 0 until f.height; x <- 0 until f.width) {
        val rgb = Multimodal.pixel(f.doc_id, x, y)
        val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        val c = (y * g / f.height) * g + (x * g / f.width)
        sums(c) += lum; counts(c) += 1
      }
      val want = Array.tabulate(g * g)(i =>
        (sums(i).toDouble / (3.0 * counts(i))).toFloat)
      assert(f.features.sameElements(want), s"doc ${f.doc_id} features drifted")
    }
  }
}
