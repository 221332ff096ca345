package graft

import org.apache.spark.sql.functions.col

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

  test("q116 resize: output pixels equal driver-pooled source pixels; PNG round-trip; deterministic") {
    import spark.implicits._
    val resized = Multimodal.resizeImages(Multimodal.imageTable(spark, sf))
      .collect()
    assert(resized.nonEmpty)
    resized.take(25).foreach { rz =>
      assert(rz.new_width === (rz.width + 1) / 2)
      assert(rz.new_height === (rz.height + 1) / 2)
      // decode the OUTPUT PNG and compare every pixel against a
      // driver-side pool of the deterministic source function — this
      // crosses decode → pool → encode → decode, so any lossy or
      // nondeterministic step fails it
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rz.payload))
      assert(img.getWidth === rz.new_width && img.getHeight === rz.new_height)
      for (cy <- 0 until rz.new_height; cx <- 0 until rz.new_width) {
        var r = 0; var g = 0; var b = 0; var n = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val (x, y) = (cx * 2 + dx, cy * 2 + dy)
          if (x < rz.width && y < rz.height) {
            val rgb = Multimodal.pixel(rz.doc_id, x, y)
            r += (rgb >> 16) & 0xFF; g += (rgb >> 8) & 0xFF; b += rgb & 0xFF
            n += 1
          }
        }
        val want = ((r / n) << 16) | ((g / n) << 8) | (b / n)
        assert((img.getRGB(cx, cy) & 0xFFFFFF) === want,
          s"doc ${rz.doc_id} cell ($cx,$cy)")
      }
    }
    // the gate relation is bit-stable across runs
    val a = Multimodal.q116(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.q116(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("q117 frame sampling: exact indices and lumas; skipped frames are never decoded") {
    import spark.implicits._
    val rows = Multimodal.q117(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, fs) =>
      val nFrames = 4 + (id % 7).toInt
      // exactly frames 0, 3, 6, ... of this doc's frame count
      assert(fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
        === (0 until nFrames by 3).toSeq)
      fs.foreach { f =>
        val idx = f.getAs[Int]("frame_idx")
        // exact integer luma from the deterministic pixel function
        var want = 0L
        for (y <- 0 until Multimodal.FrameDim; x <- 0 until Multimodal.FrameDim) {
          val rgb = Multimodal.pixel(id ^ ((idx + 1).toLong << 40), x, y)
          want += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        }
        assert(f.getAs[Long]("luma") === want, s"doc $id frame $idx")
      }
    }
    // seek-don't-decode: corrupt a SKIPPED frame's bytes (valid length
    // prefix, garbage payload) — sampling must still succeed because
    // the walk skips it by length; corrupting a SAMPLED frame must
    // throw. This pins the O(1)-skip contract, not just the output.
    def corrupt(v: Multimodal.VideoItem, target: Int): Multimodal.VideoItem = {
      val buf = java.nio.ByteBuffer.wrap(v.payload.clone())
      val n = buf.getInt()
      var f = 0
      while (f < n) {
        val len = buf.getInt()
        if (f == target) {
          val garbage = Array.fill[Byte](len)(0x5A)
          buf.put(garbage)
        } else buf.position(buf.position() + len)
        f += 1
      }
      v.copy(payload = buf.array())
    }
    val one = Multimodal.videoTable(spark, sf)
      .filter(col("n_frames") >= 5).limit(1).collect().head
    val skippedCorrupt = spark.createDataset(Seq(corrupt(one, 1)))
    val ok = Multimodal.sampleFrameRows(skippedCorrupt, everyK = 3).collect()
    assert(ok.map(_.frame_idx).sorted.toSeq
      === (0 until one.n_frames by 3).toSeq)
    val sampledCorrupt = spark.createDataset(Seq(corrupt(one, 3)))
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrameRows(sampledCorrupt, everyK = 3).collect()
    }
  }

  test("q118 audio windows: exact integer features equal a driver recompute; PCM parse round-trips") {
    val rows = Multimodal.q118(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, ws) =>
      val n = 2000 + (id % 2096).toInt
      val wsz = Multimodal.AudioWindowSize
      assert(ws.length === (n + wsz - 1) / wsz)
      assert(ws.map(_.getAs[Int]("n_samples")).sum === n)
    }
    // driver recompute straight from the sample function — the PCM
    // byte serialization and parse must be transparent to features
    byDoc.take(20).foreach { case (id, ws) =>
      val n = 2000 + (id % 2096).toInt
      val samples = Array.tabulate(n)(Multimodal.pcmSample(id, _).toInt)
      ws.sortBy(_.getAs[Int]("window_idx")).foreach { w =>
        val start = w.getAs[Int]("window_idx") * Multimodal.AudioWindowSize
        val slice = samples.slice(start, start + w.getAs[Int]("n_samples"))
        assert(w.getAs[Long]("energy")
          === slice.map(x => x.toLong * x).sum, s"doc $id win $w energy")
        assert(w.getAs[Int]("peak") === slice.map(math.abs).max)
        val signs = slice.map(Integer.signum).filter(_ != 0)
        val zcr = signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
        assert(w.getAs[Int]("zcr") === zcr, s"doc $id win $w zcr")
      }
    }
    // windows carry real signal: energy and crossings both nonzero
    // somewhere (the synth isn't degenerate)
    assert(rows.exists(_.getAs[Long]("energy") > 0L))
    assert(rows.exists(_.getAs[Int]("zcr") > 0))
  }

  test("q119 banded phash pairs are bit-equal an all-pairs brute force " +
      "in the full-recall zone and a subset of it at the edge") {
    val hashes = Multimodal.imageHashes(Multimodal.photoTable(spark, sf))
      .collect()
    assert(hashes.length % 2 === 0) // one src + one thumb per doc
    val brute = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      a = if (hashes(i).img_id < hashes(j).img_id) hashes(i) else hashes(j)
      b = if (hashes(i).img_id < hashes(j).img_id) hashes(j) else hashes(i)
      d = java.lang.Long.bitCount(a.phash ^ b.phash)
      if d <= Multimodal.PhashMaxHamming
    } yield (a.img_id, b.img_id, d.toLong)).toSet
    val got = Multimodal.q119(spark, sf).collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"),
        r.getAs[Long]("hamming"))).toSet
    // pigeonhole: 8 bands × 8 bits ⇒ every pair at hamming ≤ 7 shares
    // a band — the banded join CANNOT miss one
    assert(got.filter(_._3 <= 7) === brute.filter(_._3 <= 7))
    // at exactly 8 the join is probabilistic but never invents pairs
    assert(got.subsetOf(brute))
    // hamming values themselves are the true bit distances
    got.foreach { case (ia, ib, d) =>
      val ha = hashes.find(_.img_id == ia).get.phash
      val hb = hashes.find(_.img_id == ib).get.phash
      assert(java.lang.Long.bitCount(ha ^ hb).toLong === d)
    }
  }

  test("q119 folds renditions: a source and its own 2x-pooled thumbnail " +
      "are near-dups for nearly every image") {
    val hashes = Multimodal.imageHashes(Multimodal.photoTable(spark, sf))
      .collect()
    val byDoc = hashes.groupBy(_.doc_id)
    val dists = byDoc.values.map { pair =>
      assert(pair.map(_.variant).toSet === Set("src", "thumb"))
      java.lang.Long.bitCount(pair(0).phash ^ pair(1).phash)
    }.toSeq
    // dHash's whole point: resolution changes barely move the hash.
    // Pooling round-off can flip a bit where adjacent cells near-tie,
    // so "nearly every", not "every" — measured, the flip rate is a
    // few bits in 64.
    val within = dists.count(_ <= Multimodal.PhashMaxHamming)
    assert(within.toDouble / dists.size >= 0.9,
      s"only $within/${dists.size} (src, thumb) pairs within " +
        s"hamming ${Multimodal.PhashMaxHamming}")
    // and the pairs actually surface in the operator output
    val got = Multimodal.q119(spark, sf).collect()
    val selfPairs = got.count(r =>
      r.getAs[Long]("doc_a") === r.getAs[Long]("doc_b"))
    assert(selfPairs >= (dists.size * 9) / 10)
  }

  test("q119 hot-band cap: a constant boilerplate band tombstones instead of " +
      "all-pairing; sub-cap bands keep full recall") {
    import spark.implicits._
    // 60 images in 30 near-dup pairs: band 0 (low byte) is the SAME
    // 0xAA for every image (the constant-color boilerplate row);
    // bands 1-6 are pair-unique (derived from the pair index), and
    // the two renditions of a pair differ by exactly one bit in band
    // 7 → true pairs are (2i, 2i+1) at hamming 1, sharing bands 0-6;
    // CROSS-pair agreement is band 0 only.
    def h(pair: Long, flip: Boolean): Long = {
      var v = 0xAAL // band 0: constant
      for (j <- 1 to 6) // pseudo-random sub-cap bands
        v |= ((pair * 2654435761L + j * 40503L) >>> 13 & 0xFFL) << (8 * j)
      v |= (if (flip) 0x81L else 0x80L) << 56 // band 7: 1-bit delta
      v
    }
    val planted = (0L until 30L).flatMap(p => Seq(
      (2 * p, p, "src", h(p, flip = false)),
      (2 * p + 1, p, "thumb", h(p, flip = true))))
    val hashes = planted
      .toDF("img_id", "doc_id", "variant", "phash")
    // driver truth, from first principles: a pair surfaces iff
    // hamming ≤ max AND it shares ≥ 1 band whose bucket is ≤ cap
    def bandsOf(v: Long) = (0 until 8).map(j => (j, (v >>> (8 * j)) & 0xFFL))
    val bucketN = planted.flatMap(r => bandsOf(r._4))
      .groupBy(identity).view.mapValues(_.size).toMap
    def want(cap: Int) = (for {
      i <- planted.indices.iterator
      j <- (i + 1) until planted.length
      d = java.lang.Long.bitCount(planted(i)._4 ^ planted(j)._4)
      if d <= Multimodal.PhashMaxHamming
      shared = bandsOf(planted(i)._4).toSet
        .intersect(bandsOf(planted(j)._4).toSet)
      if shared.exists(b => bucketN(b) <= cap)
    } yield (planted(i)._1, planted(j)._1, d.toLong)).toSet
    def got(cap: Int) = Multimodal.phashPairsOf(hashes, bandDfCap = cap)
      .collect().map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"),
        r.getAs[Long]("hamming"))).toSet
    // capped: band 0's 60-image bucket (> cap 10) tombstones map-side,
    // true pairs still surface through their sub-cap shared bands —
    // no bucket ever materializes the corpus
    assert(got(10) === want(10))
    val selfPairs = (0L until 30L).map(p => (2 * p, 2 * p + 1, 1L)).toSet
    assert(selfPairs.subsetOf(got(10)),
      "a planted rendition pair fell to the hot-band cap")
    // uncapped: the full-recall contract over every band
    assert(got(1000000) === want(1000000))
    // the honest edge, pinned: if EVERY band is boilerplate (all 60
    // images identical), every bucket tombstones and the capped run
    // reports nothing — corpus-wide identical imagery is exact-dedup's
    // (q30) job, exactly like q31's stop-shingle contract
    val allSame = (0L until 60L).map(i => (i, i / 2,
        if (i % 2 == 0) "src" else "thumb", 0x5555555555555555L))
      .toDF("img_id", "doc_id", "variant", "phash")
    assert(Multimodal.phashPairsOf(allSame, bandDfCap = 10).isEmpty)
  }

  test("dHash is bit-deterministic across runs and partitionings") {
    val a = Multimodal.imageHashes(Multimodal.photoTable(spark, sf))
      .collect().map(h => h.img_id -> h.phash).toMap
    val b = Multimodal.imageHashes(
        Multimodal.photoTable(spark, sf).repartition(7))
      .collect().map(h => h.img_id -> h.phash).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1) // hashes carry real signal
  }
}
