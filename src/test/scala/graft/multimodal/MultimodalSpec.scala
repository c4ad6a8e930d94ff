package graft.multimodal

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class MultimodalSpec extends AnyWordSpec with Matchers with SparkSpec {

  "the multimodal operators" should {
    "analyze WAV assets with batched mapPartitions (distributed, > BatchSize)" in {
      import spark.implicits._
      val n = 200 // > BatchSize so grouping actually batches
      val assets = spark.createDataset((0 until n).map { i =>
        // 128 samples = 2 windows of 64; a pure alternating-sign square
        // wave of amplitude i+1 has known features in every window
        val amp = (i + 1).toShort
        val samples = Array.tabulate[Short](128)(j =>
          (if (j % 2 == 0) amp else (-amp).toShort))
        RawAsset(i.toLong, Wav.encode(8000, samples), "aud/wav", 0, 0, 1)
      }).repartition(3)

      val rows = Wav.analyzeAssets(assets, 64).collect()
        .sortBy(r => (r.docId, r.win))
      // Encoder-derived schema is the typed contract of the analyze stage.
      Wav.analyzeAssets(assets, 64).schema.fieldNames.toSeq shouldBe
        Seq("docId", "win", "nBytes", "sumsq", "crossings", "peak")
      rows should have length (2 * n).toLong
      val r0 = rows.filter(_.docId == 4L)
      r0.map(_.win).toSeq shouldBe Seq(0, 1)
      // every sample of doc 4 is ±5: energy 64*25, 63 strict sign flips
      all(r0.map(_.sumsq)) shouldBe 64L * 25
      all(r0.map(_.crossings)) shouldBe 63L
      all(r0.map(_.peak)) shouldBe 5L
      all(rows.map(_.nBytes)) shouldBe Wav.HeaderBytes + 256
    }

    "resize real BMP payloads end-to-end through the distributed operator" in {
      import spark.implicits._
      // two real 24-bpp BMPs: a 10x6 downscale case and a 3x2 upscale case
      // (3*3=9 bytes/row -> 12-byte padded stride, the non-trivial class)
      val pixA = Array.tabulate(10 * 6 * 3)(i => (i % 251).toByte)
      val pixB = Array.tabulate(3 * 2 * 3)(i => (7 * i + 1).toByte)
      val assets = spark.createDataset(Seq(
        RawAsset(1L, Bmp.encode(10, 6, pixA), "img/bmp", 10, 6, 3),
        RawAsset(2L, Bmp.encode(3, 2, pixB), "img/bmp", 3, 2, 3)))
        .repartition(2)
      val out = Bmp.resizeAssets(assets, 4, 4).collect().sortBy(_.docId)
      out.map(_.pix.length).toSeq shouldBe Seq(48, 48) // 4*4*3
      out.map(r => (r.srcW, r.srcH)).toSeq shouldBe Seq((10, 6), (3, 2))
      out.map(_.srcBytes).toSeq shouldBe
        Seq(Bmp.HeaderBytes + 32 * 6, Bmp.HeaderBytes + 12 * 2)
      // resized output BMP: 4*3=12 bytes/row, already 4-aligned
      out.map(_.nBytes).toSeq shouldBe Seq(Bmp.HeaderBytes + 12 * 4,
        Bmp.HeaderBytes + 12 * 4)
      // the round-tripped pixels equal a driver-side resample of the source
      out.head.pix shouldBe Bmp.resizeNearest(10, 6, pixA, 4, 4)
      out(1).pix shouldBe Bmp.resizeNearest(3, 2, pixB, 4, 4)
    }

    "sample every Nth REAL AVI frame through the distributed operator" in {
      import spark.implicits._
      // 5 frames of 5x3 (15 bytes/row -> 16-byte padded stride, the
      // non-trivial class); keep frames 0, 2, 4
      val frames = (0 until 5).map(f =>
        Array.tabulate(5 * 3 * 3)(j => (f * 37 + j).toByte))
      val assets = spark.createDataset(Seq(
        RawAsset(3L, Avi.encode(5, 3, 25, frames), "vid/avi", 5, 3, 3)))
      val out = Avi.sampleFrames(assets, 2).collect().sortBy(_.frameIdx)
      out.map(_.frameIdx).toSeq shouldBe Seq(0, 2, 4)
      out.map(r => (r.w, r.h)).distinct.toSeq shouldBe Seq((5, 3))
      out.zip(Seq(0, 2, 4)).foreach { case (vf, f) =>
        vf.pix shouldBe frames(f)
      }
    }

    "compute inter-frame motion on real AVI frames" in {
      import spark.implicits._
      // frame 0 all zeros; frame 1 all 3s; frame 2: one byte jumps to 103
      val z = Array.fill[Byte](2 * 2 * 3)(0)
      val threes = Array.fill[Byte](2 * 2 * 3)(3)
      val spike = threes.clone(); spike(7) = 103.toByte
      val assets = spark.createDataset(Seq(
        RawAsset(11L, Avi.encode(2, 2, 25, Seq(z, threes, spike)),
          "vid/avi", 2, 2, 3)))
      val out = Avi.frameMotion(assets).collect().sortBy(_.frameIdx)
      out.map(_.frameIdx).toSeq shouldBe Seq(1, 2)
      // 12 bytes each moving 0->3; then one byte 3->103
      out.map(_.motion).toSeq shouldBe Seq(36L, 100L)
      out.map(_.peakDiff).toSeq shouldBe Seq(3L, 100L)
    }

    "sample every Nth fixed-size frame from a payload" in {
      import spark.implicits._
      // 10 frames of 8 bytes + one 4-byte tail frame
      val payload = Array.tabulate(84)(_.toByte)
      val assets = spark.createDataset(Seq(
        RawAsset(9L, payload, "vid/fake", 0, 0, 1))).repartition(2)
      val frames = StubDecoder.sampleFrames(assets, frameBytes = 8, everyN = 3)
        .collect().sortBy(_.frameIdx)
      frames.map(_.frameIdx).toSeq shouldBe Seq(0, 3, 6, 9)
      frames.map(_.nBytes).toSeq shouldBe Seq(8, 8, 8, 8)
      // hash matches a locally computed md5 of the same slice
      val md = java.security.MessageDigest.getInstance("MD5")
      val exp = md.digest(payload.slice(24, 32)).map(b => f"$b%02x").mkString
      frames.find(_.frameIdx == 3).get.frameHash shouldBe exp
    }

    "preserve per-row determinism independent of partitioning" in {
      import spark.implicits._
      val assets = (0 until 50).map { i =>
        val pix = Array.tabulate((3 + i % 5) * 2 * 3)(j => (i * 31 + j).toByte)
        RawAsset(i.toLong, Bmp.encode(3 + i % 5, 2, pix), "img/bmp",
          3 + i % 5, 2, 3)
      }
      val a = Bmp.decodeFeatures(spark.createDataset(assets).repartition(1))
        .collect().sortBy(_.docId)
        .map(f => (f.docId, f.w, f.h, f.sumB, f.sumG, f.sumR, f.peak))
      val b = Bmp.decodeFeatures(spark.createDataset(assets).repartition(7))
        .collect().sortBy(_.docId)
        .map(f => (f.docId, f.w, f.h, f.sumB, f.sumG, f.sumR, f.peak))
      a shouldBe b
      // channel sums re-derivable on the driver from the raw pixels
      val i0 = 7
      val pix = Array.tabulate((3 + i0 % 5) * 2 * 3)(j => (i0 * 31 + j).toByte)
      a(i0)._4 shouldBe pix.indices.filter(_ % 3 == 0).map(pix(_) & 0xff).sum.toLong
      a(i0)._7 shouldBe pix.map(_ & 0xff).max.toLong
    }
  }
}
