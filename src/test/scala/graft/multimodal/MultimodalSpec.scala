package graft.multimodal

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class MultimodalSpec extends AnyWordSpec with Matchers with SparkSpec {

  "StubDecoder" should {
    "decode a distributed asset Dataset with batched mapPartitions" in {
      import spark.implicits._
      val n = 200 // > BatchSize so grouping actually batches
      val assets = spark.createDataset((0 until n).map { i =>
        RawAsset(i.toLong, s"payload-$i".getBytes("UTF-8"), "img/fake",
          64 + i, 32 + i, 3)
      }).repartition(3)

      val decoded = StubDecoder.decodeAssets(assets)

      // Encoder-derived schema is the typed contract of the decode stage.
      decoded.schema.fieldNames.toSeq shouldBe
        Seq("docId", "fmt", "width", "height", "nBytes", "features")
      val rows = decoded.collect().sortBy(_.docId)
      rows should have length n.toLong
      val r0 = rows.head
      r0.nBytes shouldBe "payload-0".getBytes("UTF-8").length
      r0.features.length shouldBe 4
      r0.features(0) shouldBe 64f
      r0.features(1) shouldBe 32f
      r0.features(2) shouldBe 2f
      // deterministic fake "mean pixel"
      val exp = "payload-0".getBytes("UTF-8").map(_ & 0xff).sum.toFloat /
        "payload-0".length
      r0.features(3) shouldBe exp
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
        RawAsset(i.toLong, Array.fill(i + 1)(i.toByte), "img/fake", 10, 10, 1)
      }
      val a = StubDecoder.decodeAssets(spark.createDataset(assets).repartition(1))
        .collect().sortBy(_.docId).map(d => (d.docId, d.features.toSeq))
      val b = StubDecoder.decodeAssets(spark.createDataset(assets).repartition(7))
        .collect().sortBy(_.docId).map(d => (d.docId, d.features.toSeq))
      a shouldBe b
    }
  }
}
