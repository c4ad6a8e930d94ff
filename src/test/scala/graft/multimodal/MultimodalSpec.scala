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

    "resize payloads to the target size contract" in {
      import spark.implicits._
      val assets = spark.createDataset(Seq(
        RawAsset(1L, Array.tabulate(300)(_.toByte), "img/fake", 10, 10, 3),
        RawAsset(2L, Array.emptyByteArray, "img/fake", 0, 0, 3)))
      val resized = StubDecoder.resizeAssets(assets, 4, 4).collect().sortBy(_.docId)
      resized.map(_.payload.length).toSeq shouldBe Seq(48, 48) // 4*4*3
      resized.head.width shouldBe 4
      // nearest-neighbor stub is deterministic: first output byte maps to
      // source index 0, last to index (47*300/48)
      resized.head.payload(0) shouldBe 0.toByte
      resized.head.payload(47) shouldBe (47L * 300 / 48).toByte
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
