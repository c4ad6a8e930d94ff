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
