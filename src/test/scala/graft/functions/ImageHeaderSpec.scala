package graft.functions

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Container-layout unit spec for [[ImageHeader.parse]] — byte arrays built
  * to the public PNG/JPEG/GIF specs, including the malformed shapes a real
  * corpus serves up (truncation, missing SOF, marker fill bytes).
  */
class ImageHeaderSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def dims(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    Option(ImageHeader.parse(bytes)).map(a =>
      (a.getInt(0), a.getInt(1), a.getInt(2)))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val pngSig = Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def png(w: Int, h: Int): Array[Byte] =
    bytes(pngSig ++ Seq(0, 0, 0, 13) ++ "IHDR".map(_.toInt) ++
      Seq(w >> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
        h >> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff,
        8, 6, 0, 0, 0, 1, 2, 3, 4): _*)

  private def jpegSeg(marker: Int, payload: Seq[Int]): Seq[Int] =
    Seq(0xff, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xff) ++
      payload

  private def jpeg(w: Int, h: Int, fill: Boolean = false): Array[Byte] = {
    val app0 = jpegSeg(0xe0, "JFIF".map(_.toInt) ++ Seq(0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val sof0 = jpegSeg(0xc0, Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val pad = if (fill) Seq(0xff, 0xff) else Seq.empty // legal fill bytes
    bytes(Seq(0xff, 0xd8) ++ app0 ++ pad ++ sof0 ++ Seq(0xff, 0xd9): _*)
  }

  private def gif(w: Int, h: Int, v: Char = '9'): Array[Byte] =
    bytes("GIF8".map(_.toInt) ++ Seq(v.toInt, 'a'.toInt,
      w & 0xff, w >> 8, h & 0xff, h >> 8, 0xf7, 0, 0): _*)

  test("PNG IHDR big-endian dims") {
    dims(png(640, 480)) shouldBe Some((ImageHeader.PNG, 640, 480))
    dims(png(70000, 3)) shouldBe Some((ImageHeader.PNG, 70000, 3))
  }

  test("PNG rejects truncation and a non-IHDR first chunk") {
    dims(png(640, 480).take(20)) shouldBe None
    val bad = png(640, 480); bad(12) = 'X'.toByte
    dims(bad) shouldBe None
  }

  test("JPEG walks APP0 to SOF0, height before width") {
    dims(jpeg(1024, 768)) shouldBe Some((ImageHeader.JPEG, 1024, 768))
  }

  test("JPEG tolerates FF fill bytes before a marker") {
    dims(jpeg(320, 200, fill = true)) shouldBe
      Some((ImageHeader.JPEG, 320, 200))
  }

  test("JPEG with no SOF before EOI/scan returns null") {
    val noSof = bytes(Seq(0xff, 0xd8) ++
      jpegSeg(0xe0, Seq(1, 2, 3, 4)) ++ Seq(0xff, 0xd9): _*)
    dims(noSof) shouldBe None
    // C4 (DHT) is NOT a frame header even though it sits in C0-CF
    val dht = bytes(Seq(0xff, 0xd8) ++
      jpegSeg(0xc4, Seq(0, 1, 2, 3, 4, 5, 6)) ++ Seq(0xff, 0xd9): _*)
    dims(dht) shouldBe None
  }

  test("GIF little-endian dims, both versions") {
    dims(gif(800, 600)) shouldBe Some((ImageHeader.GIF, 800, 600))
    dims(gif(2, 1, v = '7')) shouldBe Some((ImageHeader.GIF, 2, 1))
  }

  test("garbage, short, and null inputs return null") {
    dims(null) shouldBe None
    dims(Array.emptyByteArray) shouldBe None
    dims("plain ascii text".getBytes("UTF-8")) shouldBe None
    dims(bytes(0x89, 0x50)) shouldBe None
  }

  test("never throws on arbitrary bytes (corpus-scale crash safety)") {
    // a crashing row kills a 10-hour job; the parser's contract is
    // null-not-throw on EVERY input. Deterministic pseudo-random fuzz —
    // seeded, so a failure reproduces.
    val rnd = new scala.util.Random(0xdecaf)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      ImageHeader.parse(b) // must not throw
    }
    // adversarial prefixes: every truncation of each valid header must
    // return null or the correct dims, never garbage or an exception
    Seq(png(640, 480), jpeg(1024, 768), gif(800, 600)).foreach { full =>
      val want = dims(full)
      (0 to full.length).foreach { k =>
        val got = dims(full.take(k))
        assert(got.isEmpty || got == want, s"prefix $k of ${want.get}: $got")
      }
    }
  }

  test("trailing junk after a valid header never changes the result") {
    val rnd = new scala.util.Random(0xfeed)
    Seq(png(12, 34), jpeg(56, 78), gif(90, 12)).foreach { full =>
      val want = dims(full)
      (1 to 50).foreach { _ =>
        val junk = new Array[Byte](rnd.nextInt(40)); rnd.nextBytes(junk)
        dims(full ++ junk) shouldBe want
      }
    }
  }

  test("byte_stats: exact features on known inputs, codegen agreement") {
    def st(b: Array[Byte]): Seq[Long] =
      ByteStats.compute(b).toLongArray().toSeq
    // "aab": n=3, distinct=2, modal 'a' (2), chi2 = (512-3)^2 + (256-3)^2
    //        + 254*9
    st("aab".getBytes("UTF-8")) shouldBe
      Seq(3L, 2L, 'a'.toLong, 2L, 509L * 509 + 253L * 253 + 254L * 9)
    // modal tie ("ab") breaks to the smaller byte value
    st("ba".getBytes("UTF-8"))(2) shouldBe 'a'.toLong
    // perfectly uniform 256-byte payload scores chi2 = 0
    st((0 until 256).map(_.toByte).toArray) shouldBe
      Seq(256L, 256L, 0L, 1L, 0L)
    // empty payload is well-defined, not a crash
    st(Array.emptyByteArray) shouldBe Seq(0L, 0L, 0L, 0L, 0L)

    // codegen path agrees with the static kernel
    VectorFunctions.register(spark)
    import spark.implicits._
    val got = Seq(Tuple1("aab".getBytes("UTF-8"))).toDF("p")
      .select(VectorFunctions.byte_stats(F.col("p")))
      .head().getSeq[Long](0)
    got shouldBe st("aab".getBytes("UTF-8"))
  }

  test("byte_stats agrees with a naive reference on random payloads") {
    val rnd = new scala.util.Random(0xbeef)
    (1 to 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b)
      val got = ByteStats.compute(b).toLongArray().toSeq
      // independently derived: grouped counts, no shared arithmetic
      val counts = b.map(_ & 0xff).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = b.length.toLong
      val modal = if (counts.isEmpty) 0L
        else counts.toSeq.sortBy { case (v, c) => (-c, v) }.head._1.toLong
      val chi2 = (0 until 256).map { v =>
        val d = 256L * counts.getOrElse(v, 0L) - n; d * d
      }.sum
      got shouldBe Seq(n, counts.size.toLong, modal,
        counts.values.maxOption.getOrElse(0L), chi2)
    }
  }

  test("random valid headers parse to exactly their encoded dims") {
    val rnd = new scala.util.Random(0xcafe)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(65535); val h = 1 + rnd.nextInt(65535)
      dims(jpeg(w, h)) shouldBe Some((ImageHeader.JPEG, w, h))
      dims(gif(w, h)) shouldBe Some((ImageHeader.GIF, w, h))
      // PNG dims are 32-bit: also cover values beyond uint16
      val pw = 1 + rnd.nextInt(1 << 24); val ph = 1 + rnd.nextInt(1 << 24)
      dims(png(pw, ph)) shouldBe Some((ImageHeader.PNG, pw, ph))
    }
  }

  test("expression agrees with parse under codegen over a DataFrame") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, png(123, 45)), (2L, jpeg(77, 88)), (3L, gif(9, 10)),
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(F.col("id"), VectorFunctions.image_dims(F.col("payload")).as("d"))
      .orderBy("id")
    val rows = df.collect().map(r =>
      r.getLong(0) -> Option(r.getSeq[Int](1)).map(_.toList))
    rows shouldBe Array(
      1L -> Some(List(ImageHeader.PNG, 123, 45)),
      2L -> Some(List(ImageHeader.JPEG, 77, 88)),
      3L -> Some(List(ImageHeader.GIF, 9, 10)),
      4L -> None)
  }
}
