package graft.multimodal

import org.apache.spark.sql.Dataset

import scala.util.Try

/** Probe result for one asset: did its container decode, and how many
  * content units (pixels / samples / frames) does it hold.
  */
final case class MediaProbe(
    docId: Long,
    fmt: String,
    ok: Boolean,
    units: Long)

/** Mixed-modality payload probe — the first stage of a media ingest:
  * route every payload through the codec its metadata claims, record the
  * content-unit count on success, and QUARANTINE failures instead of
  * letting them kill the task (decode totality — success or
  * IllegalArgumentException, CodecFuzzLaws — is what makes the Try here
  * sound: no error class escapes the row boundary). At corpus scale the
  * quarantine stream feeds a triage table; the good stream carries real
  * decoded inventory counts for downstream planning.
  *
  * Scale notes: narrow per-row work, one pass, no shuffle; same batched
  * mapPartitions shape as the rest of the family.
  */
/** A probed asset with its payload retained: the router row the
  * end-to-end media pipeline branches on — downstream per-modality
  * operators filter `ok && fmt` and feed the payload straight to the
  * real codec, all inside one lazy DataFrame job (no driver round-trip
  * between probe and feature extraction).
  */
final case class RoutedAsset(
    docId: Long,
    fmt: String,
    ok: Boolean,
    payload: Array[Byte],
    width: Int,
    height: Int,
    channels: Int)

object Probe {

  /** Probe AND keep the payload: quarantine routing as a narrow one-pass
    * tag, so the per-modality branches are plain filters over the tagged
    * stream (each branch re-decodes through its real codec — payload
    * bytes are touched twice, shuffled never).
    */
  def routeAssets(assets: Dataset[RawAsset]): Dataset[RoutedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val ok = Try {
          a.fmt match {
            case "img/bmp" => Bmp.decode(a.payload)
            case "img/png" => Png.decode(a.payload)
            case "img/gif" => Gif.decode(a.payload)
            case "img/jpeg" => Jpeg.decode(a.payload)
            case "aud/wav" => Wav.decode(a.payload)
            case "aud/mulaw" => Wav.decodeMulaw(a.payload)
            case "aud/adpcm" => Adpcm.decode(a.payload)
            case "aud/flac" => Flac.decode(a.payload)
            case "vid/avi" => Avi.decode(a.payload)
            case "vid/mjpeg" => Avi.decodeMjpeg(a.payload)
            case other =>
              throw new IllegalArgumentException(s"unknown format $other")
          }
        }.isSuccess
        RoutedAsset(a.docId, a.fmt, ok, a.payload, a.width, a.height,
          a.channels)
      })
    }
  }

  def probeAssets(assets: Dataset[RawAsset]): Dataset[MediaProbe] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val units = Try {
          a.fmt match {
            case "img/bmp" =>
              val (w, h, _) = Bmp.decode(a.payload); w.toLong * h
            case "img/png" =>
              val (w, h, _) = Png.decode(a.payload); w.toLong * h
            case "img/gif" =>
              val (w, h, _) = Gif.decode(a.payload); w.toLong * h
            case "img/jpeg" =>
              val (w, h, _) = Jpeg.decode(a.payload); w.toLong * h
            case "aud/wav" =>
              val (_, samples) = Wav.decode(a.payload); samples.length.toLong
            case "aud/mulaw" =>
              val (_, samples) = Wav.decodeMulaw(a.payload)
              samples.length.toLong
            case "aud/adpcm" =>
              val (_, samples) = Adpcm.decode(a.payload)
              samples.length.toLong
            case "aud/flac" =>
              val (_, samples) = Flac.decode(a.payload)
              samples.length.toLong
            case "vid/avi" =>
              val (_, _, frames) = Avi.decode(a.payload); frames.length.toLong
            case "vid/mjpeg" =>
              val (_, _, frames) = Avi.decodeMjpeg(a.payload)
              frames.length.toLong
            case other =>
              throw new IllegalArgumentException(s"unknown format $other")
          }
        }
        MediaProbe(a.docId, a.fmt, units.isSuccess, units.getOrElse(0L))
      })
    }
  }
}
