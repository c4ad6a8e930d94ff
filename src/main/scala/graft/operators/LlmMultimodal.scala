package graft.operators

import org.apache.spark.sql.{functions => F}

/** Multimodal-column convention (SURVEY.md §2.4): an asset is an opaque
  * `binary` payload plus a typed `struct` metadata column. Header-level
  * decode (image dimensions/format from PNG/JPEG/GIF container bytes) is
  * REAL — a codegen expression, [[graft.functions.ImageHeader]] — and so
  * is every container-aware stage, each on the codec-free container of
  * its modality: pixel resize and channel features on 24-bpp BMP
  * ([[graft.multimodal.Bmp]]), audio decode / windowed DSP / decimation
  * on RIFF/WAVE PCM16 ([[graft.multimodal.Wav]]), video frame sampling
  * on uncompressed-DIB RIFF AVI ([[graft.multimodal.Avi]]).
  * [[graft.multimodal.StubDecoder]] retains only container-agnostic
  * byte-slice sampling (the fallback for codec-bearing payloads — no
  * pretend decode anywhere). Everything Spark-side (schema, projection,
  * metadata filter, payload hashing) is real.
  *
  * Scale notes: the asset table pattern keeps payloads as parquet binary —
  * scans that only touch metadata prune the payload column entirely
  * (columnar projection), so "find all 3-channel images wider than X" never
  * reads a byte of pixel data. Payload-touching stages (hashing, decode)
  * are narrow per-row work that scales linearly with no shuffle.
  */
object LlmMultimodal extends Catalog {

  val queries: Map[String, Q] = Map(
    // Build asset rows (payload = utf-8 bytes of the document as a
    // deterministic stand-in for image bytes; metadata derived from
    // document stats), filter on metadata, project decoded primitives.
    "llm_multimodal" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(F.col("doc_id"),
          F.to_binary(F.col("text"), F.lit("utf-8")).as("payload"),
          F.struct(
            F.lit("img/fake").as("fmt"),
            (F.pmod(F.col("n_chars"), F.lit(512)) + 64).as("width"),
            (F.pmod(F.col("doc_id"), F.lit(256)) + 32).as("height"),
            F.lit(3).as("channels")).as("meta"))
        .filter(F.col("meta.width") >= 128)
        .select(F.col("doc_id"),
          F.col("meta.fmt").as("fmt"),
          F.col("meta.width").as("width"),
          F.col("meta.height").as("height"),
          F.col("meta.channels").as("channels"),
          (F.col("meta.width") * F.col("meta.height") * F.col("meta.channels"))
            .as("n_pixels"),
          F.length(F.col("payload")).cast("long").as("n_bytes"),
          F.md5(F.col("payload")).as("payload_hash"))
        .orderBy("doc_id")),

    // REAL header decode: synthesize valid PNG / JPEG (APP0 + SOF0 marker
    // walk) / GIF (little-endian dims) container bytes per document, with
    // a quarter of the corpus left as raw text (no magic → null), then
    // parse dimensions back with the codegen image_dims expression. The
    // oracle recomputes the synthesis formulas directly — the parser must
    // exactly invert the container encoding, including endianness and the
    // JPEG segment walk. No codec, no stub: these are the actual container
    // layouts real files carry.
    "llm_image_dims" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      VectorFunctions.register(s)
      import org.apache.spark.sql.Column
      val w = (F.pmod(F.col("n_chars"), F.lit(512)) + 64).cast("int")
      val h = (F.pmod(F.col("doc_id"), F.lit(256)) + 32).cast("int")
      def be32(c: Column) = F.lpad(F.lower(F.hex(c)), 8, "0")
      def be16(c: Column) = F.lpad(F.lower(F.hex(c)), 4, "0")
      def le16(c: Column) = {
        val b = be16(c)
        F.concat(F.substring(b, 3, 2), F.substring(b, 1, 2))
      }
      // PNG: signature + IHDR(len 13) + bit-depth/color/crc tail = 33 bytes
      val pngHex = F.concat(
        F.lit("89504e470d0a1a0a" + "0000000d" + "49484452"),
        be32(w), be32(h), F.lit("0806000000" + "deadbeef"))
      // JPEG: SOI + APP0(JFIF, len 16) + SOF0(len 17, h then w) + EOI = 41
      val jpgHex = F.concat(
        F.lit("ffd8" + "ffe00010" + "4a46494600010100000100010000" +
          "ffc00011" + "08"),
        be16(h), be16(w), F.lit("03011100021101031101" + "ffd9"))
      // GIF89a: LITTLE-endian dims + GCT flags = 13 bytes
      val gifHex = F.concat(F.lit("474946383961"), le16(w), le16(h),
        F.lit("f70000"))
      val variant = F.pmod(F.col("doc_id"), F.lit(4))
      // Variant 3 ("not an image"): the raw text is prefixed with a 0x00
      // byte, which no container magic starts with — otherwise a corpus
      // text that happened to start with 'GIF89a' (or another magic) would
      // parse as an image in Spark while the oracle hardcodes 'unknown'
      // for doc_id%4==3, a latent data-dependent mismatch.
      val payload = F.when(variant === 0, F.to_binary(pngHex, F.lit("hex")))
        .when(variant === 1, F.to_binary(jpgHex, F.lit("hex")))
        .when(variant === 2, F.to_binary(gifHex, F.lit("hex")))
        .otherwise(F.concat(F.to_binary(F.lit("00"), F.lit("hex")),
          F.to_binary(F.col("text"), F.lit("utf-8"))))
      table(s, dir, "documents")
        .select(F.col("doc_id"), payload.as("payload"))
        .select(F.col("doc_id"),
          VectorFunctions.image_dims(F.col("payload")).as("d"),
          F.length(F.col("payload")).cast("long").as("n_bytes"))
        .select(F.col("doc_id"),
          F.when(F.element_at(F.col("d"), 1) === 1, "png")
            .when(F.element_at(F.col("d"), 1) === 2, "jpeg")
            .when(F.element_at(F.col("d"), 1) === 3, "gif")
            .otherwise("unknown").as("fmt"),
          F.coalesce(F.element_at(F.col("d"), 2), F.lit(-1)).as("width"),
          F.coalesce(F.element_at(F.col("d"), 3), F.lit(-1)).as("height"),
          F.col("n_bytes"))
        .orderBy("doc_id")
    }),

    // REAL feature extraction over the binary payload: byte-distribution
    // features via the codegen byte_stats kernel — distinct bytes, modal
    // byte (smallest wins ties), and an exact-integer chi-squared-vs-
    // uniform statistic (compressed/encrypted payloads score near 0, text
    // scores high — the standard codec-free screen for mislabeled or
    // corrupt assets). One narrow pass, no shuffle except the oracle
    // ORDER BY. The oracle recomputes per-character (identical bytes:
    // the corpus is pure ASCII, like llm_frames relies on).
    "llm_byte_stats" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      VectorFunctions.register(s)
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"),
          VectorFunctions.byte_stats(
            F.to_binary(F.col("text"), F.lit("utf-8"))).as("st"))
        .select(F.col("doc_id"),
          F.element_at(F.col("st"), 1).as("n_bytes"),
          F.element_at(F.col("st"), 2).as("distinct_bytes"),
          F.element_at(F.col("st"), 3).as("modal_byte"),
          F.element_at(F.col("st"), 4).as("modal_count"),
          F.element_at(F.col("st"), 5).as("chi2_u"))
        .orderBy("doc_id")
    }),

    // Frame sampling THROUGH the typed StubDecoder operator (every 2nd
    // 64-byte frame): the gate drives the actual flatMap expansion, and
    // the oracle recomputes each sampled frame's md5 from character
    // slices — identical bytes because the corpus is pure ASCII
    // (verified: octet_length == length for every document).
    "llm_frames" -> ((s, dir) => {
      import s.implicits._
      // single-row-group parquet → one split; repartition before the
      // per-frame hashing so it uses every core (CLAUDE.md rule)
      // Guard empty payloads: sampleFrames emits no rows for them, but the
      // oracle's `(length-1) // 64` truncates -1//64 to 0 in DuckDB and
      // would emit one empty-frame row (ADVICE r3). Mirrors llm_resize.
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id").as("docId"),
          F.to_binary(F.col("text"), F.lit("utf-8")).as("payload"),
          F.lit("vid/fake").as("fmt"), F.lit(0).as("width"),
          F.lit(0).as("height"), F.lit(1).as("channels"))
        .as[graft.multimodal.RawAsset]
      graft.multimodal.StubDecoder.sampleFrames(assets, frameBytes = 64, everyN = 2)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("frameIdx").as("frame_idx"),
          F.col("nBytes").cast("long").as("n_bytes"),
          F.col("frameHash").as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    }),

    // REAL pixel-level resize on a codec-free container: each document is
    // rendered as a byte-valid 24-bpp uncompressed Windows BMP (pixels =
    // the document's ASCII bytes tiled across a (len%12+4)×(doc_id%12+4)
    // grid — both up- and down-sampling vs the 8×8 target), then driven
    // through [[graft.multimodal.Bmp.resizeAssets]]: real header parse,
    // bottom-up/padded→packed pixel copy, nearest-neighbor resample,
    // re-encode, and a decode of the re-encoded output (so an encoder/
    // decoder asymmetry breaks the hash instead of hiding). The oracle
    // re-derives every output byte from character slices: src_bytes checks
    // encode's 4-byte row-stride math, pix_hash the resample index map.
    // No stub anywhere on this path.
    "llm_resize" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 12 + 4
          val h = (id % 12).toInt + 4
          val pix = Array.tabulate[Byte](w * h * 3)(j => bytes(j % bytes.length))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Bmp.encode(w, h, pix), "img/bmp", w, h, 3)
        }
      graft.multimodal.Bmp.resizeAssets(assets, 8, 8)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("srcW").as("src_w"), F.col("srcH").as("src_h"),
          F.col("srcBytes").cast("long").as("src_bytes"),
          F.col("nBytes").cast("long").as("n_bytes"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id")
    }),

    // REAL pixel feature extraction (the decode/feature-extract stage of
    // the multimodal pipeline, now stub-free for images): same synthesized
    // BMP containers as llm_resize, decoded by the real codec, with
    // exact-integer per-channel sums (BMP stores BGR triples) and the peak
    // byte — the oracle re-derives every channel sum from character tiles.
    "llm_image_features" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 12 + 4
          val h = (id % 12).toInt + 4
          val pix = Array.tabulate[Byte](w * h * 3)(j => bytes(j % bytes.length))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Bmp.encode(w, h, pix), "img/bmp", w, h, 3)
        }
      graft.multimodal.Bmp.decodeFeatures(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumB").as("sum_b"), F.col("sumG").as("sum_g"),
          F.col("sumR").as("sum_r"), F.col("peak"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL IMAGE HASH (pHash, DCT flavor) in exact integer
    // arithmetic: 16×16 BMPs synthesized from character tiles run the
    // REAL encode→decode round trip, then luminance → 2×2 block sums →
    // integer 8×8 DCT-II (frozen cosine table, spliced into the oracle
    // verbatim) → median-threshold 63-bit hash. Each selected document
    // also hashes a ONE-BYTE-PERTURBED variant; the output pins both
    // hashes and their Hamming distance — the image near-dup primitive
    // (tiny perturbation ⇒ tiny distance) with every bit oracle-exact.
    "llm_image_phash" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0 &&
          F.pmod(F.col("doc_id"), F.lit(5)) === 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          def hashOf(perturb: Boolean): Long = {
            val pix = Array.tabulate[Byte](16 * 16 * 3)(
              j => bytes(j % bytes.length))
            if (perturb) pix(0) = ((pix(0) + 7) % 256).toByte
            val (w, h, dec) = graft.multimodal.Bmp.decode(
              graft.multimodal.Bmp.encode(16, 16, pix))
            graft.multimodal.Phash.hash64(w, h, dec)
          }
          (id, hashOf(false), hashOf(true))
        }
        .toDF("doc_id", "phash", "near_phash")
        .select(F.col("doc_id"), F.col("phash"), F.col("near_phash"),
          F.bit_count(F.col("phash").bitwiseXOR(F.col("near_phash")))
            .cast("int").as("hamming"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL NEAR-DUP PAIRS via banded pHash (the image-dedup LSH
    // shape): each corpus image hashes once, every 1-in-20 document
    // also contributes a one-byte-perturbed CLONE, the 63-bit hashes
    // band into 4×16-bit slices, candidate pairs share a band value
    // (bucketed — never all-pairs), and survivors verify at Hamming
    // ≤ 8. Standard LSH recall contract: a ≤5-bit twin can straddle
    // all 4 bands and slip the net — the oracle replicates the SAME
    // banding, so the result is exact either way.
    "llm_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      val hashed = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0 &&
          F.pmod(F.col("doc_id"), F.lit(5)) === 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          def hashOf(perturb: Boolean): Long = {
            val pix = Array.tabulate[Byte](16 * 16 * 3)(
              j => bytes(j % bytes.length))
            if (perturb) pix(0) = ((pix(0) + 7) % 256).toByte
            val (w, h, dec) = graft.multimodal.Bmp.decode(
              graft.multimodal.Bmp.encode(16, 16, pix))
            graft.multimodal.Phash.hash64(w, h, dec)
          }
          (id, hashOf(false)) ::
            (if (id % 20 == 0) List((id + 1000000L, hashOf(true)))
            else Nil)
        }
        .toDF("id", "h")
      val bands = hashed.select(F.col("id"), F.col("h"),
        F.posexplode(F.array(
          F.shiftright(F.col("h"), 0).bitwiseAND(F.lit(65535L)),
          F.shiftright(F.col("h"), 16).bitwiseAND(F.lit(65535L)),
          F.shiftright(F.col("h"), 32).bitwiseAND(F.lit(65535L)),
          F.shiftright(F.col("h"), 48).bitwiseAND(F.lit(32767L)))))
      val a = bands.select(F.col("id").as("a_id"), F.col("h").as("a_h"),
        F.col("pos"), F.col("col"))
      val b = bands.select(F.col("id").as("b_id"), F.col("h").as("b_h"),
        F.col("pos"), F.col("col"))
      a.join(b, Seq("pos", "col"))
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_h", "b_h").distinct()
        .withColumn("hamming",
          F.bit_count(F.col("a_h").bitwiseXOR(F.col("b_h"))).cast("int"))
        .filter(F.col("hamming") <= 8)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    }),

    // PERCEPTUAL AUDIO FINGERPRINT (the llm_image_phash analogue for
    // sound, exact integers end to end): the standard 512-sample
    // synthetic waveform runs the REAL WAV encode→decode round trip,
    // then 8 windows × 8 band energies (sums of |s|) → 1-D integer
    // DCT-II (same frozen cosine table) → 7-bit median-threshold code
    // per window → a 56-bit fingerprint. A variant with ONE source
    // byte perturbed pins the perceptual contract via Hamming distance.
    "llm_audio_phash" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0 &&
          F.pmod(F.col("doc_id"), F.lit(5)) === 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          def hashOf(perturb: Boolean): Long = {
            val src = bytes.clone()
            if (perturb) src(0) = ((src(0) + 7) % 256).toByte
            val samples = Array.tabulate[Short](512) { i =>
              (((src(i % src.length) & 0xff) * 997 + i * 131) % 65536
                - 32768).toShort
            }
            val (_, dec) = graft.multimodal.Wav.decode(
              graft.multimodal.Wav.encode(8000, samples))
            graft.multimodal.Phash.audioHash56(dec)
          }
          (id, hashOf(false), hashOf(true))
        }
        .toDF("doc_id", "ahash", "near_ahash")
        .select(F.col("doc_id"), F.col("ahash"), F.col("near_ahash"),
          F.bit_count(F.col("ahash").bitwiseXOR(F.col("near_ahash")))
            .cast("int").as("hamming"))
        .orderBy("doc_id")
    }),

    // REAL compressed-image decode under the oracle: the same pixel tiles
    // as llm_image_features, round-tripped through a genuine PNG
    // ([[graft.multimodal.Png]]) — zlib-deflated IDAT, per-row filters
    // cycling None/Sub/Up/Average/Paeth (every image here is ≥4 rows tall,
    // so all five unfilter paths run), CRC-checked chunk walk, bounded
    // Inflater inflate. PNG is lossless, so the oracle re-derives every
    // decoded byte and channel sum from character tiles exactly as it
    // does for BMP — compression is invisible to the hash, which is the
    // point: the gate passes only if inflate + unfilter reproduce the
    // source raster bit-exactly.
    "llm_png_pixels" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 12 + 4
          val h = (id % 12).toInt + 4
          val pix = Array.tabulate[Byte](w * h * 3)(j => bytes(j % bytes.length))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Png.encode(w, h, pix), "img/png", w, h, 3)
        }
      graft.multimodal.Png.decodeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumR").as("sum_r"), F.col("sumG").as("sum_g"),
          F.col("sumB").as("sum_b"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id")
    }),

    // FOURTH compressed-image family under the oracle — pure RUN-LENGTH
    // coding ([[graft.multimodal.Tga]], type-11 RLE grayscale). RLE is
    // simple enough that the ORACLE REPLAYS THE ENCODER: two
    // gaps-and-islands window passes recompute the exact encoded byte
    // count (runs ≥ 2 → 2-byte packets per 128-chunk; maximal stretches
    // of singleton islands → raw packets of ≤ 128 literals + headers),
    // so the gate pins every greedy packet-boundary decision, not just
    // losslessness — the same encoder-pinning discipline as FLAC's
    // n_bytes. Pixels tile the corpus text with 3-pixel stretches so
    // real data exercises both packet kinds.
    "llm_image_tga" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 16 + 4
          val h = (id % 12).toInt + 4
          val pix = Array.tabulate[Byte](w * h)(j =>
            bytes((j / 3) % bytes.length))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Tga.encode(w, h, pix), "img/tga", w, h, 1)
        }
      graft.multimodal.Tga.decodeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumPix").as("sum_pix"), F.col("nBytes").as("n_bytes"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id")
    }),

    // SECOND compressed-image family under the oracle: the same tiles as
    // the other image gates (single channel this time — GIF is
    // palette-indexed), round-tripped through a genuine GIF89a with a
    // REAL variable-width LZW coder ([[graft.multimodal.Gif]]). The
    // tiled corpus text makes the dictionary genuinely compress, so
    // width growth (9→10 bits at 512 entries) and the KwKwK case run on
    // real gate data; LZW is lossless, so the oracle re-derives every
    // decoded index byte from character tiles — the gate passes only if
    // dictionary rebuild reproduces the source stream bit-exactly.
    "llm_gif_pixels" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 12 + 4
          val h = (id % 12).toInt + 4
          val idx = Array.tabulate[Byte](w * h)(j => bytes(j % bytes.length))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Gif.encode(w, h, idx), "img/gif", w, h, 1)
        }
      graft.multimodal.Gif.decodeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumIdx").as("sum_idx"), F.col("peakIdx").as("peak_idx"),
          F.md5(F.col("idx")).as("idx_hash"))
        .orderBy("doc_id")
    }),

    // THIRD compressed-image family under the oracle — entropy-coded
    // transform coding ([[graft.multimodal.Jpeg]]): baseline sequential
    // grayscale JPEG with the full real pipeline (FDCT, flat quant,
    // zigzag, DC-predicted Huffman, AC RLE bitstream with 0xFF00
    // stuffing, IDCT). JPEG is LOSSY in general, so unlike PNG/GIF the
    // gate data is deliberately 8x8-BLOCK-CONSTANT gray tiles (one text
    // byte per block): a constant block's DCT is a lone DC coefficient
    // and reconstructs bit-exactly (JpegLaws pins the law), so the
    // oracle re-derives every decoded byte from block-index tiles — the
    // gate passes only if the Huffman walk, DC prediction chain,
    // dequant and IDCT reproduce the raster exactly. Up to 4x4 MCUs per
    // image exercise multi-block DC chains on real corpus bytes.
    "llm_jpeg_pixels" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 20 + 8
          val h = (id % 20).toInt + 8
          val wB = (w + 7) / 8
          val pix = Array.tabulate[Byte](w * h) { j =>
            val x = j % w; val y = j / w
            bytes(((y / 8) * wB + (x / 8)) % bytes.length)
          }
          // a third of the corpus carries DRI/RSTn restart markers (the
          // real-encoder stream shape) — invisible to the decoded bytes,
          // so the oracle is unchanged while restart resync + DC reset
          // run under the driver hash
          graft.multimodal.RawAsset(id,
            graft.multimodal.Jpeg.encode(w, h, pix,
              restartInterval = if (id % 3 == 0) 2 else 0),
            "img/jpeg", w, h, 1)
        }
      graft.multimodal.Jpeg.decodeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumV").as("sum_v"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id")
    }),

    // COLOR JPEG — the 4:2:0 YCbCr shape virtually every camera emits:
    // interleaved 16x16 MCUs (4 luma + Cb + Cr blocks), per-component DC
    // prediction, a third of the corpus with restart markers. Same
    // block-constant exactness contract per PLANE (full-res Y tiles,
    // quarter-res chroma tiles, distinct text offsets per plane), so the
    // oracle re-derives all three planes byte for byte; no RGB
    // conversion — pipelines featurize planes, and color-space rounding
    // would break the shared hash.
    "llm_jpeg_color" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val n = bytes.length
          val w = n % 20 + 8
          val h = (id % 20).toInt + 8
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          val wBy = (w + 7) / 8; val wBc = (cw + 7) / 8
          def plane(pw: Int, phh: Int, wB: Int, off: Int) =
            Array.tabulate[Byte](pw * phh) { j =>
              val x = j % pw; val y = j / pw
              bytes(((y / 8) * wB + (x / 8) + off) % n)
            }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Jpeg.encodeColor(w, h,
              plane(w, h, wBy, 0), plane(cw, ch, wBc, 3),
              plane(cw, ch, wBc, 11),
              restartInterval = if (id % 3 == 0) 2 else 0),
            "img/jpeg-color", w, h, 3)
        }
      graft.multimodal.Jpeg.decodeColorAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.col("sumY").as("sum_y"), F.col("sumCb").as("sum_cb"),
          F.col("sumCr").as("sum_cr"),
          F.md5(F.concat(F.col("y"), F.col("cb"), F.col("cr")))
            .as("planes_hash"))
        .orderBy("doc_id")
    }),

    // COMPRESSED video under the oracle — Motion JPEG: the first video
    // container whose FRAMES are entropy-coded (strh 'vids'/'MJPG',
    // biCompression 'MJPG', '00dc' chunks of real baseline-JPEG
    // streams). Decode composes the two real codecs — the nested RIFF
    // walk routes each compressed chunk through the full Huffman /
    // dequant / IDCT pipeline — and the container is transparent
    // (AviLaws law: decodeMjpeg ≡ Jpeg.decode per frame). Gate frames
    // are 8x8-block-constant tiles offset 17·f per frame (the video
    // gate's motion pattern), so the lossy codec is oracle-exact and
    // the oracle re-derives every frame's plane byte-for-byte. The
    // middle frame carries restart markers.
    "llm_video_mjpeg" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val n = bytes.length
          val w = n % 20 + 8
          val h = (id % 20).toInt + 8
          val wB = (w + 7) / 8
          val frames = (0 until 3).map { f =>
            val pix = Array.tabulate[Byte](w * h) { j =>
              val x = j % w; val y = j / w
              bytes(((y / 8) * wB + (x / 8) + 17 * f) % n)
            }
            graft.multimodal.Jpeg.encode(w, h, pix,
              restartInterval = if (f == 1) 2 else 0)
          }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Avi.encodeMjpeg(w, h, 5, frames),
            "vid/mjpeg", w, h, 1)
        }
      graft.multimodal.Avi.decodeMjpegAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("frameIdx").as("frame_idx"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id", "frame_idx")
    }),

    // REAL audio decode + windowed DSP features on the codec-free audio
    // container (RIFF/WAVE PCM16 mono): synthesize a deterministic
    // 256-sample waveform from the document's characters, encode a
    // byte-valid .wav, decode through the real RIFF chunk walk, and emit
    // one row per 64-sample window with exact-integer energy (Σ s²),
    // strict zero crossings (prev·cur < 0, window-local), and peak |s| —
    // the oracle recomputes every sample and a window lag in SQL.
    "llm_audio_features" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val samples = Array.tabulate[Short](256) { i =>
            (((bytes(i % bytes.length) & 0xff) * 997 + i * 131) % 65536
              - 32768).toShort
          }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Wav.encode(8000, samples), "aud/wav", 0, 0, 1)
        }
      graft.multimodal.Wav.analyzeAssets(assets, 64)
        .toDF()
        .select(F.col("docId").as("doc_id"), F.col("win"),
          F.col("nBytes").cast("long").as("n_bytes"),
          F.col("sumsq"), F.col("crossings"), F.col("peak"))
        .orderBy("doc_id", "win")
    }),

    // The audio RESAMPLE path under the oracle: same waveform, decimated
    // by 3 (keep samples 0,3,6,… — real integer decimation through
    // [[graft.multimodal.Wav.decimate]]) before windowing; 86 decimated
    // samples yield exactly one full 64-sample window. The oracle indexes
    // the original sample formula at 3m — any off-by-one in the decimation
    // stride or the partial-window drop breaks every feature.
    "llm_audio_decimate" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val samples = Array.tabulate[Short](256) { i =>
            (((bytes(i % bytes.length) & 0xff) * 997 + i * 131) % 65536
              - 32768).toShort
          }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Wav.encode(8000, samples), "aud/wav", 0, 0, 1)
        }
      graft.multimodal.Wav.analyzeAssets(assets, 64, every = 3)
        .toDF()
        .select(F.col("docId").as("doc_id"), F.col("win"),
          F.col("sumsq"), F.col("crossings"), F.col("peak"))
        .orderBy("doc_id", "win")
    }),

    // REAL lossy audio decompression: G.711 mu-law (WAVE format tag 7),
    // the telephony codec. Each document synthesizes 256 mu-law CODES
    // from its text, wraps them in a byte-valid format-7 WAV, and the
    // engine decodes via the real RIFF walk + the standard G.711 segment
    // expansion (complement, t = (8·mantissa + 0x84) << exponent, signed)
    // before the same windowed DSP features as the PCM gate. The
    // expansion is pure integer arithmetic, so the oracle re-derives the
    // decoded PCM bit-exactly in SQL — any error in the complement, the
    // bias, the shift, or the sign branch breaks every feature.
    "llm_audio_mulaw" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val ulaw = Array.tabulate[Byte](256) { i =>
            (((bytes(i % bytes.length) & 0xff) * 31 + i * 7) % 256).toByte
          }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Wav.encodeMulaw(8000, ulaw), "aud/mulaw", 0, 0, 1)
        }
      graft.multimodal.Wav.analyzeMulawAssets(assets, 64)
        .toDF()
        .select(F.col("docId").as("doc_id"), F.col("win"),
          F.col("sumsq"), F.col("crossings"), F.col("peak"))
        .orderBy("doc_id", "win")
    }),

    // REAL adaptive-predictive audio decompression: IMA ADPCM (WAVE
    // format 0x11), 4-bit differential coding — a SEQUENTIAL state
    // machine (predictor + step index adapt per sample), unlike every
    // codec before it. Each document synthesizes 128 PCM16 samples from
    // its text, compresses them 4:1 through the real encoder, and the
    // engine decodes the blocks back (RIFF walk, seed samples, nibble
    // codes, 89-entry step table). The oracle replays the ENTIRE
    // encoder/decoder recurrence as a 128-deep recursive CTE in pure
    // integer arithmetic — any error in the bit-test quantizer, the
    // step/8 bias, a clamp, or the index adaptation derails every
    // subsequent sample of the stream and breaks all four features.
    // quant_err exposes the loss itself: reconstruction vs original.
    "llm_audio_adpcm" -> ((s, dir) => {
      import s.implicits._
      val synth: (String, Int) => Array[Short] = (text, n) => {
        val b = text.getBytes("UTF-8")
        Array.tabulate[Short](n) { i =>
          ((((b((i * 5) % b.length) & 0xff) * 157 + i * 331) % 4001
            - 2000) * 8).toShort
        }
      }
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.multimodal.Adpcm.encode(8000, synth(text, 128)), text)
        }
      graft.multimodal.Adpcm.analyzeAssets(assets, synth)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("nSamples").cast("long").as("n_samples"),
          F.col("reconSum").as("recon_sum"),
          F.col("finalPred").as("final_pred"),
          F.col("quantErr").as("quant_err"), F.col("peak"))
        .orderBy("doc_id")
    }),

    // REAL FLAC subset (the FIFTH compression family: linear-predictive
    // entropy coding) — each document synthesizes 512 small-amplitude
    // samples, encodes them as a spec-shaped FLAC stream (STREAMINFO,
    // CRC-8/CRC-16-protected frames, fixed order-2 prediction, one Rice
    // partition with exact per-frame best-k), and decodes distributed.
    // Lossless ⇒ the oracle re-derives the features from the synthesis
    // formula directly; n_bytes additionally pins the ENCODER — the
    // oracle replays the Rice bit-cost argmin and the whole bit-layout
    // arithmetic, so one drifted bit in the writer fails the gate.
    // Round-trip + CRC + totality are fuzz-proven in CodecFuzzLaws.
    "llm_audio_flac" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val b = text.getBytes("UTF-8")
          val samples = Array.tabulate[Short](512) { i =>
            (((b(i % b.length) & 0xff) * 997 + i * 131) % 4096 - 2048).toShort
          }
          graft.multimodal.RawAsset(id,
            graft.multimodal.Flac.encode(44100, samples), "aud/flac", 0, 0, 1)
        }
      graft.multimodal.Flac.analyzeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("nSamples").as("n_samples"),
          F.col("wsum"), F.col("peak"), F.col("nBytes").as("n_bytes"))
        .orderBy("doc_id")
    }),

    // REAL video frame sampling on the codec-free container (RIFF AVI
    // with uncompressed 24-bpp DIB '00db' frames): synthesize a 6-frame
    // video per document (frame f's pixels tile the text with a 17·f
    // character offset), encode a byte-valid .avi, decode through the
    // real nested RIFF walk, keep every 2nd frame, and hash each frame's
    // decoded top-down pixels. The oracle re-derives all three kept
    // frames character-by-character — the parser must exactly invert the
    // hdrl/strl/strf/movi layout, the bottom-up row order, and the
    // 4-byte stride padding. The last stub is gone: every multimodal
    // stage (headers, pixels, audio, video frames) now walks a real
    // container.
    "llm_video_frames" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 8 + 4
          val h = (id % 6).toInt + 4
          val frames = (0 until 6).map(f =>
            Array.tabulate[Byte](w * h * 3)(j =>
              bytes((j + 17 * f) % bytes.length)))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Avi.encode(w, h, 25, frames), "vid/avi", w, h, 3)
        }
      graft.multimodal.Avi.sampleFrames(assets, 2)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("frameIdx").as("frame_idx"),
          F.col("w").as("width"), F.col("h").as("height"),
          F.md5(F.col("pix")).as("pix_hash"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Temporal video analysis on the same real container: per-pair
    // inter-frame motion (exact-integer sum of absolute byte diffs +
    // peak diff) — the codec-free static-vs-dynamic curation signal. The
    // oracle re-derives every byte difference from the 17·f character
    // offsets, so the decoded frame ORDER matters too (a swapped pair
    // changes the diffs).
    "llm_video_motion" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length % 8 + 4
          val h = (id % 6).toInt + 4
          val frames = (0 until 6).map(f =>
            Array.tabulate[Byte](w * h * 3)(j =>
              bytes((j + 17 * f) % bytes.length)))
          graft.multimodal.RawAsset(id,
            graft.multimodal.Avi.encode(w, h, 25, frames), "vid/avi", w, h, 3)
        }
      graft.multimodal.Avi.frameMotion(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"),
          F.col("frameIdx").as("frame_idx"),
          F.col("motion"), F.col("peakDiff").as("peak_diff"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Mixed-modality probe + QUARANTINE — the ingest front door: each doc
    // carries a BMP, WAV, or AVI payload (doc_id % 3) through the real
    // codec its metadata claims; every 5th payload has its magic byte
    // corrupted and MUST land in quarantine (decode fails controlled,
    // the row survives, the stage doesn't die — the operational contract
    // CodecFuzzLaws proves). Content-unit counts on the good stream are
    // real decoded inventory (pixels / samples / frames).
    "llm_media_quarantine" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val (fmt, payload) = (id % 3) match {
            case 0 =>
              val w = bytes.length % 12 + 4
              val h = (id % 12).toInt + 4
              val pix = Array.tabulate[Byte](w * h * 3)(j =>
                bytes(j % bytes.length))
              ("img/bmp", graft.multimodal.Bmp.encode(w, h, pix))
            case 1 =>
              val samples = Array.tabulate[Short](256) { i =>
                (((bytes(i % bytes.length) & 0xff) * 997 + i * 131) % 65536
                  - 32768).toShort
              }
              ("aud/wav", graft.multimodal.Wav.encode(8000, samples))
            case _ =>
              val w = bytes.length % 8 + 4
              val h = (id % 6).toInt + 4
              val frames = (0 until 6).map(f =>
                Array.tabulate[Byte](w * h * 3)(j =>
                  bytes((j + 17 * f) % bytes.length)))
              ("vid/avi", graft.multimodal.Avi.encode(w, h, 25, frames))
          }
          if (id % 5 == 0) payload(0) = 'X'.toByte // corrupt the magic
          graft.multimodal.RawAsset(id, payload, fmt, 0, 0, 0)
        }
      graft.multimodal.Probe.probeAssets(assets)
        .toDF()
        .select(F.col("docId").as("doc_id"), F.col("fmt"),
          F.when(F.col("ok"), "ok").otherwise("quarantined").as("status"),
          F.col("units"))
        .orderBy("doc_id")
    }),

    // END-TO-END MIXED-MEDIA PIPELINE in one job: the quarantine probe
    // ([[graft.multimodal.Probe.routeAssets]]) tags every payload once,
    // then seven plain filters branch the tagged stream into the REAL
    // per-modality operators — BMP → pixel features, WAV → windowed DSP,
    // AVI → frame motion, PNG → inflate+unfilter features, GIF → LZW
    // index features, JPEG → IDCT sums, ADPCM → adaptive-predictive
    // reconstruction — while corrupt payloads (every 6th, magic byte
    // clobbered; stride coprime to the 7-way modality split so every
    // modality sees quarantines) surface as quarantined rows with zeroed
    // features. Probe → branch → extract → union is one lazy plan: no
    // driver round-trips anywhere, every branch a narrow per-row kernel
    // (the only shuffles are the tiny per-doc WAV/AVI summary
    // aggregates). The oracle re-derives all five feature streams AND
    // the quarantine routing from the text tiles, so a mis-routed or
    // double-routed payload breaks the hash.
    "llm_media_pipeline" -> ((s, dir) => {
      import s.implicits._
      val assets = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val (fmt, payload) = (id % 8) match {
            case 0 =>
              val w = bytes.length % 12 + 4
              val h = (id % 12).toInt + 4
              val pix = Array.tabulate[Byte](w * h * 3)(j =>
                bytes(j % bytes.length))
              ("img/bmp", graft.multimodal.Bmp.encode(w, h, pix))
            case 1 =>
              val samples = Array.tabulate[Short](256) { i =>
                (((bytes(i % bytes.length) & 0xff) * 997 + i * 131) % 65536
                  - 32768).toShort
              }
              ("aud/wav", graft.multimodal.Wav.encode(8000, samples))
            case 2 =>
              val w = bytes.length % 8 + 4
              val h = (id % 6).toInt + 4
              val frames = (0 until 6).map(f =>
                Array.tabulate[Byte](w * h * 3)(j =>
                  bytes((j + 17 * f) % bytes.length)))
              ("vid/avi", graft.multimodal.Avi.encode(w, h, 25, frames))
            case 3 =>
              val w = bytes.length % 12 + 4
              val h = (id % 12).toInt + 4
              val pix = Array.tabulate[Byte](w * h * 3)(j =>
                bytes(j % bytes.length))
              ("img/png", graft.multimodal.Png.encode(w, h, pix))
            case 4 =>
              val w = bytes.length % 12 + 4
              val h = (id % 12).toInt + 4
              val idx = Array.tabulate[Byte](w * h)(j =>
                bytes(j % bytes.length))
              ("img/gif", graft.multimodal.Gif.encode(w, h, idx))
            case 5 => // block-constant tiles: the JPEG exactness contract
              val w = bytes.length % 20 + 8
              val h = (id % 20).toInt + 8
              val wB = (w + 7) / 8
              val pix = Array.tabulate[Byte](w * h) { j =>
                val x = j % w; val y = j / w
                bytes(((y / 8) * wB + (x / 8)) % bytes.length)
              }
              ("img/jpeg", graft.multimodal.Jpeg.encode(w, h, pix))
            case 6 => // sequential predictive coding: the ADPCM stream
              val samples = Array.tabulate[Short](128) { i =>
                ((((bytes((i * 5) % bytes.length) & 0xff) * 157 + i * 331)
                  % 4001 - 2000) * 8).toShort
              }
              ("aud/adpcm", graft.multimodal.Adpcm.encode(8000, samples))
            case _ => // linear-predictive entropy coding: the FLAC stream
              val samples = Array.tabulate[Short](512) { i =>
                (((bytes(i % bytes.length) & 0xff) * 997 + i * 131) % 4096
                  - 2048).toShort
              }
              ("aud/flac", graft.multimodal.Flac.encode(44100, samples))
          }
          if (id % 6 == 0) payload(0) = 'X'.toByte // corrupt the magic
          graft.multimodal.RawAsset(id, payload, fmt, 0, 0, 0)
        }
      // one probe pass, pinned: nine downstream branches (eight modality
      // extractors + quarantine) would otherwise each recompute
      // synthesize+probe over the corpus — at scale, nine full passes
      val routed = graft.multimodal.Probe.routeAssets(assets).localCheckpoint()
      def branch(fmt: String) = routed
        .filter(r => r.ok && r.fmt == fmt)
        .map(r => graft.multimodal.RawAsset(r.docId, r.payload, r.fmt,
          r.width, r.height, r.channels))
      val okRow = F.lit("ok").as("status")
      val bmp = graft.multimodal.Bmp.decodeFeatures(branch("img/bmp"))
        .toDF()
        .select(F.col("docId").as("doc_id"), F.lit("img/bmp").as("fmt"),
          okRow, (F.col("sumB") + F.col("sumG") + F.col("sumR")).as("f1"),
          F.col("peak").as("f2"))
      val wav = graft.multimodal.Wav.analyzeAssets(branch("aud/wav"), 64)
        .toDF()
        .groupBy(F.col("docId").as("doc_id"))
        .agg(F.sum("sumsq").as("f1"), F.sum("crossings").as("f2"))
        .select(F.col("doc_id"), F.lit("aud/wav").as("fmt"), okRow,
          F.col("f1"), F.col("f2"))
      val avi = graft.multimodal.Avi.frameMotion(branch("vid/avi"))
        .toDF()
        .groupBy(F.col("docId").as("doc_id"))
        .agg(F.sum("motion").as("f1"), F.max("peakDiff").as("f2"))
        .select(F.col("doc_id"), F.lit("vid/avi").as("fmt"), okRow,
          F.col("f1"), F.col("f2"))
      val png = graft.multimodal.Png.decodeAssets(branch("img/png"))
        .toDF()
        .select(F.col("docId").as("doc_id"), F.lit("img/png").as("fmt"),
          okRow, (F.col("sumR") + F.col("sumG") + F.col("sumB")).as("f1"),
          (F.col("w") * F.col("h")).cast("long").as("f2"))
      val gif = graft.multimodal.Gif.decodeAssets(branch("img/gif"))
        .toDF()
        .select(F.col("docId").as("doc_id"), F.lit("img/gif").as("fmt"),
          okRow, F.col("sumIdx").as("f1"), F.col("peakIdx").as("f2"))
      val jpeg = graft.multimodal.Jpeg.decodeAssets(branch("img/jpeg"))
        .toDF()
        .select(F.col("docId").as("doc_id"), F.lit("img/jpeg").as("fmt"),
          okRow, F.col("sumV").as("f1"),
          (F.col("w") * F.col("h")).cast("long").as("f2"))
      val adpcm = graft.multimodal.Adpcm.decodeFeatures(branch("aud/adpcm"))
        .toDF("doc_id", "f1", "f2")
        .select(F.col("doc_id"), F.lit("aud/adpcm").as("fmt"), okRow,
          F.col("f1"), F.col("f2"))
      val flac = graft.multimodal.Flac.analyzeAssets(branch("aud/flac"))
        .toDF()
        .select(F.col("docId").as("doc_id"), F.lit("aud/flac").as("fmt"),
          okRow, F.col("wsum").as("f1"), F.col("peak").as("f2"))
      val quarantined = routed.filter(r => !r.ok).toDF()
        .select(F.col("docId").as("doc_id"), F.col("fmt"),
          F.lit("quarantined").as("status"),
          F.lit(0L).as("f1"), F.lit(0L).as("f2"))
      bmp.unionByName(wav).unionByName(avi).unionByName(png)
        .unionByName(gif).unionByName(jpeg).unionByName(adpcm)
        .unionByName(flac).unionByName(quarantined)
        .orderBy("doc_id")
    })
  )

  /** The pHash derivation CTE chain (d → … → bits), shared verbatim by
    * the llm_image_phash and llm_phash_pairs oracles — ONE source of
    * truth for the SQL re-derivation, like the spliced cosine table is
    * for the constants. Ends with `bits(doc_id, phash, near_phash)`.
    */
  private def phashCoreSql: String = s"""
         d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0 AND doc_id % 5 = 0),
         ctab(u, x, c) AS (VALUES ${graft.multimodal.Phash.cosSqlValues}),
         px AS (
           SELECT doc_id, t.j AS j,
                  ord(substring(text, CAST((t.j % n) + 1 AS INT), 1)) AS b
           FROM d, unnest(generate_series(0, 767)) t(j)),
         px2 AS (
           SELECT doc_id, j, b,
                  CASE WHEN j = 0 THEN (b + 7) % 256 ELSE b END AS b2
           FROM px),
         lum AS (
           SELECT doc_id, (j // 3) AS i,
                  CAST(sum(b) AS BIGINT) AS v,
                  CAST(sum(b2) AS BIGINT) AS v2
           FROM px2 GROUP BY 1, 2),
         blk AS (
           SELECT doc_id, ((i // 16) // 2) AS byy, ((i % 16) // 2) AS bxx,
                  CAST(sum(v) AS BIGINT) AS s,
                  CAST(sum(v2) AS BIGINT) AS s2
           FROM lum GROUP BY 1, 2, 3),
         dct AS (
           SELECT b.doc_id, cu.u AS u, cv.u AS v,
                  CAST(sum(b.s * cu.c * cv.c) AS BIGINT) AS f,
                  CAST(sum(b.s2 * cu.c * cv.c) AS BIGINT) AS f2
           FROM blk b
           JOIN ctab cu ON cu.x = b.byy
           JOIN ctab cv ON cv.x = b.bxx
           GROUP BY 1, 2, 3),
         ac AS (SELECT * FROM dct WHERE NOT (u = 0 AND v = 0)),
         ranked AS (
           SELECT doc_id, u, v, f, f2,
                  row_number() OVER (PARTITION BY doc_id ORDER BY f)
                    AS rn,
                  row_number() OVER (PARTITION BY doc_id ORDER BY f2)
                    AS rn2
           FROM ac),
         med AS (
           SELECT doc_id,
                  max(CASE WHEN rn = 32 THEN f END) AS m,
                  max(CASE WHEN rn2 = 32 THEN f2 END) AS m2
           FROM ranked GROUP BY 1),
         bits AS (
           SELECT a.doc_id,
                  CAST(sum(CASE WHEN a.f > m.m
                    THEN (CAST(1 AS BIGINT) << (a.u * 8 + a.v - 1))
                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS phash,
                  CAST(sum(CASE WHEN a.f2 > m.m2
                    THEN (CAST(1 AS BIGINT) << (a.u * 8 + a.v - 1))
                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS near_phash
           FROM ac a JOIN med m USING (doc_id) GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    // pHash re-derived byte-for-byte: tiled channel bytes (byte 0
    // perturbed (+7) % 256 for the variant), luminance sums, 2×2 block
    // sums, DCT via the SPLICED frozen cosine table (Phash.cosSqlValues
    // — single source of truth with the Scala kernel), 32nd-order-stat
    // median, shifts capped at 62 (the r15 `1<<63` BIGINT trap).
    "llm_image_phash" -> s"""
         WITH $phashCoreSql
         SELECT doc_id, phash, near_phash,
                CAST(bit_count(xor(phash, near_phash)) AS INT) AS hamming
         FROM bits ORDER BY doc_id""",
    // banded near-dup pairs over the SAME phash core: population =
    // originals ∪ perturbed clones (near_phash, ids offset 10^6),
    // 4 band slices, bucketed candidates, Hamming-verified
    "llm_phash_pairs" -> s"""
         WITH $phashCoreSql,
         orig AS (SELECT doc_id AS id, phash AS h FROM bits),
         extra AS (SELECT doc_id + 1000000 AS id, near_phash AS h
                   FROM bits WHERE doc_id % 20 = 0),
         pop AS (SELECT * FROM orig UNION ALL SELECT * FROM extra),
         bands AS (
           SELECT id, h, t.j AS j,
                  CASE WHEN t.j < 3 THEN (h >> (16 * t.j)) & 65535
                       ELSE (h >> 48) & 32767 END AS v
           FROM pop, unnest(generate_series(0, 3)) t(j)),
         cand AS (
           SELECT DISTINCT a.id AS a_id, b.id AS b_id,
                  a.h AS a_h, b.h AS b_h
           FROM bands a JOIN bands b
             ON a.j = b.j AND a.v = b.v AND a.id < b.id)
         SELECT a_id, b_id,
                CAST(bit_count(xor(a_h, b_h)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(a_h, b_h)) <= 8
         ORDER BY a_id, b_id""",
    // the audio fingerprint re-derived: same synthetic waveform (byte 0
    // perturbed (+7) % 256 for the variant — note the perturbation hits
    // EVERY sample whose tile index i % n = 0), band |s| sums, 1-D DCT
    // via the spliced table, 4th-order-stat median of 7 AC coefs,
    // 7-bit codes packed at 7·w
    "llm_audio_phash" -> s"""
         WITH d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0 AND doc_id % 5 = 0),
         ctab(u, x, c) AS (VALUES ${graft.multimodal.Phash.cosSqlValues}),
         smp AS (
           SELECT doc_id, t.i AS i,
                  ((ord(substring(text, (t.i % n) + 1, 1)) * 997
                    + t.i * 131) % 65536) - 32768 AS s,
                  (((CASE WHEN t.i % n = 0
                      THEN (ord(substring(text, 1, 1)) + 7) % 256
                      ELSE ord(substring(text, (t.i % n) + 1, 1)) END)
                    * 997 + t.i * 131) % 65536) - 32768 AS s2
           FROM d, unnest(generate_series(0, 511)) t(i)),
         band AS (
           SELECT doc_id, (i // 64) AS w, ((i % 64) // 8) AS b,
                  CAST(sum(abs(s)) AS BIGINT) AS e,
                  CAST(sum(abs(s2)) AS BIGINT) AS e2
           FROM smp GROUP BY 1, 2, 3),
         dct AS (
           SELECT band.doc_id, band.w, cu.u AS u,
                  CAST(sum(band.e * cu.c) AS BIGINT) AS f,
                  CAST(sum(band.e2 * cu.c) AS BIGINT) AS f2
           FROM band JOIN ctab cu ON cu.x = band.b
           GROUP BY 1, 2, 3),
         ac AS (SELECT * FROM dct WHERE u > 0),
         ranked AS (
           SELECT doc_id, w, u, f, f2,
                  row_number() OVER (PARTITION BY doc_id, w ORDER BY f)
                    AS rn,
                  row_number() OVER (PARTITION BY doc_id, w ORDER BY f2)
                    AS rn2
           FROM ac),
         med AS (
           SELECT doc_id, w,
                  max(CASE WHEN rn = 4 THEN f END) AS m,
                  max(CASE WHEN rn2 = 4 THEN f2 END) AS m2
           FROM ranked GROUP BY 1, 2),
         bits AS (
           SELECT a.doc_id,
                  CAST(sum(CASE WHEN a.f > m.m
                    THEN (CAST(1 AS BIGINT) << (a.u - 1 + 7 * a.w))
                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash,
                  CAST(sum(CASE WHEN a.f2 > m.m2
                    THEN (CAST(1 AS BIGINT) << (a.u - 1 + 7 * a.w))
                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS near_ahash
           FROM ac a JOIN med m ON a.doc_id = m.doc_id AND a.w = m.w
           GROUP BY 1)
         SELECT doc_id, ahash, near_ahash,
                CAST(bit_count(xor(ahash, near_ahash)) AS INT) AS hamming
         FROM bits ORDER BY doc_id""",
    // encode(text) is the same utf-8 byte payload; DuckDB 1.0 has no
    // md5(BLOB), and md5(text) hashes those identical bytes.
    "llm_multimodal" ->
      """WITH assets AS (
           SELECT doc_id,
                  'img/fake' AS fmt,
                  (n_chars % 512) + 64 AS width,
                  (doc_id % 256) + 32 AS height,
                  3 AS channels,
                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                  md5(text) AS payload_hash
           FROM documents)
         SELECT doc_id, fmt, width, height, channels,
                width * height * channels AS n_pixels,
                n_bytes, payload_hash
         FROM assets WHERE width >= 128 ORDER BY doc_id""",
    "llm_image_dims" ->
      """SELECT doc_id,
                CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                     WHEN 2 THEN 'gif' ELSE 'unknown' END AS fmt,
                CASE WHEN doc_id % 4 <= 2
                     THEN CAST((n_chars % 512) + 64 AS INT)
                     ELSE -1 END AS width,
                CASE WHEN doc_id % 4 <= 2
                     THEN CAST((doc_id % 256) + 32 AS INT)
                     ELSE -1 END AS height,
                CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 41
                     WHEN 2 THEN 13
                     ELSE octet_length(encode(text)) + 1 END AS BIGINT)
                  AS n_bytes
         FROM documents ORDER BY doc_id""",
    // per-char counts == per-byte counts on the ASCII corpus; chi2 over
    // ABSENT byte values contributes (0*256 - n)^2 = n^2 each, folded in
    // as (256 - distinct) * n^2 instead of materializing 256 bins
    "llm_byte_stats" ->
      """WITH ch AS (
           SELECT doc_id, substring(text, t.i, 1) AS c
           FROM documents, unnest(generate_series(1, length(text))) t(i)
           WHERE length(text) > 0),
         cnt AS (
           SELECT doc_id, ord(c) AS b, CAST(count(*) AS BIGINT) AS c
           FROM ch GROUP BY 1, 2),
         tot AS (
           SELECT doc_id, CAST(length(text) AS BIGINT) AS n
           FROM documents WHERE length(text) > 0),
         agg AS (
           SELECT cnt.doc_id,
                  CAST(count(*) AS BIGINT) AS distinct_bytes,
                  first(b ORDER BY c DESC, b ASC) AS modal_byte,
                  max(c) AS modal_count,
                  sum((256 * c - t.n) * (256 * c - t.n)) AS present_chi2
           FROM cnt JOIN tot t ON cnt.doc_id = t.doc_id
           GROUP BY 1)
         SELECT a.doc_id, t.n AS n_bytes, a.distinct_bytes,
                CAST(a.modal_byte AS BIGINT) AS modal_byte, a.modal_count,
                CAST(a.present_chi2
                     + (256 - a.distinct_bytes) * t.n * t.n AS BIGINT)
                  AS chi2_u
         FROM agg a JOIN tot t ON a.doc_id = t.doc_id
         ORDER BY a.doc_id""",
    "llm_frames" ->
      """SELECT doc_id, CAST(t.i AS INT) AS frame_idx,
                CAST(length(substring(text, t.i*64 + 1, 64)) AS BIGINT)
                  AS n_bytes,
                md5(substring(text, t.i*64 + 1, 64)) AS frame_hash
         FROM documents d,
              unnest(generate_series(0, (length(d.text) - 1) // 64)) t(i)
         WHERE t.i % 2 = 0 AND length(d.text) > 0
         ORDER BY doc_id, frame_idx""",
    // Re-derives the full BMP resize path byte-for-byte: output byte i of
    // the 8x8x3 result maps to pixel p=i//3 channel c=i%3 at (x,y) =
    // (p%8, p//8); nearest-neighbor reads source (x*w//8, y*h//8); the
    // source pixel byte (sy*w+sx)*3+c tiles the document text (all
    // operands non-negative, so DuckDB // == Spark/Scala int division).
    // src_bytes re-derives encode's padded row stride ((3w+3)//4*4).
    "llm_resize" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 12) + 4 AS w,
                  (doc_id % 12) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i AS i,
                  substring(text,
                    ((((((t.i // 3) // 8) * h) // 8) * w
                      + ((((t.i // 3) % 8) * w) // 8)) * 3
                     + (t.i % 3)) % n + 1, 1) AS ch
           FROM d, unnest(generate_series(0, 191)) t(i)),
         s AS (
           SELECT doc_id, string_agg(ch, '' ORDER BY i) AS sp
           FROM px GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(d.w AS INT) AS src_w, CAST(d.h AS INT) AS src_h,
                CAST(54 + ((d.w * 3 + 3) // 4) * 4 * d.h AS BIGINT)
                  AS src_bytes,
                CAST(246 AS BIGINT) AS n_bytes,
                md5(s.sp) AS pix_hash
         FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""",
    // Channel c of pixel byte j is j % 3 (BGR triples); byte j tiles the
    // document text, so each channel sum is an ord() aggregate over every
    // third character tile — exact integers end to end.
    "llm_image_features" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 12) + 4 AS w,
                  (doc_id % 12) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i % 3 AS c,
                  ord(substring(text, (t.i % n) + 1, 1)) AS v
           FROM d, unnest(generate_series(0, w * h * 3 - 1)) t(i)),
         agg AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_b,
                  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
                  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_r,
                  CAST(max(v) AS BIGINT) AS peak
           FROM px GROUP BY 1)
         SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
                a.sum_b, a.sum_g, a.sum_r, a.peak
         FROM d JOIN agg a USING (doc_id) ORDER BY d.doc_id""",
    // LZW is lossless: the decoded index stream equals the single-channel
    // source tiles (w·h of them, not w·h·3 — GIF is palette-indexed).
    // the RLE encoder replayed in SQL: first islands pass groups equal
    // consecutive pixels per scanline, second pass groups consecutive
    // SINGLETON islands into raw stretches (seg = running count of
    // run-islands before each); costs chunk at 128 exactly as the
    // greedy encoder does. 18 = the TGA header.
    "llm_image_tga" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 16) + 4 AS w,
                  (doc_id % 12) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i AS i, (t.i // w) AS y, (t.i % w) AS x,
                  substring(text, CAST(((t.i // 3) % n) + 1 AS INT), 1)
                    AS ch
           FROM d, unnest(generate_series(0, w * h - 1)) t(i)),
         isl0 AS (
           SELECT doc_id, i, y, x, ch,
                  CASE WHEN x = 0 OR lag(ch) OVER (
                      PARTITION BY doc_id, y ORDER BY x) <> ch
                    THEN 1 ELSE 0 END AS brk
           FROM px),
         isl1 AS (
           SELECT doc_id, y, ch,
                  sum(brk) OVER (PARTITION BY doc_id, y ORDER BY x)
                    AS grp
           FROM isl0),
         runs AS (
           SELECT doc_id, y, grp, count(*) AS len
           FROM isl1 GROUP BY 1, 2, 3),
         runs2 AS (
           SELECT doc_id, y, grp, len,
                  sum(CASE WHEN len >= 2 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id, y ORDER BY grp) AS seg
           FROM runs),
         runcost AS (
           SELECT doc_id,
                  CAST(sum(2 * ((len + 127) // 128)) AS BIGINT) AS b
           FROM runs2 WHERE len >= 2 GROUP BY 1),
         rawgrp AS (
           SELECT doc_id, y, seg, count(*) AS m
           FROM runs2 WHERE len = 1 GROUP BY 1, 2, 3),
         rawcost AS (
           SELECT doc_id,
                  CAST(sum(m + (m + 127) // 128) AS BIGINT) AS b
           FROM rawgrp GROUP BY 1),
         feat AS (
           SELECT doc_id, string_agg(ch, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch)) AS BIGINT) AS sum_pix
           FROM px GROUP BY doc_id)
         SELECT d.doc_id, CAST(d.w AS INT) AS width,
                CAST(d.h AS INT) AS height, f.sum_pix,
                CAST(18 + COALESCE(rc.b, 0) + COALESCE(wc.b, 0)
                  AS BIGINT) AS n_bytes,
                md5(f.sp) AS pix_hash
         FROM d JOIN feat f USING (doc_id)
         LEFT JOIN runcost rc USING (doc_id)
         LEFT JOIN rawcost wc USING (doc_id)
         ORDER BY d.doc_id""",
    "llm_gif_pixels" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 12) + 4 AS w,
                  (doc_id % 12) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i AS i,
                  substring(text, (t.i % n) + 1, 1) AS ch
           FROM d, unnest(generate_series(0, w * h - 1)) t(i)),
         s AS (
           SELECT doc_id, string_agg(ch, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch)) AS BIGINT) AS sum_idx,
                  CAST(max(ord(ch)) AS BIGINT) AS peak_idx
           FROM px GROUP BY doc_id)
         SELECT d.doc_id, CAST(d.w AS INT) AS width,
                CAST(d.h AS INT) AS height,
                s.sum_idx, s.peak_idx, md5(s.sp) AS idx_hash
         FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""",
    // PNG is lossless: the decoded raster equals the source tiles, so the
    // oracle is the BMP-features oracle plus the pixel-string hash (PNG
    // triples are RGB, so c=0 is the red sum here vs blue for BMP).
    "llm_png_pixels" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 12) + 4 AS w,
                  (doc_id % 12) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i AS i, t.i % 3 AS c,
                  substring(text, (t.i % n) + 1, 1) AS ch
           FROM d, unnest(generate_series(0, w * h * 3 - 1)) t(i)),
         s AS (
           SELECT doc_id, string_agg(ch, '' ORDER BY i) AS sp,
                  CAST(sum(CASE WHEN c = 0 THEN ord(ch) END) AS BIGINT)
                    AS sum_r,
                  CAST(sum(CASE WHEN c = 1 THEN ord(ch) END) AS BIGINT)
                    AS sum_g,
                  CAST(sum(CASE WHEN c = 2 THEN ord(ch) END) AS BIGINT)
                    AS sum_b
           FROM px GROUP BY doc_id)
         SELECT d.doc_id, CAST(d.w AS INT) AS width,
                CAST(d.h AS INT) AS height,
                s.sum_r, s.sum_g, s.sum_b, md5(s.sp) AS pix_hash
         FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""",
    // JPEG decodes block-constant tiles exactly (flat quant, DC-only
    // blocks — see the gate comment), so the oracle re-derives every
    // decoded gray byte from its 8x8 BLOCK index: pixel (x, y) carries
    // the text char at block (x//8, y//8) in row-major block order.
    "llm_jpeg_pixels" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 20) + 8 AS w,
                  (doc_id % 20) + 8 AS h,
                  ((length(text) % 20) + 8 + 7) // 8 AS wb
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.i AS i,
                  substring(text,
                    ((((t.i // w) // 8) * wb + ((t.i % w) // 8)) % n) + 1,
                    1) AS ch
           FROM d, unnest(generate_series(0, w * h - 1)) t(i)),
         s AS (
           SELECT doc_id, string_agg(ch, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch)) AS BIGINT) AS sum_v
           FROM px GROUP BY doc_id)
         SELECT d.doc_id, CAST(d.w AS INT) AS width,
                CAST(d.h AS INT) AS height,
                s.sum_v, md5(s.sp) AS pix_hash
         FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""",
    // 4:2:0 color: three block-constant planes re-derived per plane
    // (full-res Y, quarter-res chroma with +3/+11 tile offsets), hash
    // over y||cb||cr concatenation.
    "llm_jpeg_color" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 20) + 8 AS w,
                  (doc_id % 20) + 8 AS h,
                  ((length(text) % 20) + 8 + 7) // 8 AS wby,
                  ((length(text) % 20) + 8 + 1) // 2 AS cw,
                  ((doc_id % 20) + 8 + 1) // 2 AS ch
           FROM documents WHERE length(text) > 0),
         d2 AS (SELECT *, (cw + 7) // 8 AS wbc FROM d),
         py AS (
           SELECT doc_id, t.i AS i,
                  substring(text,
                    ((((t.i // w) // 8) * wby + ((t.i % w) // 8)) % n) + 1,
                    1) AS ch_
           FROM d2, unnest(generate_series(0, w * h - 1)) t(i)),
         pcb AS (
           SELECT doc_id, t.i AS i,
                  substring(text,
                    ((((t.i // cw) // 8) * wbc + ((t.i % cw) // 8) + 3) % n)
                      + 1, 1) AS ch_
           FROM d2, unnest(generate_series(0, cw * ch - 1)) t(i)),
         pcr AS (
           SELECT doc_id, t.i AS i,
                  substring(text,
                    ((((t.i // cw) // 8) * wbc + ((t.i % cw) // 8) + 11) % n)
                      + 1, 1) AS ch_
           FROM d2, unnest(generate_series(0, cw * ch - 1)) t(i)),
         sy AS (
           SELECT doc_id, string_agg(ch_, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch_)) AS BIGINT) AS sum_y
           FROM py GROUP BY doc_id),
         scb AS (
           SELECT doc_id, string_agg(ch_, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch_)) AS BIGINT) AS sum_cb
           FROM pcb GROUP BY doc_id),
         scr AS (
           SELECT doc_id, string_agg(ch_, '' ORDER BY i) AS sp,
                  CAST(sum(ord(ch_)) AS BIGINT) AS sum_cr
           FROM pcr GROUP BY doc_id)
         SELECT d2.doc_id, CAST(d2.w AS INT) AS width,
                CAST(d2.h AS INT) AS height,
                sy.sum_y, scb.sum_cb, scr.sum_cr,
                md5(sy.sp || scb.sp || scr.sp) AS planes_hash
         FROM d2 JOIN sy USING (doc_id) JOIN scb USING (doc_id)
              JOIN scr USING (doc_id)
         ORDER BY d2.doc_id""",
    // Re-derives the synthesized waveform sample by sample (all operands
    // non-negative before the -32768 shift, so % agrees across engines),
    // then window-local lag for strict sign flips; n_bytes checks encode's
    // 44-byte header + 512-byte data layout.
    "llm_audio_features" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
         smp AS (
           SELECT doc_id, t.i AS i,
                  ((ord(substring(text, (t.i % n) + 1, 1)) * 997
                    + t.i * 131) % 65536) - 32768 AS s
           FROM d, unnest(generate_series(0, 255)) t(i)),
         lagged AS (
           SELECT doc_id, i, s,
                  lag(s) OVER (PARTITION BY doc_id, i // 64 ORDER BY i)
                    AS prev
           FROM smp),
         feat AS (
           SELECT doc_id, CAST(i // 64 AS INT) AS win,
                  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sumsq,
                  CAST(count(CASE WHEN prev * s < 0 THEN 1 END) AS BIGINT)
                    AS crossings,
                  CAST(max(abs(s)) AS BIGINT) AS peak
           FROM lagged GROUP BY 1, 2)
         SELECT doc_id, win, CAST(556 AS BIGINT) AS n_bytes,
                sumsq, crossings, peak
         FROM feat ORDER BY doc_id, win""",
    // Decimated stream: sample m of the decimated signal is original
    // sample 3m; one full 64-sample window (m = 0..63), the 22-sample
    // tail dropped exactly as windowFeatures drops partial windows.
    "llm_audio_decimate" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
         smp AS (
           SELECT doc_id, t.m AS m,
                  ((ord(substring(text, ((t.m * 3) % n) + 1, 1)) * 997
                    + t.m * 3 * 131) % 65536) - 32768 AS s
           FROM d, unnest(generate_series(0, 63)) t(m)),
         lagged AS (
           SELECT doc_id, m, s,
                  lag(s) OVER (PARTITION BY doc_id ORDER BY m) AS prev
           FROM smp),
         feat AS (
           SELECT doc_id,
                  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sumsq,
                  CAST(count(CASE WHEN prev * s < 0 THEN 1 END) AS BIGINT)
                    AS crossings,
                  CAST(max(abs(s)) AS BIGINT) AS peak
           FROM lagged GROUP BY 1)
         SELECT doc_id, CAST(0 AS INT) AS win, sumsq, crossings, peak
         FROM feat ORDER BY doc_id, win""",
    // Each MJPEG frame f re-derived as the 17·f-offset block tile; the
    // md5 over the tile string equals the hash of the decompressed
    // plane bytes (ASCII corpus).
    "llm_video_mjpeg" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 20) + 8 AS w,
                  (doc_id % 20) + 8 AS h,
                  ((length(text) % 20) + 8 + 7) // 8 AS wb
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT doc_id, t.f AS f, t2.i AS i,
                  substring(text,
                    ((((t2.i // w) // 8) * wb + ((t2.i % w) // 8)
                      + 17 * t.f) % n) + 1,
                    1) AS ch
           FROM d, unnest(generate_series(0, 2)) t(f),
                unnest(generate_series(0, w * h - 1)) t2(i)),
         s AS (
           SELECT doc_id, f, string_agg(ch, '' ORDER BY i) AS sp
           FROM px GROUP BY 1, 2)
         SELECT d.doc_id, CAST(s.f AS INT) AS frame_idx,
                CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
                md5(s.sp) AS pix_hash
         FROM d JOIN s USING (doc_id) ORDER BY doc_id, frame_idx""",
    // The G.711 expansion in SQL: c = 255 - u (the complement),
    // mantissa = c % 16, exponent = (c // 16) % 8, sign = bit 7;
    // t = (8·mantissa + 132) << exponent; sample = ±(t - 132). Bit-for-bit
    // the formula in graft.multimodal.Wav.mulawExpand.
    "llm_audio_mulaw" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
         code AS (
           SELECT doc_id, t.i AS i,
                  (ord(substring(text, (t.i % n) + 1, 1)) * 31 + t.i * 7)
                    % 256 AS u
           FROM d, unnest(generate_series(0, 255)) t(i)),
         pcm AS (
           SELECT doc_id, i,
                  CASE WHEN (255 - u) >= 128
                       THEN 132 - ((8 * ((255 - u) % 16) + 132)
                                   << (((255 - u) // 16) % 8))
                       ELSE ((8 * ((255 - u) % 16) + 132)
                             << (((255 - u) // 16) % 8)) - 132
                  END AS s
           FROM code),
         lagged AS (
           SELECT doc_id, i, s,
                  lag(s) OVER (PARTITION BY doc_id, i // 64 ORDER BY i)
                    AS prev
           FROM pcm),
         feat AS (
           SELECT doc_id, CAST(i // 64 AS INT) AS win,
                  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sumsq,
                  CAST(count(CASE WHEN prev * s < 0 THEN 1 END) AS BIGINT)
                    AS crossings,
                  CAST(max(abs(s)) AS BIGINT) AS peak
           FROM lagged GROUP BY 1, 2)
         SELECT doc_id, win, sumsq, crossings, peak
         FROM feat ORDER BY doc_id, win""",
    // FLAC features + the full ENCODER bit-cost arithmetic in SQL:
    // synthesized samples → per-frame order-2 residuals (window lag
    // within each 256-sample frame) → zigzag fold → exact Rice
    // parameter argmin over k ∈ 0..14 (ties to smallest k, mirroring
    // Flac.bestK) → per-frame payload bits 48(header)+8(subframe)+
    // 32(warmup)+10(residual header)+Σ((u>>k)+1+k), byte-ceil, +2 CRC
    // bytes; file = 4 magic + 38 STREAMINFO + frames. All operands
    // non-negative before the -2048 shift, so % agrees across engines.
    "llm_audio_flac" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
         smp AS (
           SELECT doc_id, t.i AS i,
                  ((ord(substring(text, (t.i % n) + 1, 1)) * 997
                    + t.i * 131) % 4096) - 2048 AS s
           FROM d, unnest(generate_series(0, 511)) t(i)),
         res AS (
           SELECT doc_id, i // 256 AS f, i % 256 AS j,
                  s - 2 * lag(s, 1) OVER w + lag(s, 2) OVER w AS r
           FROM smp
           WINDOW w AS (PARTITION BY doc_id, i // 256 ORDER BY i)),
         folded AS (
           SELECT doc_id, f,
                  CASE WHEN r >= 0 THEN 2 * r ELSE -2 * r - 1 END AS u
           FROM res WHERE j >= 2),
         kcost AS (
           SELECT doc_id, f, kk.k AS k,
                  CAST(sum((u >> kk.k) + 1 + kk.k) AS BIGINT) AS bits
           FROM folded,
                (SELECT unnest(generate_series(0, 14)) AS k) kk
           GROUP BY doc_id, f, kk.k),
         bestk AS (
           SELECT doc_id, f, bits FROM (
             SELECT doc_id, f, bits,
                    row_number() OVER (PARTITION BY doc_id, f
                      ORDER BY bits, k) AS rn
             FROM kcost) WHERE rn = 1),
         frames AS (
           SELECT doc_id,
                  CAST(sum((48 + 8 + 32 + 10 + bits + 7) // 8 + 2)
                    AS BIGINT) AS fbytes
           FROM bestk GROUP BY doc_id),
         feat AS (
           SELECT doc_id,
                  CAST(sum(CAST(s AS BIGINT) * (i + 1)) AS BIGINT) AS wsum,
                  CAST(max(abs(s)) AS BIGINT) AS peak
           FROM smp GROUP BY doc_id)
         SELECT feat.doc_id, CAST(512 AS BIGINT) AS n_samples, wsum, peak,
                CAST(42 + fbytes AS BIGINT) AS n_bytes
         FROM feat JOIN frames ON frames.doc_id = feat.doc_id
         ORDER BY feat.doc_id""",
    // The IMA ADPCM recurrence as SQL: x = the synthesized samples; the
    // recursive term joins the previous state (pred, idx) to sample i+1
    // and the step table, re-derives the encoder's 4-bit code with the
    // same bit-test cascade (b2/b1/b0 against step, step//2, step//4),
    // reconstructs pred ± (step//8 + b2·step + b1·step//2 + b0·step//4)
    // with int16 clamps, and adapts idx through the standard delta table
    // — block seeds (i % 64 = 0) reset pred to the verbatim sample and
    // carry idx, exactly like the container's block headers.
    "llm_audio_adpcm" -> {
      val steps = graft.multimodal.Adpcm.StepTable.mkString("[", ",", "]")
      s"""WITH RECURSIVE
         d AS (SELECT doc_id, text, length(text) AS n
               FROM documents WHERE length(text) > 0),
         x AS (
           SELECT doc_id, t.i AS i,
                  ((ord(substring(text, ((t.i * 5) % n) + 1, 1)) * 157
                    + t.i * 331) % 4001 - 2000) * 8 AS x
           FROM d, (SELECT unnest(generate_series(0, 127)) AS i) t),
         st AS (SELECT i.i AS idx, l.l[i.i + 1] AS s
                FROM (SELECT $steps AS l) l,
                     (SELECT unnest(generate_series(0, 88)) AS i) i),
         rec(doc_id, i, pred, idx) AS (
           SELECT doc_id, 0, x, 0 FROM x WHERE i = 0
           UNION ALL
           SELECT doc_id, i,
                  CASE WHEN i % 64 = 0 THEN x
                       WHEN sign = 1 THEN
                         CASE WHEN pred - diff < -32768 THEN -32768
                              ELSE pred - diff END
                       ELSE
                         CASE WHEN pred + diff > 32767 THEN 32767
                              ELSE pred + diff END
                  END,
                  CASE WHEN i % 64 = 0 THEN idx
                       WHEN newidx < 0 THEN 0
                       WHEN newidx > 88 THEN 88 ELSE newidx END
           FROM (
             SELECT q.*,
                    (q.step // 8) + q.b2 * q.step + q.b1 * (q.step // 2)
                      + q.b0 * (q.step // 4) AS diff,
                    q.idx + (CASE q.b2 * 4 + q.b1 * 2 + q.b0
                             WHEN 4 THEN 2 WHEN 5 THEN 4
                             WHEN 6 THEN 6 WHEN 7 THEN 8
                             ELSE -1 END) AS newidx
             FROM (
               SELECT p.*,
                      CASE WHEN p.mag
                             - (CASE WHEN p.mag >= p.step
                                THEN p.step ELSE 0 END)
                             - (CASE WHEN p.mag - (CASE WHEN p.mag >= p.step
                                  THEN p.step ELSE 0 END) >= p.step // 2
                                THEN p.step // 2 ELSE 0 END)
                             >= p.step // 4 THEN 1 ELSE 0 END AS b0,
                      CASE WHEN p.mag - (CASE WHEN p.mag >= p.step
                             THEN p.step ELSE 0 END) >= p.step // 2
                           THEN 1 ELSE 0 END AS b1,
                      CASE WHEN p.mag >= p.step THEN 1 ELSE 0 END AS b2
               FROM (
                 SELECT r.doc_id, x.i, x.x, r.pred, r.idx, st.s AS step,
                        CASE WHEN x.x - r.pred < 0 THEN 1 ELSE 0 END AS sign,
                        abs(x.x - r.pred) AS mag
                 FROM rec r
                 JOIN x ON x.doc_id = r.doc_id AND x.i = r.i + 1
                 JOIN st ON st.idx = r.idx
               ) p
             ) q
           )
         )
         SELECT rec.doc_id, count(*) AS n_samples,
                CAST(sum(rec.pred * (rec.i + 1)) AS BIGINT) AS recon_sum,
                CAST(max(CASE WHEN rec.i = 127 THEN rec.pred END) AS BIGINT)
                  AS final_pred,
                CAST(sum(abs(rec.pred - x.x)) AS BIGINT) AS quant_err,
                CAST(max(abs(rec.pred)) AS BIGINT) AS peak
         FROM rec JOIN x ON x.doc_id = rec.doc_id AND x.i = rec.i
         GROUP BY rec.doc_id ORDER BY rec.doc_id"""
    },

    // Kept frame f (0, 2, 4) byte j of the w*h*3 packed pixels tiles the
    // text at offset 17*f — the parser must return exactly the synthesized
    // top-down packed bytes for the hashes to agree.
    "llm_video_frames" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 8) + 4 AS w,
                  (doc_id % 6) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT d.doc_id, t.f AS frame_idx, t2.j AS j,
                  substring(d.text, ((t2.j + 17 * t.f) % d.n) + 1, 1) AS ch
           FROM d,
                unnest(generate_series(0, 5)) t(f),
                unnest(generate_series(0, d.w * d.h * 3 - 1)) t2(j)
           WHERE t.f % 2 = 0),
         s AS (
           SELECT doc_id, frame_idx, string_agg(ch, '' ORDER BY j) AS sp
           FROM px GROUP BY 1, 2)
         SELECT d.doc_id, CAST(s.frame_idx AS INT) AS frame_idx,
                CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
                md5(s.sp) AS pix_hash
         FROM d JOIN s USING (doc_id) ORDER BY doc_id, frame_idx""",
    // Byte j of frame f tiles the text at offset 17*f, so the motion sum
    // is an abs-difference aggregate between the two character tiles.
    "llm_video_motion" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS n,
                  (length(text) % 8) + 4 AS w,
                  (doc_id % 6) + 4 AS h
           FROM documents WHERE length(text) > 0),
         px AS (
           SELECT d.doc_id, t.f AS frame_idx,
                  abs(ord(substring(d.text, ((t2.j + 17 * t.f) % d.n) + 1, 1))
                    - ord(substring(d.text,
                        ((t2.j + 17 * (t.f - 1)) % d.n) + 1, 1))) AS dd
           FROM d,
                unnest(generate_series(1, 5)) t(f),
                unnest(generate_series(0, d.w * d.h * 3 - 1)) t2(j)),
         agg AS (
           SELECT doc_id, frame_idx,
                  CAST(sum(dd) AS BIGINT) AS motion,
                  CAST(max(dd) AS BIGINT) AS peak_diff
           FROM px GROUP BY 1, 2)
         SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, motion,
                peak_diff
         FROM agg ORDER BY doc_id, frame_idx""",
    // Quarantine routing is fully deterministic: every 5th doc's magic
    // byte is corrupted (decode must fail controlled → status
    // 'quarantined', units 0); good payloads report real decoded
    // inventory — pixels for BMP, 256 samples for WAV, 6 frames for AVI.
    "llm_media_quarantine" ->
      """SELECT doc_id,
                CASE doc_id % 3 WHEN 0 THEN 'img/bmp' WHEN 1 THEN 'aud/wav'
                     ELSE 'vid/avi' END AS fmt,
                CASE WHEN doc_id % 5 = 0 THEN 'quarantined' ELSE 'ok' END
                  AS status,
                CAST(CASE WHEN doc_id % 5 = 0 THEN 0
                     WHEN doc_id % 3 = 0
                       THEN ((length(text) % 12) + 4) * ((doc_id % 12) + 4)
                     WHEN doc_id % 3 = 1 THEN 256
                     ELSE 6 END AS BIGINT) AS units
         FROM documents WHERE length(text) > 0 ORDER BY doc_id""",
    // Re-derives all five modality feature streams AND the quarantine
    // routing from text tiles: BMP/PNG pixel sums over w·h·3 tiles
    // (peak for BMP, pixel count for PNG), GIF index sum/peak over w·h
    // single-channel tiles, WAV Σs² + window-local sign flips over the
    // synthesized 256-sample waveform, AVI Σ|frame diff| + peak diff
    // over the 5 inter-frame deltas, FLAC position-weighted sample sum +
    // peak over the 512-sample synthesis; corrupt payloads (doc_id % 6 = 0)
    // must appear exactly once as zeroed quarantine rows.
    "llm_media_pipeline" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
         bmp AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS f1,
                  CAST(max(v) AS BIGINT) AS f2
           FROM (SELECT d.doc_id,
                        ord(substring(d.text, (t.i % d.n) + 1, 1)) AS v
                 FROM d, unnest(generate_series(0,
                        ((d.n % 12) + 4) * ((d.doc_id % 12) + 4) * 3 - 1)) t(i)
                 WHERE d.doc_id % 8 = 0 AND d.doc_id % 6 <> 0)
           GROUP BY doc_id),
         wav AS (
           SELECT doc_id, CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS f1,
                  CAST(count(CASE WHEN i % 64 <> 0 AND prev * s < 0
                             THEN 1 END) AS BIGINT) AS f2
           FROM (SELECT doc_id, i, s,
                        lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                 FROM (SELECT d.doc_id, t.i AS i,
                         ((ord(substring(d.text, (t.i % d.n) + 1, 1)) * 997
                           + t.i * 131) % 65536) - 32768 AS s
                       FROM d, unnest(generate_series(0, 255)) t(i)
                       WHERE d.doc_id % 8 = 1 AND d.doc_id % 6 <> 0))
           GROUP BY doc_id),
         avi AS (
           SELECT doc_id, CAST(sum(dd) AS BIGINT) AS f1,
                  CAST(max(dd) AS BIGINT) AS f2
           FROM (SELECT d.doc_id,
                   abs(ord(substring(d.text,
                         ((t2.j + 17 * t.f) % d.n) + 1, 1))
                     - ord(substring(d.text,
                         ((t2.j + 17 * (t.f - 1)) % d.n) + 1, 1))) AS dd
                 FROM d,
                      unnest(generate_series(1, 5)) t(f),
                      unnest(generate_series(0,
                        ((d.n % 8) + 4) * ((d.doc_id % 6) + 4) * 3 - 1)) t2(j)
                 WHERE d.doc_id % 8 = 2 AND d.doc_id % 6 <> 0)
           GROUP BY doc_id),
         png AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS f1,
                  CAST(((any_value(n) % 12) + 4) * ((doc_id % 12) + 4)
                    AS BIGINT) AS f2
           FROM (SELECT d.doc_id, d.n,
                        ord(substring(d.text, (t.i % d.n) + 1, 1)) AS v
                 FROM d, unnest(generate_series(0,
                        ((d.n % 12) + 4) * ((d.doc_id % 12) + 4) * 3 - 1)) t(i)
                 WHERE d.doc_id % 8 = 3 AND d.doc_id % 6 <> 0)
           GROUP BY doc_id),
         gif AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS f1,
                  CAST(max(v) AS BIGINT) AS f2
           FROM (SELECT d.doc_id,
                        ord(substring(d.text, (t.i % d.n) + 1, 1)) AS v
                 FROM d, unnest(generate_series(0,
                        ((d.n % 12) + 4) * ((d.doc_id % 12) + 4) - 1)) t(i)
                 WHERE d.doc_id % 8 = 4 AND d.doc_id % 6 <> 0)
           GROUP BY doc_id),
         jd AS (
           SELECT doc_id, text, n, (n % 20) + 8 AS w, (doc_id % 20) + 8 AS h,
                  ((n % 20) + 8 + 7) // 8 AS wb
           FROM d WHERE doc_id % 8 = 5 AND doc_id % 6 <> 0),
         jpeg AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS f1,
                  CAST(any_value(w) * any_value(h) AS BIGINT) AS f2
           FROM (SELECT jd.doc_id, jd.w, jd.h,
                        ord(substring(jd.text,
                          ((((t.i // jd.w) // 8) * jd.wb
                            + ((t.i % jd.w) // 8)) % jd.n) + 1, 1)) AS v
                 FROM jd, unnest(generate_series(0, jd.w * jd.h - 1)) t(i))
           GROUP BY doc_id),
         ax AS (
           SELECT doc_id, t.i AS i,
                  ((ord(substring(text, ((t.i * 5) % n) + 1, 1)) * 157
                    + t.i * 331) % 4001 - 2000) * 8 AS x
           FROM d, (SELECT unnest(generate_series(0, 127)) AS i) t
           WHERE doc_id % 8 = 6 AND doc_id % 6 <> 0),
         ast AS (SELECT i.i AS idx, l.l[i.i + 1] AS s
                 FROM (SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,22385,24623,27086,29794,32767] AS l) l,
                      (SELECT unnest(generate_series(0, 88)) AS i) i),
         arec(doc_id, i, pred, idx) AS (
           SELECT doc_id, 0, x, 0 FROM ax WHERE i = 0
           UNION ALL
           SELECT doc_id, i,
                  CASE WHEN i % 64 = 0 THEN x
                       WHEN sign = 1 THEN
                         CASE WHEN pred - diff < -32768 THEN -32768
                              ELSE pred - diff END
                       ELSE
                         CASE WHEN pred + diff > 32767 THEN 32767
                              ELSE pred + diff END
                  END,
                  CASE WHEN i % 64 = 0 THEN idx
                       WHEN newidx < 0 THEN 0
                       WHEN newidx > 88 THEN 88 ELSE newidx END
           FROM (
             SELECT q.*,
                    (q.step // 8) + q.b2 * q.step + q.b1 * (q.step // 2)
                      + q.b0 * (q.step // 4) AS diff,
                    q.idx + (CASE q.b2 * 4 + q.b1 * 2 + q.b0
                             WHEN 4 THEN 2 WHEN 5 THEN 4
                             WHEN 6 THEN 6 WHEN 7 THEN 8
                             ELSE -1 END) AS newidx
             FROM (
               SELECT p.*,
                      CASE WHEN p.mag
                             - (CASE WHEN p.mag >= p.step
                                THEN p.step ELSE 0 END)
                             - (CASE WHEN p.mag - (CASE WHEN p.mag >= p.step
                                  THEN p.step ELSE 0 END) >= p.step // 2
                                THEN p.step // 2 ELSE 0 END)
                             >= p.step // 4 THEN 1 ELSE 0 END AS b0,
                      CASE WHEN p.mag - (CASE WHEN p.mag >= p.step
                             THEN p.step ELSE 0 END) >= p.step // 2
                           THEN 1 ELSE 0 END AS b1,
                      CASE WHEN p.mag >= p.step THEN 1 ELSE 0 END AS b2
               FROM (
                 SELECT r.doc_id, x.i, x.x, r.pred, r.idx, ast.s AS step,
                        CASE WHEN x.x - r.pred < 0 THEN 1 ELSE 0 END AS sign,
                        abs(x.x - r.pred) AS mag
                 FROM arec r
                 JOIN ax x ON x.doc_id = r.doc_id AND x.i = r.i + 1
                 JOIN ast ON ast.idx = r.idx
               ) p
             ) q
           )
         ),
         adpcm AS (
           SELECT doc_id, CAST(sum(pred * (i + 1)) AS BIGINT) AS f1,
                  CAST(max(abs(pred)) AS BIGINT) AS f2
           FROM arec GROUP BY doc_id),
         flac AS (
           SELECT doc_id, CAST(sum(CAST(s AS BIGINT) * (i + 1)) AS BIGINT)
                    AS f1,
                  CAST(max(abs(s)) AS BIGINT) AS f2
           FROM (SELECT d.doc_id, t.i AS i,
                        ((ord(substring(d.text, (t.i % d.n) + 1, 1)) * 997
                          + t.i * 131) % 4096) - 2048 AS s
                 FROM d, unnest(generate_series(0, 511)) t(i)
                 WHERE d.doc_id % 8 = 7 AND d.doc_id % 6 <> 0)
           GROUP BY doc_id),
         routed AS (
           SELECT doc_id,
                  CASE doc_id % 8 WHEN 0 THEN 'img/bmp' WHEN 1 THEN 'aud/wav'
                       WHEN 2 THEN 'vid/avi' WHEN 3 THEN 'img/png'
                       WHEN 4 THEN 'img/gif' WHEN 5 THEN 'img/jpeg'
                       WHEN 6 THEN 'aud/adpcm'
                       ELSE 'aud/flac' END AS fmt,
                  CASE WHEN doc_id % 6 = 0 THEN 'quarantined' ELSE 'ok' END
                    AS status
           FROM d)
         SELECT r.doc_id, r.fmt, r.status,
                CAST(coalesce(b.f1, w.f1, a.f1, p.f1, g.f1, j.f1, ad.f1,
                    fl.f1, 0) AS BIGINT) AS f1,
                CAST(coalesce(b.f2, w.f2, a.f2, p.f2, g.f2, j.f2, ad.f2,
                    fl.f2, 0) AS BIGINT) AS f2
         FROM routed r
         LEFT JOIN bmp b USING (doc_id) LEFT JOIN wav w USING (doc_id)
         LEFT JOIN avi a USING (doc_id) LEFT JOIN png p USING (doc_id)
         LEFT JOIN gif g USING (doc_id) LEFT JOIN jpeg j USING (doc_id)
         LEFT JOIN adpcm ad USING (doc_id)
         LEFT JOIN flac fl USING (doc_id)
         ORDER BY r.doc_id"""
  )
}
