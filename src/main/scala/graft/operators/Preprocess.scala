package graft.operators

import graft.model.Frame

/** The reference's preprocessing path (SURVEY.md §2.2 P2, P4–P8),
  * re-homed where it belongs in Spark: INSIDE the partition-scoped
  * inference stage. These are transient tensor ops — they never
  * appear in a schema and never cross a partition boundary, exactly
  * like the reference's ndarray stages
  * (`gst-detection-tf.py:252-283,346-384`).
  *
  * All kernels are real implementations (pure JVM float math); only
  * the entry from encoded media to raw RGB bytes is the stub seam
  * (Multimodal.Codec), since this container ships no codecs.
  */
object Preprocess {

  /** Transient HWC float tensor (channels-last, like the decoded
    * `np.ndarray(h, w, 3)` of `gst-detection-tf.py:252-254`). */
  final case class Tensor(height: Int, width: Int, channels: Int,
      data: Array[Float]) {
    require(data.length == height * width * channels,
      s"tensor shape ${height}x${width}x$channels != ${data.length} values")
  }

  /** P2: buffer → tensor reinterpret. Packed RGB uint8 bytes become
    * an HWC float tensor (0..255). An empty/short buffer (hermetic
    * tests) zero-fills — deterministic, like a black frame. */
  def decodeBuffer(f: Frame): Tensor = {
    val n = f.height * f.width * 3
    val out = new Array[Float](n)
    val m = math.min(n, if (f.data == null) 0 else f.data.length)
    var i = 0
    while (i < m) { out(i) = (f.data(i) & 0xff).toFloat; i += 1 }
    Tensor(f.height, f.width, 3, out)
  }

  /** P4 (cv2 path): min-max normalize to [0,1]
    * (`gst-detection-tf.py:352-354`). Constant image → zeros. */
  def normalizeMinMax(t: Tensor): Tensor = {
    var mn = Float.MaxValue; var mx = Float.MinValue
    t.data.foreach { v => if (v < mn) mn = v; if (v > mx) mx = v }
    val range = if (mx > mn) mx - mn else 1.0f
    Tensor(t.height, t.width, t.channels, t.data.map(v => (v - mn) / range))
  }

  /** P5 (np path): /255 then per-channel (x-mean)/std with the
    * ImageNet constants of `gst-detection-tf.py:259-264`. */
  val ImagenetMean: Array[Float] = Array(0.485f, 0.456f, 0.406f)
  val ImagenetStd: Array[Float] = Array(0.229f, 0.224f, 0.225f)
  def normalizeImagenet(t: Tensor): Tensor = {
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < t.data.length) {
      val c = i % t.channels
      out(i) = (t.data(i) / 255.0f - ImagenetMean(c)) / ImagenetStd(c)
      i += 1
    }
    Tensor(t.height, t.width, t.channels, out)
  }

  /** P6 (tf path): per-image standardization —
    * (x - mean) / max(stddev, 1/sqrt(N)), the
    * tf.image.per_image_standardization contract
    * (`gst-detection-tf.py:362`). */
  def standardize(t: Tensor): Tensor = {
    val n = t.data.length
    var sum = 0.0; var sumSq = 0.0
    t.data.foreach { v => sum += v; sumSq += v.toDouble * v }
    val mean = sum / n
    val variance = math.max(0.0, sumSq / n - mean * mean)
    val adjStd = math.max(math.sqrt(variance), 1.0 / math.sqrt(n.toDouble))
    Tensor(t.height, t.width, t.channels,
      t.data.map(v => ((v - mean) / adjStd).toFloat))
  }

  /** Augmentation kernels (training-data image transforms, the
    * P-family beyond resize): pure integer pixel PERMUTATIONS over
    * interleaved row-major RGB byte arrays — exact by construction,
    * so their outputs restate arithmetically under the hash gate
    * (m21). Conventions: pixel (row r, col c) lives at byte
    * 3·(r·w + c) + channel. */
  object Augment {
    /** horizontal mirror: out[r, c] = in[r, w-1-c]; dims unchanged. */
    def hflip(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
      Array.tabulate(rgb.length) { j =>
        val p = j / 3; val ch = j % 3
        val r = p / w; val c = p % w
        rgb(3 * (r * w + (w - 1 - c)) + ch)
      }

    /** 90° clockwise rotation: out dims (w_out, h_out) = (h, w);
      * out[r', c'] = in[h-1-c', r']. */
    def rot90cw(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val outW = h
      Array.tabulate(rgb.length) { j =>
        val p = j / 3; val ch = j % 3
        val r2 = p / outW; val c2 = p % outW
        rgb(3 * ((h - 1 - c2) * w + r2) + ch)
      }
    }

    /** 1-pixel-border center crop: out dims (w-2, h-2);
      * out[r', c'] = in[r'+1, c'+1]. Requires w, h >= 3. */
    def centerCrop(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val outW = w - 2; val outH = h - 2
      Array.tabulate(outW * outH * 3) { j =>
        val p = j / 3; val ch = j % 3
        val r2 = p / outW; val c2 = p % outW
        rgb(3 * ((r2 + 1) * w + (c2 + 1)) + ch)
      }
    }
  }

  /** P7: bilinear resize (the cv2.resize /
    * tf.image.resize(BILINEAR) kernel, `gst-detection-tf.py:356,364,374`),
    * align_corners=false / half-pixel centers. */
  def resizeBilinear(t: Tensor, outH: Int, outW: Int): Tensor = {
    if (outH == t.height && outW == t.width) return t
    val out = new Array[Float](outH * outW * t.channels)
    val sy = t.height.toDouble / outH
    val sx = t.width.toDouble / outW
    var y = 0
    while (y < outH) {
      val fy = math.max(0.0, (y + 0.5) * sy - 0.5)
      val y0 = math.min(t.height - 1, fy.toInt)
      val y1 = math.min(t.height - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < outW) {
        val fx = math.max(0.0, (x + 0.5) * sx - 0.5)
        val x0 = math.min(t.width - 1, fx.toInt)
        val x1 = math.min(t.width - 1, x0 + 1)
        val wx = fx - x0
        var c = 0
        while (c < t.channels) {
          def px(yy: Int, xx: Int): Float =
            t.data((yy * t.width + xx) * t.channels + c)
          val top = px(y0, x0) * (1 - wx) + px(y0, x1) * wx
          val bot = px(y1, x0) * (1 - wx) + px(y1, x1) * wx
          out((y * outW + x) * t.channels + c) =
            (top * (1 - wy) + bot * wy).toFloat
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Tensor(outH, outW, t.channels, out)
  }

  /** P8: HWC → NCHW (batch dim 1) for GPU-style layouts
    * (`gst-detection-tf.py:269-283`). */
  def toNCHW(t: Tensor): Array[Float] = {
    val out = new Array[Float](t.data.length)
    val hw = t.height * t.width
    var i = 0
    while (i < t.data.length) {
      val c = i % t.channels
      out(c * hw + i / t.channels) = t.data(i)
      i += 1
    }
    out
  }

  /** The preproc_fw strategy knob (`settings.yaml:4`,
    * `gst-detection-tf.py:351-379`): kernel chosen once at plan
    * time, not per record. */
  def normalizer(kind: String): Tensor => Tensor = kind match {
    case "cv2" => normalizeMinMax
    case "np" => normalizeImagenet
    case "tf" => standardize
    case other =>
      throw new IllegalArgumentException(s"unknown preproc_fw: $other")
  }

  /** Full preprocess chain: decode → normalize → resize → layout.
    * Mirrors `processSingleFrame`'s preprocess leg
    * (`gst-detection-tf.py:346-384`). */
  def pipeline(frame: Frame, preprocFw: String, modelH: Int, modelW: Int,
      nchw: Boolean): Array[Float] = {
    val resized = resizeBilinear(normalizer(preprocFw)(decodeBuffer(frame)),
      modelH, modelW)
    if (nchw) toNCHW(resized) else resized.data
  }
}

/** M1/M3: model lifecycle + device/precision dispatch
  * (`gst-detection-tf.py:154-237`, `settings.yaml:1-9`). The config
  * picks the detector implementation and the preprocessing strategy
  * once; executors initialize per partition (Detect.detect). */
final case class DetectorConfig(
    device: String = "CPU",           // CPU | GPU (ARCGPU in reference)
    dataType: String = "FP32",        // FP32 | BF16 | INT8 — model-artifact choice
    preprocFw: String = "np",         // cv2 | np | tf
    modelPath: Option[String] = None, // frozen-graph / ONNX artifact
    modelInput: Int = 1200,           // 1200x1200 (settings.yaml:17-18)
    labelDomain: Int = 25)            // class-id domain = label-table size
                                      // (sources/Labels default dim)

object Detectors {
  /** Resolve a detector factory from config. A `.gnet` model path
    * loads the bundled pure-JVM runtime (GraftNetDetector: real
    * per-partition weight load + real forward pass over the real
    * preprocessing chain — the M1/M2 lifecycle of
    * `gst-detection-tf.py:200-237` with a JVM scorer). Other
    * artifact kinds (frozen TF graphs, ONNX) have no runtime in this
    * container and fail fast. With no modelPath the deterministic
    * stub serves tests/oracles. Precision (M3) selects the
    * artifact — opaque to the engine, exactly as in the reference. */
  def forConfig(cfg: DetectorConfig): () => Detector = cfg.modelPath match {
    case Some(p) if p.endsWith(".gnet") => () => new GraftNetDetector(p, cfg)
    case Some(p) =>
      throw new UnsupportedOperationException(
        s"no inference runtime bundled for model artifact $p " +
          s"(device=${cfg.device}, dtype=${cfg.dataType}); " +
          "use a .gnet artifact or plug an ONNX/TF-Java Detector here")
    case None => () => new PreprocessingDetector(StubDetector, cfg)
  }

  /** M3 precision → bundled artifact (the reference's benchmark.sh
    * maps each precision to its own frozen graph, benchmark.sh:22-69;
    * here FP32/INT8 map to the two committed .gnet files). BF16 has
    * no JVM representation without an accelerated runtime — fail
    * fast, like any other unbundled artifact kind. */
  def bundledArtifact(dataType: String): String = dataType match {
    case "FP32" => GraftNet.BundledModel
    case "INT8" => GraftNet.BundledModelInt8
    case other => throw new UnsupportedOperationException(
      s"no bundled artifact for dtype $other (BF16 needs an " +
        "accelerated runtime; see DEPLOYMENT.md)")
  }
}

/** Decorator that runs the real preprocessing chain before
  * delegating to the scoring backend — the processSingleFrame
  * composition (`gst-detection-tf.py:405-419`) with the preproc
  * kernels actually exercised. */
final class PreprocessingDetector(inner: Detector, cfg: DetectorConfig)
    extends Detector {
  override def detectBatch(frames: Seq[Frame]): Seq[Seq[graft.model.RawDetection]] = {
    // tensors feed the model in a real backend; the stub scores by
    // frame_id, so the tensors' only job here is exercising the path
    frames.foreach { f =>
      Preprocess.pipeline(f, cfg.preprocFw, cfg.modelInput, cfg.modelInput,
        nchw = cfg.device != "CPU")
    }
    inner.detectBatch(frames)
  }
}
