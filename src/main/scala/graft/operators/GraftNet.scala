package graft.operators

import graft.model.{Frame, RawDetection}

/** A REAL, pure-JVM inference runtime behind the M1/M2 seam.
  *
  * The reference loads a frozen graph and runs sessions per process
  * (`gst-detection-tf.py:200-237,288-289`); no TF/ONNX runtime ships
  * in this container and the build allows no new dependencies, so
  * the runtime here is a small MLP scorer implemented directly:
  * a committed `.gnet` weight artifact (text: layer dims + row-major
  * weights + biases) is loaded ONCE PER PARTITION, frames run the
  * full P4–P8 preprocessing chain (normalize → bilinear resize →
  * layout), are grid-average-pooled to a fixed feature vector, and a
  * real forward pass (matmul + bias + ReLU, sigmoid-decoded heads)
  * produces the detection arrays. Every number the detector emits is
  * computed from the actual pixel bytes — nothing is fabricated —
  * while `StubDetector` stays the oracle-path double (its integer
  * arithmetic is restatable in SQL; a float MLP is not).
  */
final class GraftNet private (
    val layers: Seq[(Array[Array[Float]], Array[Float])]) extends Serializable {

  /** in-features of the first layer. */
  def inputSize: Int = layers.head._1(0).length
  def outputSize: Int = layers.last._1.length

  /** Forward pass: x · Wᵀ + b per layer, ReLU between layers, raw
    * logits out of the last. */
  def forward(x: Array[Float]): Array[Float] = {
    require(x.length == inputSize,
      s"input size ${x.length} != expected $inputSize")
    var cur = x
    var li = 0
    while (li < layers.length) {
      val (w, b) = layers(li)
      val out = new Array[Float](w.length)
      var o = 0
      while (o < w.length) {
        val row = w(o)
        var acc = b(o).toDouble
        var i = 0
        while (i < row.length) { acc += row(i).toDouble * cur(i); i += 1 }
        out(o) =
          if (li < layers.length - 1 && acc < 0) 0f // ReLU on hidden
          else acc.toFloat
        o += 1
      }
      cur = out
      li += 1
    }
    cur
  }
}

object GraftNet {
  /** The committed tiny-detector artifact (see tools/gen_model.py
    * for the deterministic generator that produced it). */
  val BundledModel = "resource:/graft/tiny_detector.gnet"

  /** The same detector int8-quantized (s5 scheme: per-layer
    * symmetric scale, dequantized storage) — precision is an
    * artifact property, opaque to the runtime, exactly like the
    * reference's per-dtype frozen graphs (`benchmark.sh:22-69`). */
  val BundledModelInt8 = "resource:/graft/tiny_detector_int8.gnet"

  /** Load a `.gnet` artifact from a file path or, with a
    * `resource:` prefix, from the classpath (the bundled model). */
  def load(path: String): GraftNet = {
    val src =
      if (path.startsWith("resource:")) {
        val in = getClass.getResourceAsStream(path.stripPrefix("resource:"))
        require(in != null, s"model resource not found: $path")
        try scala.io.Source.fromInputStream(in).mkString finally in.close()
      } else {
        val f = new java.io.File(path)
        require(f.isFile, s"model artifact not found: $path")
        java.nio.file.Files.readString(f.toPath)
      }
    parse(src)
  }

  /** Format: `gnet 1` header, then per layer `layer <in> <out>`,
    * `<out>` lines of `<in>` weights, one line of `<out>` biases. */
  def parse(text: String): GraftNet = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    require(lines.headOption.exists(_.startsWith("gnet ")),
      "not a gnet artifact: missing 'gnet' magic")
    val layers = Vector.newBuilder[(Array[Array[Float]], Array[Float])]
    var i = 1
    while (i < lines.length) {
      val Array(tag, inS, outS) = lines(i).split("\\s+", 3)
      require(tag == "layer", s"expected 'layer', got '$tag'")
      val (nIn, nOut) = (inS.toInt, outS.toInt)
      val w = Array.tabulate(nOut) { r =>
        val vs = lines(i + 1 + r).split("\\s+").map(_.toFloat)
        require(vs.length == nIn, s"layer row $r: ${vs.length} != $nIn")
        vs
      }
      val b = lines(i + 1 + nOut).split("\\s+").map(_.toFloat)
      require(b.length == nOut, s"bias: ${b.length} != $nOut")
      layers += ((w, b))
      i += 2 + nOut
    }
    val net = new GraftNet(layers.result())
    require(net.layers.nonEmpty, "gnet artifact has no layers")
    net
  }
}

/** M1+M2 for real: per-partition model load (`Detectors.forConfig`
  * hands one factory per partition to Detect.detect), micro-batched
  * scoring, and the P4–P8 kernels as the ACTUAL preprocessing of the
  * forward pass — the processSingleFrame composition
  * (`gst-detection-tf.py:405-419`) with every stage live.
  */
final class GraftNetDetector(modelPath: String, cfg: DetectorConfig)
    extends Detector {
  import GraftNetDetector._

  // loaded once per detector instance = once per partition
  private val net: GraftNet = GraftNet.load(modelPath)
  private val normalize = Preprocess.normalizer(cfg.preprocFw)
  require(net.outputSize % 6 == 0,
    s"head size ${net.outputSize} not a multiple of 6 (boxes x " +
      "(ymin,xmin,ymax,xmax,score,class))")
  private val grid = math.sqrt(net.inputSize / 3.0).toInt
  require(grid * grid * 3 == net.inputSize,
    s"input size ${net.inputSize} is not a 3-channel square grid")

  private def features(f: Frame): Array[Float] = {
    val t = Preprocess.resizeBilinear(
      normalize(Preprocess.decodeBuffer(f)), cfg.modelInput, cfg.modelInput)
    gridPool(t, grid)
  }

  // class-id domain comes from the config (= label-table size), not
  // a hardcoded 25: a differently-sized label file would otherwise
  // silently mis-bucket class ids
  private val nLabels = cfg.labelDomain
  require(nLabels > 0, s"labelDomain must be positive, got $nLabels")

  /** Decode one head of 6 logits into a detection: sigmoid-squashed
    * center/size box (always a valid [0,1] rectangle), sigmoid
    * score, class bucketed into the label-dim domain. */
  private def decodeHead(o: Array[Float], base: Int): RawDetection = {
    val cy = sigmoid(o(base)); val cx = sigmoid(o(base + 1))
    val bh = sigmoid(o(base + 2)) * 0.5; val bw = sigmoid(o(base + 3)) * 0.5
    val ymin = math.max(0.0, cy - bh / 2); val xmin = math.max(0.0, cx - bw / 2)
    val ymax = math.min(1.0, cy + bh / 2); val xmax = math.min(1.0, cx + bw / 2)
    val score = sigmoid(o(base + 4))
    val cls = math.min(nLabels - 1, (sigmoid(o(base + 5)) * nLabels).toInt)
    RawDetection(ymin.toFloat, xmin.toFloat, ymax.toFloat, xmax.toFloat,
      score.toFloat, cls)
  }

  override def detectBatch(frames: Seq[Frame]): Seq[Seq[RawDetection]] =
    frames.map { f =>
      val out = net.forward(features(f))
      (0 until out.length / 6).map(i => decodeHead(out, i * 6))
    }
}

object GraftNetDetector {
  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Grid average pooling: HWC tensor → g×g×3 feature vector (cell
    * means per channel) — the fixed-size bridge from any model-input
    * resolution to the MLP. */
  def gridPool(t: Preprocess.Tensor, g: Int): Array[Float] = {
    val out = new Array[Float](g * g * 3)
    val counts = new Array[Int](g * g)
    var y = 0
    while (y < t.height) {
      val gy = math.min(g - 1, y * g / t.height)
      var x = 0
      while (x < t.width) {
        val gx = math.min(g - 1, x * g / t.width)
        val cell = gy * g + gx
        counts(cell) += 1
        var c = 0
        while (c < 3) {
          out(cell * 3 + c) += t.data((y * t.width + x) * t.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    var cell = 0
    while (cell < g * g) {
      if (counts(cell) > 0) {
        var c = 0
        while (c < 3) { out(cell * 3 + c) /= counts(cell); c += 1 }
      }
      cell += 1
    }
    out
  }
}
