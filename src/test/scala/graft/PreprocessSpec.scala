package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Frame
import graft.operators.{Detect, DetectorConfig, Detectors, Preprocess, StubDetector}
import graft.operators.Preprocess.Tensor

class PreprocessSpec extends AnyFunSuite {

  private def frame(id: Long, h: Int, w: Int, bytes: Array[Byte]) =
    Frame("v", id, new Timestamp(0L), h, w, bytes)

  test("decodeBuffer: packed RGB bytes to HWC floats, zero-fill short") {
    val t = Preprocess.decodeBuffer(
      frame(1, 1, 2, Array[Byte](0, 127, -1))) // -1 = 255 unsigned
    assert(t.data.toSeq === Seq(0f, 127f, 255f, 0f, 0f, 0f))
  }

  test("min-max normalize maps to [0,1]; constant image to zeros") {
    val t = Preprocess.normalizeMinMax(Tensor(1, 2, 3,
      Array(0f, 50f, 100f, 150f, 200f, 250f)))
    assert(t.data.head === 0f && t.data.last === 1f)
    assert(t.data(2) === 0.4f)
    val const = Preprocess.normalizeMinMax(Tensor(1, 1, 3, Array(7f, 7f, 7f)))
    assert(const.data.forall(_ === 0f))
  }

  test("imagenet normalize applies per-channel constants") {
    val t = Preprocess.normalizeImagenet(Tensor(1, 1, 3,
      Array(255f, 255f, 255f)))
    val exp = (0 until 3).map(c =>
      (1.0f - Preprocess.ImagenetMean(c)) / Preprocess.ImagenetStd(c))
    assert(t.data.toSeq === exp)
  }

  test("per-image standardization: mean ~0, adjusted std ~1") {
    val vals = Array.tabulate(48)(i => i.toFloat)
    val t = Preprocess.standardize(Tensor(4, 4, 3, vals))
    val mean = t.data.sum / t.data.length
    assert(math.abs(mean) < 1e-5)
    val varr = t.data.map(v => (v - mean) * (v - mean)).sum / t.data.length
    assert(math.abs(math.sqrt(varr) - 1.0) < 1e-4)
  }

  test("bilinear resize: identity is exact, 1x2 to 1x4 interpolates") {
    val t = Tensor(1, 2, 1, Array(0f, 100f))
    assert(Preprocess.resizeBilinear(t, 1, 2) eq t)
    val r = Preprocess.resizeBilinear(t, 1, 4)
    // half-pixel centers: x=0 -> 0, x=1 -> 25, x=2 -> 75, x=3 -> 100
    assert(r.data.toSeq === Seq(0f, 25f, 75f, 100f))
  }

  test("HWC to NCHW transpose") {
    // 1x2 image, channels (r,g,b): [r0 g0 b0 r1 g1 b1]
    val t = Tensor(1, 2, 3, Array(1f, 2f, 3f, 4f, 5f, 6f))
    assert(Preprocess.toNCHW(t).toSeq === Seq(1f, 4f, 2f, 5f, 3f, 6f))
  }

  test("preproc_fw dispatch: unknown kernel rejected (GDT:378-379)") {
    intercept[IllegalArgumentException](Preprocess.normalizer("torch"))
  }

  test("Augment kernels: hand-checked 2x3 image; flip is an involution, " +
    "rot90 four times is identity, crop drops the border") {
    import graft.operators.Preprocess.Augment
    // 3 wide x 2 tall; pixel (r,c) has bytes (10r+c, 100+10r+c, 200+10r+c)
    val w = 3; val h = 2
    val img = Array.tabulate(w * h * 3) { j =>
      val p = j / 3; val r = p / w; val c = p % w
      (j % 3 * 100 + 10 * r + c).toByte
    }
    def px(a: Array[Byte], ww: Int, r: Int, c: Int): (Int, Int, Int) = {
      val o = 3 * (r * ww + c)
      ((a(o) & 0xff), (a(o + 1) & 0xff), (a(o + 2) & 0xff))
    }
    val fl = Augment.hflip(w, h, img)
    assert(px(fl, w, 0, 0) === px(img, w, 0, 2))
    assert(px(fl, w, 1, 2) === px(img, w, 1, 0))
    assert(Augment.hflip(w, h, fl).toSeq === img.toSeq)
    val rot = Augment.rot90cw(w, h, img)   // out dims 2 wide x 3 tall
    // top-left of the rotation is the bottom-left of the source
    assert(px(rot, h, 0, 0) === px(img, w, 1, 0))
    assert(px(rot, h, 2, 1) === px(img, w, 0, 2))
    // four rotations = identity (dims swap twice)
    val r2 = Augment.rot90cw(h, w, rot)
    val r3 = Augment.rot90cw(w, h, r2)
    val r4 = Augment.rot90cw(h, w, r3)
    assert(r4.toSeq === img.toSeq)
    // crop of a 3x3: the single center pixel survives
    val img9 = Array.tabulate(27)(_.toByte)
    val cr = Augment.centerCrop(3, 3, img9)
    assert(cr.toSeq === img9.slice(3 * 4, 3 * 4 + 3).toSeq)
  }

  test("PreprocessingDetector preserves stub scoring; model path fails fast") {
    val det = Detectors.forConfig(DetectorConfig(preprocFw = "cv2",
      modelInput = 8))()
    val frames = Seq(frame(7, 4, 4, Array.tabulate(48)(_.toByte)))
    assert(det.detectBatch(frames) === frames.map(f =>
      StubDetector.detectOne(f.frame_id)))
    intercept[UnsupportedOperationException](
      Detectors.forConfig(DetectorConfig(modelPath = Some("/tmp/m.onnx"))))
  }
}
