#!/usr/bin/env python3
"""Deterministic generator for the committed tiny-detector .gnet
artifacts (driver-side tooling only — NOT part of the engine; the
engine only READS the committed files).

Architecture: 192 (8x8 grid x 3 channels) -> 32 ReLU -> 36
(6 detection heads x (ymin,xmin,ymax,xmax,score,class) logits).

Weights are a fixed rational lattice (no RNG library state), scaled
~1/sqrt(fan_in), so regenerating the file is byte-identical on any
machine:  w[l][o][i] = ((o*131 + i*31 + l*17) % 199 - 99) / (199 * sqrt(fan_in))

Two artifacts are emitted (the reference's benchmark.sh sweeps model
precision FP32 -> BF16 -> INT8, benchmark.sh:22-69):
  tiny_detector.gnet       — the FP32 weights above
  tiny_detector_int8.gnet  — the same weights через int8 symmetric
    quantization (the s5 scheme: per-layer scale 127/max|w|,
    q = floor(w*scale + 0.5), stored dequantized q/scale), biases
    kept full precision. The .gnet format is unchanged — precision
    is an artifact property, opaque to the runtime, exactly like the
    reference's per-dtype frozen graphs.
"""
import math
import os

LAYERS = [(192, 32), (32, 36)]
RES_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "main", "resources", "graft")


def w(l, o, i, fan_in):
    return ((o * 131 + i * 31 + l * 17) % 199 - 99) / (199.0 * math.sqrt(fan_in))


def b(l, o):
    return ((o * 37 + l * 11) % 23 - 11) / 230.0


def write_artifact(name, weight_fn, fmt):
    out = os.path.join(RES_DIR, name)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lines = ["gnet 1"]
    for l, (n_in, n_out) in enumerate(LAYERS):
        lines.append(f"layer {n_in} {n_out}")
        for o in range(n_out):
            lines.append(" ".join(fmt % weight_fn(l, o, i, n_in)
                                  for i in range(n_in)))
        lines.append(" ".join("%.6f" % b(l, o) for o in range(n_out)))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: layers {LAYERS}")


def main():
    # FP32 reference artifact
    write_artifact("tiny_detector.gnet", w, "%.6f")

    # INT8: per-layer symmetric scale over the weight tensor (the s5
    # scheme), floor(x*s + 0.5) halving parity, dequantized storage
    scales = []
    for l, (n_in, n_out) in enumerate(LAYERS):
        mx = max(abs(w(l, o, i, n_in))
                 for o in range(n_out) for i in range(n_in))
        scales.append(127.0 / mx)

    def wq(l, o, i, fan_in):
        s = scales[l]
        q = math.floor(w(l, o, i, fan_in) * s + 0.5)
        assert -128 <= q <= 127, q
        return q / s

    write_artifact("tiny_detector_int8.gnet", wq, "%.8f")


if __name__ == "__main__":
    main()
