#!/usr/bin/env python3
"""Deterministic generator for the committed tiny-detector .gnet
artifact (driver-side tooling only — NOT part of the engine; the
engine only READS the committed file).

Architecture: 192 (8x8 grid x 3 channels) -> 32 ReLU -> 36
(6 detection heads x (ymin,xmin,ymax,xmax,score,class) logits).

Weights are a fixed rational lattice (no RNG library state), scaled
~1/sqrt(fan_in), so regenerating the file is byte-identical on any
machine:  w[l][o][i] = ((o*131 + i*31 + l*17) % 199 - 99) / (199 * sqrt(fan_in))
"""
import math
import os

LAYERS = [(192, 32), (32, 36)]
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "tiny_detector.gnet")


def w(l, o, i, fan_in):
    return ((o * 131 + i * 31 + l * 17) % 199 - 99) / (199.0 * math.sqrt(fan_in))


def b(l, o):
    return ((o * 37 + l * 11) % 23 - 11) / 230.0


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    lines = ["gnet 1"]
    for l, (n_in, n_out) in enumerate(LAYERS):
        lines.append(f"layer {n_in} {n_out}")
        for o in range(n_out):
            lines.append(" ".join(f"{w(l, o, i, n_in):.6f}" for i in range(n_in)))
        lines.append(" ".join(f"{b(l, o):.6f}" for o in range(n_out)))
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: layers {LAYERS}")


if __name__ == "__main__":
    main()
