"""Independent ultralytics-8.3.196 YOLO11-OBB state-dict manifest generator.

VERDICT r03 missing #2: `models/ultralytics_manifest.json` is a frozen
snapshot of THIS repo's own exporter — self-referential, so a wrong key
mapping in `models/weights.py` could never be caught. This tool derives
the expected torch `state_dict()` key space {name: shape} a SECOND,
independent way: a hand transcription of the pinned engine's module
graph — `ultralytics/cfg/models/11/yolo11-obb.yaml` elaborated through
`ultralytics/nn/tasks.py::parse_model` and the module definitions in
`ultralytics/nn/modules/{conv,block,head}.py` at 8.3.196
(`/root/reference/requirements.txt:3`) — with no reference to this
repo's flax tree or exporter. `tests/test_weights.py::TestEngineManifest`
cross-checks the two key spaces in both directions and feeds this
manifest through `convert_state_dict` onto a freshly-initialized model;
any mis-mapped head/neck key breaks one of those checks.

Transcribed module semantics (names cite the engine source):

parse_model (tasks.py):
  * scales n/s/m/l/x: (depth, width, max_channels) =
    (.50,.25,1024)/(.50,.50,1024)/(.50,1.,512)/(1.,1.,512)/(1.,1.5,512)
  * output channels: make_divisible(min(c2, max_channels) * width, 8)
  * repeats: n = max(round(n_yaml * depth), 1)
  * C3k2 with scale in "mlx": the c3k flag is forced True; and the
    presence of C3k2 sets legacy=False (non-legacy Detect cv3)

modules (conv.py / block.py / head.py):
  * Conv(c1,c2,k,g): conv.weight [c2,c1/g,k,k] + bn.{weight,bias,
    running_mean,running_var,num_batches_tracked}
  * Bottleneck(c1,c2,k=(k1,k2),e): cv1 Conv(c1,int(c2*e),k1),
    cv2 Conv(int(c2*e),c2,k2)
  * C3k2(c1,c2,n,c3k,e=0.5): c=int(c2*e); cv1 Conv(c1,2c,1),
    cv2 Conv((2+n)c, c2, 1), m.{j} = C3k(c,c,2) if c3k else
    Bottleneck(c,c) with Bottleneck DEFAULTS k=(3,3), e=0.5
  * C3k(c1,c2,n,e=0.5,k=3): c_=int(c2*e); cv1 Conv(c1,c_,1),
    cv2 Conv(c1,c_,1), cv3 Conv(2c_,c2,1),
    m.{j} = Bottleneck(c_,c_,k=(3,3),e=1.0)
  * SPPF(c1,c2): c_=c1//2; cv1 Conv(c1,c_,1), cv2 Conv(4c_,c2,1)
  * C2PSA(c1,c2,n,e=0.5): c=int(c1*e); cv1 Conv(c1,2c,1),
    cv2 Conv(2c,c1,1), m.{j} = PSABlock(c, num_heads=c//64)
  * PSABlock(c): attn = Attention(c, 0.5, c//64), ffn =
    Sequential(Conv(c,2c,1), Conv(2c,c,1))
  * Attention(dim, 0.5, nh): hd=dim//nh; kd=int(hd*0.5); h=dim+2*kd*nh;
    qkv Conv(dim,h,1), proj Conv(dim,dim,1), pe Conv(dim,dim,3,g=dim)
  * Detect head dims: reg_max=16; c2h=max(16, ch0//4, 64);
    c3h=max(ch0, min(nc,100));
    cv2.{l} = Sequential(Conv(x,c2h,3), Conv(c2h,c2h,3),
                          nn.Conv2d(c2h,64,1))
    cv3.{l} (legacy=False) = Sequential(
        Sequential(DWConv(x,x,3), Conv(x,c3h,1)),
        Sequential(DWConv(c3h,c3h,3), Conv(c3h,c3h,1)),
        nn.Conv2d(c3h,nc,1))
    dfl.conv.weight [1,16,1,1] (fixed bins, requires_grad=False)
  * OBB(nc, ne=1, ch) adds c4h=max(ch0//4, ne);
    cv4.{l} = Sequential(Conv(x,c4h,3), Conv(c4h,c4h,3),
                          nn.Conv2d(c4h,ne,1))

Usage: python tools/gen_engine_manifest.py  (writes
oriented_object_detection_tpu/models/engine_manifest.json)
"""

from __future__ import annotations

import json
import math
import os
import sys

SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

REG_MAX = 16
NE = 1  # OBB angle channels


def make_divisible(x: float, divisor: int = 8) -> int:
    return math.ceil(x / divisor) * divisor


class KeySink:
    def __init__(self):
        self.keys: dict[str, list[int]] = {}

    def add(self, name: str, shape):
        assert name not in self.keys, f"duplicate key {name}"
        self.keys[name] = list(shape)


def conv(sink: KeySink, p: str, c1: int, c2: int, k: int, g: int = 1):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm2d."""
    sink.add(f"{p}.conv.weight", (c2, c1 // g, k, k))
    for tail in ("weight", "bias", "running_mean", "running_var"):
        sink.add(f"{p}.bn.{tail}", (c2,))
    sink.add(f"{p}.bn.num_batches_tracked", ())


def conv2d(sink: KeySink, p: str, c1: int, c2: int, k: int):
    """plain nn.Conv2d with bias (head final layers)."""
    sink.add(f"{p}.weight", (c2, c1, k, k))
    sink.add(f"{p}.bias", (c2,))


def bottleneck(sink: KeySink, p: str, c1: int, c2: int,
               k=(3, 3), e: float = 0.5):
    c_ = int(c2 * e)
    conv(sink, f"{p}.cv1", c1, c_, k[0])
    conv(sink, f"{p}.cv2", c_, c2, k[1])


def c3k(sink: KeySink, p: str, c1: int, c2: int, n: int = 2,
        e: float = 0.5):
    c_ = int(c2 * e)
    conv(sink, f"{p}.cv1", c1, c_, 1)
    conv(sink, f"{p}.cv2", c1, c_, 1)
    conv(sink, f"{p}.cv3", 2 * c_, c2, 1)
    for j in range(n):
        bottleneck(sink, f"{p}.m.{j}", c_, c_, k=(3, 3), e=1.0)


def c3k2(sink: KeySink, p: str, c1: int, c2: int, n: int,
         use_c3k: bool, e: float = 0.5):
    c = int(c2 * e)
    conv(sink, f"{p}.cv1", c1, 2 * c, 1)
    conv(sink, f"{p}.cv2", (2 + n) * c, c2, 1)
    for j in range(n):
        if use_c3k:
            c3k(sink, f"{p}.m.{j}", c, c, 2)
        else:
            # NOTE: unlike C2f (which builds Bottleneck(..., k=((3,3),
            # (3,3)), e=1.0)), C3k2.__init__ REBUILDS self.m with
            # `Bottleneck(self.c, self.c, shortcut, g)` — the Bottleneck
            # DEFAULTS k=(3,3), e=0.5 apply (block.py @8.3.196). The
            # first draft of this transcription used the C2f overrides
            # and the exporter cross-check caught it: 30 n-scale shape
            # mismatches in the non-c3k m-blocks.
            bottleneck(sink, f"{p}.m.{j}", c, c, k=(3, 3), e=0.5)


def sppf(sink: KeySink, p: str, c1: int, c2: int):
    c_ = c1 // 2
    conv(sink, f"{p}.cv1", c1, c_, 1)
    conv(sink, f"{p}.cv2", c_ * 4, c2, 1)


def attention(sink: KeySink, p: str, dim: int, num_heads: int,
              attn_ratio: float = 0.5):
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    h = dim + key_dim * num_heads * 2
    conv(sink, f"{p}.qkv", dim, h, 1)
    conv(sink, f"{p}.proj", dim, dim, 1)
    conv(sink, f"{p}.pe", dim, dim, 3, g=dim)


def psablock(sink: KeySink, p: str, c: int):
    attention(sink, f"{p}.attn", c, num_heads=c // 64)
    conv(sink, f"{p}.ffn.0", c, c * 2, 1)
    conv(sink, f"{p}.ffn.1", c * 2, c, 1)


def c2psa(sink: KeySink, p: str, c1: int, n: int, e: float = 0.5):
    c = int(c1 * e)
    conv(sink, f"{p}.cv1", c1, 2 * c, 1)
    conv(sink, f"{p}.cv2", 2 * c, c1, 1)
    for j in range(n):
        psablock(sink, f"{p}.m.{j}", c)


def obb_head(sink: KeySink, p: str, nc: int, ch: list[int]):
    c2h = max(16, ch[0] // 4, REG_MAX * 4)
    c3h = max(ch[0], min(nc, 100))
    c4h = max(ch[0] // 4, NE)
    for lvl, x in enumerate(ch):
        conv(sink, f"{p}.cv2.{lvl}.0", x, c2h, 3)
        conv(sink, f"{p}.cv2.{lvl}.1", c2h, c2h, 3)
        conv2d(sink, f"{p}.cv2.{lvl}.2", c2h, 4 * REG_MAX, 1)
        # non-legacy cv3: (DWConv, Conv) pairs then 1x1 Conv2d
        conv(sink, f"{p}.cv3.{lvl}.0.0", x, x, 3, g=x)
        conv(sink, f"{p}.cv3.{lvl}.0.1", x, c3h, 1)
        conv(sink, f"{p}.cv3.{lvl}.1.0", c3h, c3h, 3, g=c3h)
        conv(sink, f"{p}.cv3.{lvl}.1.1", c3h, c3h, 1)
        conv2d(sink, f"{p}.cv3.{lvl}.2", c3h, nc, 1)
        conv(sink, f"{p}.cv4.{lvl}.0", x, c4h, 3)
        conv(sink, f"{p}.cv4.{lvl}.1", c4h, c4h, 3)
        conv2d(sink, f"{p}.cv4.{lvl}.2", c4h, NE, 1)
    sink.add(f"{p}.dfl.conv.weight", (1, REG_MAX, 1, 1))


def engine_state_dict_manifest(scale: str, in_channels: int = 3,
                               nc: int = 12) -> dict[str, list[int]]:
    """Expected `model.model.state_dict()` {key: shape} for
    ultralytics 8.3.196 YOLO11{scale}-obb with `nc` classes and an
    `in_channels`-wide stem (channels: 4 in data4ch.yaml patches the
    first conv)."""
    depth, width, max_ch = SCALES[scale]

    def cs(c):  # parse_model channel scaling
        return make_divisible(min(c, max_ch) * width, 8)

    def reps(n):
        return max(round(n * depth), 1)

    use_c3k_default = scale in "mlx"  # parse_model forces c3k=True
    s = KeySink()

    # ---- backbone (yolo11.yaml; OBB variant shares it) ----
    conv(s, "model.0", in_channels, cs(64), 3)                 # P1/2
    conv(s, "model.1", cs(64), cs(128), 3)                     # P2/4
    c3k2(s, "model.2", cs(128), cs(256), reps(2),
         use_c3k_default or False, e=0.25)
    conv(s, "model.3", cs(256), cs(256), 3)                    # P3/8
    c3k2(s, "model.4", cs(256), cs(512), reps(2),
         use_c3k_default or False, e=0.25)
    conv(s, "model.5", cs(512), cs(512), 3)                    # P4/16
    c3k2(s, "model.6", cs(512), cs(512), reps(2), True)
    conv(s, "model.7", cs(512), cs(1024), 3)                   # P5/32
    c3k2(s, "model.8", cs(1024), cs(1024), reps(2), True)
    sppf(s, "model.9", cs(1024), cs(1024))
    c2psa(s, "model.10", cs(1024), reps(2))

    # ---- head (PAN-FPN): 11/14 Upsample, 12/15/18/21 Concat — no params
    c3k2(s, "model.13", cs(1024) + cs(512), cs(512), reps(2),
         use_c3k_default or False)
    c3k2(s, "model.16", cs(512) + cs(512), cs(256), reps(2),
         use_c3k_default or False)
    conv(s, "model.17", cs(256), cs(256), 3)
    c3k2(s, "model.19", cs(256) + cs(512), cs(512), reps(2),
         use_c3k_default or False)
    conv(s, "model.20", cs(512), cs(512), 3)
    c3k2(s, "model.22", cs(512) + cs(1024), cs(1024), reps(2), True)
    obb_head(s, "model.23", nc, [cs(256), cs(512), cs(1024)])
    return s.keys


def main():
    out = {}
    for scale in ("n", "x"):
        for ch in (3, 4):
            out[f"yolo11{scale}-obb-{ch}ch"] = engine_state_dict_manifest(
                scale, in_channels=ch)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "oriented_object_detection_tpu",
        "models", "engine_manifest.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    for k, v in out.items():
        print(f"{k}: {len(v)} keys")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
