"""Flax YOLO-seg model family (YOLOv8n-seg / YOLO11n-seg).

Re-derivation of the architecture the reference deploys through ultralytics
(main.py:43 loads yolov8n-seg weights per model/export.py:5; model/train.py:12
trains yolo11n-seg), built TPU-first: NHWC layout, bfloat16 compute with
float32 BatchNorm statistics, static shapes, everything jit/vmap/pjit
friendly. No torch anywhere.

Structure (v8n scale: depth 1/3, width 1/4):
  backbone  Conv->Conv->C2f->Conv->C2f->Conv->C2f->Conv->C2f->SPPF
  neck      PAN: 2x nearest upsample + concat + C2f, then 2 downsample paths
  heads     per-level box (4*reg_max DFL logits), class (nc), mask-coeff (nm)
  proto     P3 -> Conv -> ConvTranspose(2x) -> Conv -> 1x1 to nm channels

YOLO11n swaps C2f for C3k2 and appends C2PSA attention after SPPF.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class YoloScale:
    depth: float
    width: float
    max_channels: int


SCALES = {
    "n": YoloScale(depth=1 / 3, width=1 / 4, max_channels=1024),
    "s": YoloScale(depth=1 / 3, width=1 / 2, max_channels=1024),
    "m": YoloScale(depth=2 / 3, width=3 / 4, max_channels=768),
}
SCALES_11 = {
    "n": YoloScale(depth=1 / 2, width=1 / 4, max_channels=1024),
    "s": YoloScale(depth=1 / 2, width=1 / 2, max_channels=1024),
    "m": YoloScale(depth=1 / 2, width=1.0, max_channels=512),
}


def _round_ch(c: float) -> int:
    return max(int(round(c)), 1)


class ConvBNAct(nn.Module):
    """Conv + BatchNorm + SiLU (ultralytics Conv block; act=False for the
    linear Conv variants YOLO11's attention path uses)."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        return (nn.silu(x) if self.act else x).astype(self.dtype)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = _round_ch(self.features * self.expansion)
        y = ConvBNAct(hidden, self.kernels[0], dtype=self.dtype)(x, train)
        y = ConvBNAct(self.features, self.kernels[1], dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8)."""

    features: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = _round_ch(self.features * self.expansion)
        y = ConvBNAct(2 * hidden, 1, dtype=self.dtype)(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        for _ in range(self.n):
            y2 = Bottleneck(hidden, self.shortcut, 1.0, (3, 3),
                            dtype=self.dtype)(y2, train)
            outs.append(y2)
        return ConvBNAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train)


class C3(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    kernels: tuple[int, int] = (1, 3)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = _round_ch(self.features * self.expansion)
        a = ConvBNAct(hidden, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, self.kernels,
                           dtype=self.dtype)(a, train)
        b = ConvBNAct(hidden, 1, dtype=self.dtype)(x, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], axis=-1), train)


class C3k2(nn.Module):
    """YOLO11 block: C2f whose inner units are C3k (when c3k) or Bottleneck."""

    features: int
    n: int = 1
    c3k: bool = False
    shortcut: bool = True
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = _round_ch(self.features * self.expansion)
        y = ConvBNAct(2 * hidden, 1, dtype=self.dtype)(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        for _ in range(self.n):
            if self.c3k:
                y2 = C3(hidden, 2, self.shortcut, kernels=(3, 3),
                        dtype=self.dtype)(y2, train)
            else:
                y2 = Bottleneck(hidden, self.shortcut, 0.5, (3, 3),
                                dtype=self.dtype)(y2, train)
            outs.append(y2)
        return ConvBNAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train)


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        y = ConvBNAct(hidden, 1, dtype=self.dtype)(x, train)
        p = self.pool
        pool = lambda z: nn.max_pool(  # noqa: E731
            z, (p, p), strides=(1, 1), padding=((p // 2, p // 2), (p // 2, p // 2)))
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBNAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([y, y1, y2, y3], axis=-1), train)


class Attention(nn.Module):
    """Multi-head attention over the spatial grid with positional conv (YOLO11 PSA).

    ultralytics defines qkv/pe/proj as Conv(..., act=False) — linear conv+BN;
    legacy=True keeps the pre-fix SiLU variant this repo's first y11n
    checkpoint was trained with (arch "yolo11n-seg-legacy")."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    legacy: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh = self.num_heads
        act = self.legacy
        qkv_dim = nh * (2 * key_dim + head_dim)
        qkv = ConvBNAct(qkv_dim, 1, act=act, dtype=self.dtype)(x, train)
        qkv = qkv.reshape(b, h * w, nh, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (key_dim ** -0.5), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, nh * head_dim)
        pe = ConvBNAct(self.dim, 3, groups=self.dim, act=act,
                       dtype=self.dtype)(
            v.reshape(b, h, w, nh * head_dim), train)
        return ConvBNAct(self.dim, 1, act=act, dtype=self.dtype)(
            out + pe, train)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    legacy: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.dim, self.num_heads, legacy=self.legacy,
                          dtype=self.dtype)(x, train)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype)(x, train)
        # ultralytics FFN: Conv(c*2, c, 1, act=False).
        y = ConvBNAct(self.dim, 1, act=self.legacy, dtype=self.dtype)(y, train)
        return x + y


class C2PSA(nn.Module):
    features: int
    n: int = 1
    legacy: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        y = ConvBNAct(2 * hidden, 1, dtype=self.dtype)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for _ in range(self.n):
            b = PSABlock(hidden, max(1, hidden // 64), legacy=self.legacy,
                         dtype=self.dtype)(b, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], axis=-1), train)


class Proto(nn.Module):
    """Mask prototype head (from P3)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.hidden, 3, dtype=self.dtype)(x, train)
        x = nn.ConvTranspose(self.hidden, (2, 2), strides=(2, 2),
                             use_bias=True, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
        x = ConvBNAct(self.hidden, 3, dtype=self.dtype)(x, train)
        return ConvBNAct(self.out, 1, dtype=self.dtype)(x, train)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class YoloSegOutputs:
    """Raw per-level head outputs plus prototypes (all NHWC, float32)."""

    box_logits: list[jax.Array]   # per level (B, H, W, 4*reg_max)
    cls_logits: list[jax.Array]   # per level (B, H, W, nc)
    coeffs: list[jax.Array]       # per level (B, H, W, nm)
    protos: jax.Array             # (B, Hp, Wp, nm)
    strides: tuple[int, ...]

    def tree_flatten(self):
        return ((self.box_logits, self.cls_logits, self.coeffs, self.protos),
                self.strides)

    @classmethod
    def tree_unflatten(cls, strides, children):
        return cls(*children, strides=strides)


class YoloSeg(nn.Module):
    """YOLOv8/11 segmentation model."""

    arch: str = "yolov8n-seg"
    num_classes: int = 1
    reg_max: int = 16
    num_masks: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def is_v11(self) -> bool:
        return "11" in self.arch

    @property
    def is_v11_legacy(self) -> bool:
        """arch "yolo11n-seg-legacy": the pre-fix v11 variant (neck C3k2
        shortcut=False / no c3k in the P5 neck block / SiLU on the attention
        qkv-pe-proj and FFN-out convs) this repo's first y11n checkpoint was
        trained with — kept constructible so that artifact stays loadable."""
        return self.is_v11 and self.arch.endswith("-legacy")

    def _scale(self) -> YoloScale:
        letter = self.arch.replace("-legacy", "").replace("-seg", "")[-1]
        return (SCALES_11 if self.is_v11 else SCALES)[letter]

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> YoloSegOutputs:
        s = self._scale()
        legacy = self.is_v11_legacy

        def ch(c: int) -> int:
            return _round_ch(min(c, s.max_channels) * s.width)

        def depth(n: int) -> int:
            return max(int(round(n * s.depth)), 1)

        dt = self.dtype
        x = images.astype(dt)

        if self.is_v11:
            # YOLO11 backbone
            x = ConvBNAct(ch(64), 3, 2, dtype=dt)(x, train)           # P1
            x = ConvBNAct(ch(128), 3, 2, dtype=dt)(x, train)          # P2
            x = C3k2(ch(256), depth(2), c3k=False, shortcut=True,
                     expansion=0.25, dtype=dt)(x, train)
            x = ConvBNAct(ch(256), 3, 2, dtype=dt)(x, train)          # P3
            x = C3k2(ch(512), depth(2), c3k=False, shortcut=True,
                     expansion=0.25, dtype=dt)(x, train)
            p3 = x
            x = ConvBNAct(ch(512), 3, 2, dtype=dt)(x, train)          # P4
            x = C3k2(ch(512), depth(2), c3k=True, shortcut=True, dtype=dt)(x, train)
            p4 = x
            x = ConvBNAct(ch(1024), 3, 2, dtype=dt)(x, train)         # P5
            x = C3k2(ch(1024), depth(2), c3k=True, shortcut=True, dtype=dt)(x, train)
            x = SPPF(ch(1024), 5, dtype=dt)(x, train)
            x = C2PSA(ch(1024), depth(2), legacy=legacy, dtype=dt)(x, train)
            p5 = x
            if legacy:
                # Pre-fix variant (the first trained y11n checkpoint):
                # neck blocks c3k=False, shortcut=False.
                block = lambda c, n, sc, c3k=False: C3k2(  # noqa: E731
                    c, depth(n), c3k=False, shortcut=sc, dtype=dt)
            else:
                # yolo11.yaml head: C3k2 [c2, c3k] with shortcut defaulting
                # True; c3k=True only for the final P5 block at n/s scales.
                block = lambda c, n, sc, c3k=False: C3k2(  # noqa: E731
                    c, depth(n), c3k=c3k, shortcut=True, dtype=dt)
            neck_n = 2
        else:
            # YOLOv8 backbone
            x = ConvBNAct(ch(64), 3, 2, dtype=dt)(x, train)           # P1
            x = ConvBNAct(ch(128), 3, 2, dtype=dt)(x, train)          # P2
            x = C2f(ch(128), depth(3), shortcut=True, dtype=dt)(x, train)
            x = ConvBNAct(ch(256), 3, 2, dtype=dt)(x, train)          # P3
            x = C2f(ch(256), depth(6), shortcut=True, dtype=dt)(x, train)
            p3 = x
            x = ConvBNAct(ch(512), 3, 2, dtype=dt)(x, train)          # P4
            x = C2f(ch(512), depth(6), shortcut=True, dtype=dt)(x, train)
            p4 = x
            x = ConvBNAct(ch(1024), 3, 2, dtype=dt)(x, train)         # P5
            x = C2f(ch(1024), depth(3), shortcut=True, dtype=dt)(x, train)
            x = SPPF(ch(1024), 5, dtype=dt)(x, train)
            p5 = x
            block = lambda c, n, sc, c3k=False: C2f(  # noqa: E731
                c, depth(n), shortcut=sc, dtype=dt)
            neck_n = 3

        # PAN neck (identical wiring for v8/v11)
        up = lambda z: jax.image.resize(  # noqa: E731
            z, (z.shape[0], z.shape[1] * 2, z.shape[2] * 2, z.shape[3]),
            method="nearest")

        h1 = block(ch(512), neck_n, False)(
            jnp.concatenate([up(p5), p4], axis=-1), train)
        n3 = block(ch(256), neck_n, False)(
            jnp.concatenate([up(h1), p3], axis=-1), train)            # P3 out
        d1 = ConvBNAct(ch(256), 3, 2, dtype=dt)(n3, train)
        n4 = block(ch(512), neck_n, False)(
            jnp.concatenate([d1, h1], axis=-1), train)                # P4 out
        d2 = ConvBNAct(ch(512), 3, 2, dtype=dt)(n4, train)
        n5 = block(ch(1024), neck_n, False, c3k=True)(
            jnp.concatenate([d2, p5], axis=-1), train)                # P5 out

        feats = [n3, n4, n5]
        # Heads
        c_box = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c_cls = max(feats[0].shape[-1], min(self.num_classes, 100))
        c_m = max(feats[0].shape[-1] // 4, self.num_masks)

        box_logits, cls_logits, coeffs = [], [], []
        for f in feats:
            b = ConvBNAct(c_box, 3, dtype=dt)(f, train)
            b = ConvBNAct(c_box, 3, dtype=dt)(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), dtype=jnp.float32,
                        param_dtype=jnp.float32)(b.astype(jnp.float32))
            box_logits.append(b)

            if self.is_v11:
                c = ConvBNAct(f.shape[-1], 3, groups=f.shape[-1], dtype=dt)(f, train)
                c = ConvBNAct(c_cls, 1, dtype=dt)(c, train)
                c = ConvBNAct(c_cls, 3, groups=c_cls, dtype=dt)(c, train)
                c = ConvBNAct(c_cls, 1, dtype=dt)(c, train)
            else:
                c = ConvBNAct(c_cls, 3, dtype=dt)(f, train)
                c = ConvBNAct(c_cls, 3, dtype=dt)(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                        param_dtype=jnp.float32)(c.astype(jnp.float32))
            cls_logits.append(c)

            m = ConvBNAct(c_m, 3, dtype=dt)(f, train)
            m = ConvBNAct(c_m, 3, dtype=dt)(m, train)
            m = nn.Conv(self.num_masks, (1, 1), dtype=jnp.float32,
                        param_dtype=jnp.float32)(m.astype(jnp.float32))
            coeffs.append(m)

        protos = Proto(ch(256), self.num_masks, dtype=dt)(n3, train)

        return YoloSegOutputs(
            box_logits=box_logits,
            cls_logits=cls_logits,
            coeffs=coeffs,
            protos=protos.astype(jnp.float32),
            strides=(8, 16, 32),
        )
