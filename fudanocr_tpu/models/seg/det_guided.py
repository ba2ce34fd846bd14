"""Det-guided CascadeMiT (the `_V10` variant behind all `*_det` configs).

Rebuild of text-focused-Transformers/mmseg/models/backbones/
cascade_mit.py:4581-5131: on top of the cascade backbone it adds

* a multi-scale detection head — per-scale 1x1 conv+BN to 8d channels,
  resized to 1/4 scale, concat -> 1x1 fusion conv+BN -> 2-class det logits;
* a soft-argmax (softmax(x*beta)·indices) giving a differentiable text map;
* per-image INSTANCE ids from the text map via contour filling — done on
  host through `jax.pure_callback` to OpenCV exactly as the reference
  (cascade_mit.py:4943-4951, which calls cv2 inside the CUDA forward);
* per-scale additive attention masks from region equality
  (calculate_mask, cascade_mit.py:4970-4975: pairs in the SAME region get
  -1e10 — the reference suppresses same-region pairs, reproduced verbatim);
* parallel text-masked and instance-masked self-attention branches per
  scale, blended by a learned sigmoid gate (fuse_text_instance_*);
* the cascade fusion then concatenates [pyramid, upsampled, text_instance].

Returns (pyramid_outs, det_logits); the det logits train against gt_det
masks with weight det_loss_ratio=0.1 (decode_head.py:244-256).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fudanocr_tpu.models.seg.cascade_mit import (CascadeStage, ResNetBlock,
                                                 StemConv4x,
                                                 TransformerEncoderLayer)

Dtype = Any


def soft_argmax(logits: jax.Array, beta: float = 1e10) -> jax.Array:
    """(B, H, W, C) -> (B, H, W) differentiable argmax over C."""
    p = jax.nn.softmax(logits.astype(jnp.float32) * beta, axis=-1)
    idx = jnp.arange(logits.shape[-1], dtype=jnp.float32)
    return jnp.sum(p * idx, axis=-1)


def _instance_labels_host(binary: np.ndarray) -> np.ndarray:
    """Contour-filling instance ids (reference uses cv2.findContours +
    drawContours with an incrementing counter)."""
    import cv2

    binary = np.asarray(binary)  # callback may hand a jax array view
    out = np.zeros_like(binary, dtype=np.float32)
    for b in range(binary.shape[0]):
        img = np.ascontiguousarray(binary[b], dtype=np.uint8)
        contours, _ = cv2.findContours(img, cv2.RETR_TREE,
                                       cv2.CHAIN_APPROX_SIMPLE)
        img_copy = img.copy()
        for i in range(len(contours)):
            cv2.drawContours(img_copy, contours, i, i + 1, -1)
        out[b] = img_copy
    return out


def instance_labels_device(text_map: jax.Array,
                           iters: Optional[int] = None,
                           warm: int = 6) -> jax.Array:
    """Pure-XLA connected-component labeling: per-pixel label = min linear
    index of its 4-connected component.

    Each round interleaves three mechanisms and the loop exits as soon as
    a round changes nothing (profiled: the fixed-20-round fori_loop was
    30 of the 70 ms det-guided 1024² train step — real text maps converge
    in a handful of rounds):

    * segmented min-scans along rows then columns (`associative_scan`,
      background pixels break segments) — propagate the min over whole
      straight runs at once, purely elementwise, no gather/scatter;
    * a Shiloach–Vishkin hook: the 4-neighbour candidate min is
      scatter-min'ed onto the pixel's current ROOT (`lab.at[lab].min` —
      trees hook onto adjacent trees, Borůvka-style the number of
      unmerged trees at least halves per round);
    * two pointer jumps (`lab <- lab[lab]`) compress paths.

    The hook/jump pair alone bounds ANY component shape (serpentine,
    spiral — exercised by test_det_guided) at ~log2(H*W) hook/jump
    rounds. The scans make blob-like real components converge in
    O(number of bends) rounds. SCHEDULE (r5, measured): a hook/jump
    round costs ~12 ms at b8 256² (XLA lowers the data-dependent
    scatter/gather to serial loops) vs ~1 ms for a scan round, and a
    scan round that changes nothing is a correct exit — so the first
    `warm` = 6 rounds are scan-only (small/real components exit there:
    40.8 -> ~8 ms on noise maps), after which hook/jump rounds alternate
    with scan rounds for high-diameter shapes. The iteration cap is
    warm + ~2*log2(H*W) + 8.

    Used where host callbacks are unavailable (the axon TPU tunnel
    rejects pure_callback). Differs from the cv2 contour fill only on
    regions with internal holes: cv2.drawContours(-1) paints holes with
    the surrounding instance id, this keeps them background. Attention
    masks depend only on label EQUALITY, so the partition — not the id
    values — is what matters."""
    b, h, w = text_map.shape
    hw = h * w
    if iters is None:
        # hook/jump rounds halve the tree count but run only every OTHER
        # round after the warm-up (see body), so the cap doubles; margin
        # for the interleaving (test_det_guided: serpentine + spiral)
        iters = warm + 2 * int(np.ceil(np.log2(max(hw, 2)))) + 8
    fg = text_map > 0
    fg_flat = fg.reshape(b, hw)
    bg = jnp.int32(hw)  # sentinel label for background (> any pixel index)
    idx = jnp.arange(hw, dtype=jnp.int32).reshape(1, h, w)
    lab = jnp.where(fg, idx, bg)
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    is_bg = ~fg

    def seg_scan(lab):
        # segmented running-min within contiguous fg runs; bg pixels are
        # segment breaks (their value is the bg sentinel, which min() then
        # ignores inside the next run). reverse=True flips-scans-flips,
        # which is exactly the backward segmented scan.
        def combine(a, c):
            av, af = a
            cv, cf = c
            return jnp.where(cf, cv, jnp.minimum(av, cv)), af | cf

        for axis in (2, 1):
            for rev in (False, True):
                lab, _ = jax.lax.associative_scan(
                    combine, (lab, is_bg), axis=axis, reverse=rev)
        return jnp.where(fg, lab, bg)

    def neighbour_min(lab):
        return jnp.minimum(
            jnp.minimum(jnp.pad(lab, ((0, 0), (1, 0), (0, 0)),
                                constant_values=bg)[:, :-1],
                        jnp.pad(lab, ((0, 0), (0, 1), (0, 0)),
                                constant_values=bg)[:, 1:]),
            jnp.minimum(jnp.pad(lab, ((0, 0), (0, 0), (1, 0)),
                                constant_values=bg)[:, :, :-1],
                        jnp.pad(lab, ((0, 0), (0, 0), (0, 1)),
                                constant_values=bg)[:, :, 1:]))

    def jump(flat):
        # lab[lab]: every label is the linear index of a same-component
        # pixel, so chasing it (and taking the min) preserves the
        # invariant while doubling the hop length
        parent = jnp.take_along_axis(flat, jnp.minimum(flat, hw - 1),
                                     axis=1)
        return jnp.where(fg_flat, jnp.minimum(flat, parent), bg)

    def body(state):
        lab, _, it = state
        scanned = seg_scan(lab)
        cand = neighbour_min(scanned).reshape(b, hw)
        cand = jnp.where(fg_flat, cand, bg)  # bg scatters the identity
        flat = scanned.reshape(b, hw)

        # The hook scatter-min and the jump gathers are data-dependent
        # addressing over the hw minor dim — XLA lowers both to serial
        # per-element loops on TPU (profiled ~12 ms/round at b8 256²,
        # vs ~1 ms for the elementwise scan+neighbour round). scan +
        # neighbour-min alone is a COMPLETE (diameter-round) CCL, so the
        # expensive pair runs only every other round purely as an
        # accelerator for high-diameter components: a round that changes
        # nothing is still a correct exit (no pixel has a
        # smaller-labelled neighbour <=> converged).
        def with_hook(flat):
            # hook: the ROOT this pixel points to learns the best
            # adjacent label (bg rows clamp to index hw-1 but carry
            # value bg = no-op)
            f2 = flat.at[b_idx, jnp.minimum(flat, hw - 1)].min(
                cand, mode="drop")
            f2 = jnp.where(fg_flat, jnp.minimum(f2, cand), bg)
            return jump(jump(f2))

        def without_hook(flat):
            return jnp.where(fg_flat, jnp.minimum(flat, cand), bg)

        flat = jax.lax.cond((it >= warm) & (it % 2 == 1),
                            with_hook, without_hook, flat)
        new = flat.reshape(b, h, w)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < iters)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    # same output convention as before: 1-based float ids, background 0
    return jnp.where(fg, (lab + 1).astype(jnp.float32), 0.0)


def _host_callbacks_supported() -> bool:
    # The axon PJRT tunnel has no host send/recv, so pure_callback raises
    # UNIMPLEMENTED. It reports platform 'tpu' like real TPU runtimes —
    # only platform_version names axon.
    try:
        ver = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        return True
    return "axon" not in ver


def instance_labels(text_map: jax.Array,
                    impl: Optional[str] = None) -> jax.Array:
    """(B, H, W) float {0,1} -> (B, H, W) instance-id map.

    `impl` selects 'host' (OpenCV contour filling — the reference's exact
    algorithm, cascade_mit.py:4943-4951, and the oracle the port-parity
    tests compare against) or 'device' (the pure-XLA CCL above); None
    auto-selects MESH-AWARE: host cv2 only when callbacks are supported
    AND exactly one device is visible. Under any multi-device program the
    callback is compiled as a {maximal device=0} computation, so SPMD
    gathers the full tensor to device 0 and re-partitions afterwards —
    two 'Involuntary full rematerialization' round trips per step
    (observed in MULTICHIP_r03.json) that serialize all chips behind one.
    The device CCL shards cleanly (everything is elementwise/scan/
    batch-local); it differs from cv2 only on hole pixels, and every
    consumer (the region attention masks) depends on label EQUALITY only.
    tests/test_det_guided.py asserts the two paths agree per-partition on
    an 8-device mesh."""
    if impl is None:
        impl = ("host" if _host_callbacks_supported()
                and len(jax.devices()) == 1 else "device")
    if impl == "device":
        return instance_labels_device(text_map)
    return jax.pure_callback(
        _instance_labels_host,
        jax.ShapeDtypeStruct(text_map.shape, jnp.float32),
        text_map.astype(jnp.int32),
        vmap_method="sequential")


def nearest_resize_torch(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(B, H, W) nearest resize with torch F.interpolate semantics
    (src = floor(dst * in / out) — NOT jax's half-pixel centers), used so
    the attention masks match calculate_mask's interpolate() exactly."""
    b, h, w = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        # integer downscale: floor(i*h/oh) == i*(h//oh) exactly, so the
        # gather is a strided slice — the general minor-dim gather below
        # was one of the det-guided train step's hottest non-matmul ops
        return x[:, ::h // oh, ::w // ow]
    iy = (jnp.arange(oh) * h) // oh
    ix = (jnp.arange(ow) * w) // ow
    return x[:, iy][:, :, ix]


def region_vectors(region: jax.Array, hw: Tuple[int, int],
                   sr_ratio: int) -> Tuple[jax.Array, jax.Array]:
    """(B, H0, W0) region ids -> ((B, Lq), (B, Lkv)) id vectors for the
    efficient attention at resolution `hw` with K/V reduced by sr_ratio.

    The O(Lq x Lkv) additive mask of calculate_mask
    (cascade_mit.py:4890-4896) is a pure function of these two vectors
    (id equality); the Pallas region kernel evaluates it per tile
    in-kernel, so only the O(L) vectors are ever materialised."""
    b = region.shape[0]
    h, w = hw
    rq = nearest_resize_torch(region, (h, w)).reshape(b, -1)
    hk, wk = max(h // sr_ratio, 1), max(w // sr_ratio, 1)
    rkv = nearest_resize_torch(region, (hk, wk)).reshape(b, -1)
    return rq, rkv


def region_attn_mask(region: jax.Array, hw: Tuple[int, int],
                     sr_ratio: int) -> jax.Array:
    """(B, H0, W0) region ids -> (B, 1, Lq, Lkv) ADDITIVE float mask.

    Matches calculate_mask (cascade_mit.py:4890-4896) exactly: pairs
    whose region ids are EQUAL get -1e10 added to their score (the
    reference suppresses same-region pairs; for a row whose pairs are all
    suppressed the constant cancels in softmax, reproduced verbatim by
    keeping the mask additive). Kept as the small-shape fallback and the
    test oracle for the in-kernel mask of ops/region_attention.py."""
    rq, rkv = region_vectors(region, hw, sr_ratio)
    same = rq[:, :, None] == rkv[:, None, :]
    return jnp.where(same, jnp.float32(-1e10),
                     jnp.float32(0.0))[:, None, :, :]


class _DetConvBN(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class _GateFuse(nn.Module):
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, text, inst, train=False):
        w = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    name="conv")(jnp.concatenate([text, inst], axis=-1))
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(w)
        w = jax.nn.sigmoid(w)
        return w * text + (1 - w) * inst


class CascadeMiTDetGuided(nn.Module):
    embed_dims: int = 32
    num_layers: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    drop_path_rate: float = 0.1
    dtype: Optional[Dtype] = None
    instance_impl: Optional[str] = None  # 'host' (cv2 oracle) | 'device'
    # | None = mesh-aware auto (see instance_labels); port-parity tests
    # pin 'host' because the torch fixtures bake cv2's hole filling in.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 det_gt: Optional[jax.Array] = None
                 ) -> Tuple[List[jax.Array], jax.Array]:
        """`det_gt` (B, H, W) {0,1} optionally replaces the predicted text
        map for mask construction (EncoderDecoder_V4's gt-threading,
        encoder_decoder.py:337 + cascade_mit forward(x, det_gt))."""
        d = self.embed_dims
        nh = self.num_heads
        deterministic = not train
        dims = [d * h for h in nh]

        # stem + pyramid (shared with the plain CascadeMiT layout)
        x1 = StemConv4x(d, dtype=self.dtype, name="stem_conv")(x, s2d=train)
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x1)
        feats = [x1]
        cur = x1
        for s in range(3):
            cur = ResNetBlock(dims[s + 1], 2, dtype=self.dtype,
                              name=f"layer{s+1}_0")(cur, train)
            cur = ResNetBlock(dims[s + 1], 1, dtype=self.dtype,
                              name=f"layer{s+1}_1")(cur, train)
            feats.append(cur)
        x1, x2, x3, x4 = feats

        # multi-scale det head at 1/4 scale
        det_feats = []
        for i, f in enumerate(feats):
            y = _DetConvBN(dims[3], dtype=self.dtype,
                           name=f"out_det_{i+1}")(f, train)
            if y.shape[1:3] != x1.shape[1:3]:
                y = jax.image.resize(
                    y, (y.shape[0], x1.shape[1], x1.shape[2], y.shape[3]),
                    "bilinear")
            det_feats.append(y)
        det_fuse = _DetConvBN(dims[3], dtype=self.dtype, name="fusion_conv")(
            jnp.concatenate(det_feats, axis=-1), train)
        det_logits = nn.Conv(2, (1, 1), dtype=self.dtype,
                             name="det_cls")(det_fuse)

        # masks are non-differentiable in the reference too (the instance
        # map goes through numpy, the text map through .long())
        if det_gt is not None:
            text_map = nearest_resize_torch(
                det_gt.astype(jnp.float32), (x1.shape[1], x1.shape[2]))
        else:
            text_map = jax.lax.stop_gradient(soft_argmax(det_logits))
        inst_map = instance_labels(text_map, impl=self.instance_impl)

        # per-scale dual masked self-attention + gated fusion: the region
        # maps travel as O(L) id VECTORS, masked via the in-kernel Pallas
        # path (ops/region_attention.py) at large crops
        fused = []
        for i, f in enumerate(feats):
            hw = (f.shape[1], f.shape[2])
            regions = {
                "text": region_vectors(text_map, hw, self.sr_ratios[i]),
                "inst": region_vectors(inst_map, hw, self.sr_ratios[i]),
            }
            branches = {}
            for kind in ("text", "inst"):
                y = TransformerEncoderLayer(
                    nh[i], self.mlp_ratio, self.sr_ratios[i], 0.0,
                    dtype=self.dtype, name=f"{kind}_sa_{i+1}")(
                        f, deterministic, region=regions[kind])
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"{kind}_sa_bn_{i+1}")(y)
                branches[kind] = y
            fused.append(_GateFuse(dims[i], dtype=self.dtype,
                                   name=f"fuse_text_instance_{i+1}")(
                branches["text"], branches["inst"], train))

        total = sum(self.num_layers)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        offs = [sum(self.num_layers[:i]) for i in range(4)]

        def stage(i, inp):
            return CascadeStage(
                dims[i], self.num_layers[i], nh[i], self.sr_ratios[i],
                self.mlp_ratio,
                tuple(dpr[offs[i]:offs[i] + self.num_layers[i]]),
                dtype=self.dtype, name=f"stage{i}")(inp, deterministic)

        def up(t, ref):
            return jax.image.resize(
                t, (t.shape[0], ref.shape[1], ref.shape[2], t.shape[3]),
                "bilinear")

        def fuse(i, parts):
            # V10's conv2..conv5 are Sequential(Conv bias=False, BN)
            # (cascade_mit.py:4713-4728) — unlike the base variant's bare
            # conv
            cat = jnp.concatenate(parts, axis=-1)
            return _DetConvBN(parts[0].shape[-1], use_bias=False,
                              dtype=self.dtype, name=f"fuse{i}")(cat, train)

        # cascade with the text/instance features injected (V10 forward)
        x4_ = stage(3, fuse(4, [x4, fused[3]]))
        x3_ = stage(2, fuse(3, [x3, up(x4_, x3), fused[2]]))
        x2_ = stage(1, fuse(2, [x2, up(x3_, x2), fused[1]]))
        x1_ = stage(0, fuse(1, [x1, up(x2_, x1), fused[0]]))

        return [x1_, x2_, x3_, x4_], det_logits
