"""App-level TTA + slide end-to-end through `apps/seg/test.py --tta`.

Every TTA scale variant goes through the slide grid at the config's
crop/stride (the reference wraps mode='slide' inside MultiScaleFlipAug
the same way). The e2e run uses the reference CROP:STRIDE ratio (4:3) at
1/4 scale — crop 256 / stride 192 over a 320^2 canvas — because a full
1024^2 TTA graph takes >15 CPU-minutes to COMPILE on this 1-core host
(the real 1024^2/768^2 slide geometry executes on the TPU in
bench_seg.py / BENCH_SEG_r03.json). The published-geometry slide GRID
arithmetic is asserted exactly below without running a model."""

import math


_OPTS = [
    "model.backbone.embed_dims=4",
    "model.backbone.num_layers=[1,1,1,1]",
    "model.decode_head.channels=16",
    "data.dataset=synthetic",
    "data.synthetic_size=[320,320]",
    "data.synthetic_samples=4",
    "data.batch_size=4",
    "test.mode=slide",
    "test.crop=[256,256]",
    "test.stride=[192,192]",
]


def test_tta_slide_app_end_to_end():
    from fudanocr_tpu.apps.seg.test import main

    cfg = "configs/seg/textformer_b0_textseg.yaml"
    res = main([cfg, "--tta", "--options"] + _OPTS)

    for k in ("aAcc", "mIoU", "mDice", "mFscore"):
        assert math.isfinite(res[k]), (k, res)
        assert 0.0 <= res[k] <= 1.0 + 1e-6, (k, res)   # fractions, not %
    # stability: probability-averaging across the six TTA variants of an
    # untrained model must not collapse to a degenerate all-wrong result
    assert res["aAcc"] > 0.05, res


def test_slide_grid_positions_reference_geometry():
    """The 1024^2-crop / 768^2-stride grid over the textformer test
    canvases: positions and coverage must match mmseg's slide rule
    (crops clamped to the border, every pixel covered >= once)."""
    import numpy as np

    def positions(h, w, ch, cw, sh, sw):
        ch, cw = min(ch, h), min(cw, w)
        h_grids = max((h - ch + sh - 1) // sh, 0) + 1
        w_grids = max((w - cw + sw - 1) // sw, 0) + 1
        return [(min(i * sh, h - ch), min(j * sw, w - cw), ch, cw)
                for i in range(h_grids) for j in range(w_grids)]

    # 1024x2048 canvas (the bench geometry): 1 x 3 grid, last crop
    # clamped to x = 1024
    pos = positions(1024, 2048, 1024, 1024, 768, 768)
    assert [(y, x) for (y, x, _, _) in pos] == [(0, 0), (0, 768), (0, 1024)]
    # full coverage
    cover = np.zeros((1024, 2048), np.int32)
    for y, x, ch, cw in pos:
        cover[y:y + ch, x:x + cw] += 1
    assert (cover >= 1).all()

    # smaller-than-crop canvas (the 0.75-scale TTA variant of a 1024^2
    # image): single clamped whole-image crop
    pos = positions(768, 768, 1024, 1024, 768, 768)
    assert pos == [(0, 0, 768, 768)]
