"""Seg-pillar checkpoint-port parity: the vendored reference
CascadeMixVisionTransformer / _V10 / SegformerHead (loaded through
tests/mmcv_shim) -> our CascadeMiT / CascadeMiTDetGuided / SegformerHead
via utils/torch_port, comparing full forward outputs — the same evidence
standard as test_torch_port.py gives the other six pillars.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from mmcv_shim import REF_SEG, install  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_cuda_shim(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)


needs_ref = pytest.mark.skipif(not os.path.isdir(REF_SEG),
                               reason="reference absent")

DIMS = dict(embed_dims=8, num_layers=[1, 1, 1, 1], num_heads=[1, 2, 5, 8],
            sr_ratios=[8, 4, 2, 1])


@needs_ref
def test_cascade_mit_port_parity():
    from fudanocr_tpu.models.seg.cascade_mit import CascadeMiT
    from fudanocr_tpu.utils.torch_port import port_cascade_mit

    ns = install()
    torch.manual_seed(21)
    ref = ns.cascade_mit.CascadeMixVisionTransformer(
        drop_path_rate=0.0, **DIMS).eval()
    variables = port_cascade_mit(ref.state_dict(),
                                 embed_dims=8, num_layers=(1, 1, 1, 1))

    ours = CascadeMiT(embed_dims=8, num_layers=(1, 1, 1, 1),
                      num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1),
                      drop_path_rate=0.0)
    x = np.random.default_rng(21).random((2, 128, 128, 3)).astype(np.float32)
    outs = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for got_i, want_i in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(got_i), want_i.numpy().transpose(0, 2, 3, 1),
            rtol=2e-3, atol=2e-4)


@needs_ref
def test_segformer_head_port_parity():
    from fudanocr_tpu.models.seg.segformer_head import SegformerHead
    from fudanocr_tpu.utils.torch_port import port_segformer_head

    ns = install()
    torch.manual_seed(22)
    ref = ns.segformer_head.SegformerHead(
        in_channels=[8, 16, 40, 64], in_index=[0, 1, 2, 3], channels=32,
        dropout_ratio=0.1, num_classes=2, norm_cfg=dict(type="BN"),
        align_corners=False,
        loss_decode=[dict(type="CrossEntropyLoss"),
                     dict(type="LovaszLoss", loss_name="loss_lovasz")],
    ).eval()
    variables = port_segformer_head(ref.state_dict())

    ours = SegformerHead(num_classes=2, channels=32, dropout_ratio=0.1)
    rng = np.random.default_rng(22)
    feats = [rng.random((2, 32 // (2 ** i), 32 // (2 ** i), c))
             .astype(np.float32) for i, c in enumerate((8, 16, 40, 64))]
    got = ours.apply(variables, [jnp.asarray(f) for f in feats])
    with torch.no_grad():
        want = ref([torch.from_numpy(f.transpose(0, 3, 1, 2))
                    for f in feats])
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


@needs_ref
def test_cascade_mit_v10_port_parity():
    """Det-guided V10: pyramid outputs in eval mode (prediction-built
    attention masks, host cv2 instance labels) + the det head logits.

    batch=1 sidesteps the reference's attn-mask .repeat(num_heads,...)
    batch/head-major layout mix-up (cascade_mit.py:4894) which
    misassociates masks with batch elements for B>1."""
    import cv2  # noqa: F401  (host instance labeling needs it)

    from fudanocr_tpu.models.seg.det_guided import CascadeMiTDetGuided
    from fudanocr_tpu.utils.torch_port import port_cascade_mit_v10

    ns = install()
    torch.manual_seed(23)
    ref = ns.cascade_mit.CascadeMixVisionTransformer_V10(
        drop_path_rate=0.0, **DIMS).eval()
    variables = port_cascade_mit_v10(ref.state_dict(),
                                     embed_dims=8, num_layers=(1, 1, 1, 1))

    ours = CascadeMiTDetGuided(embed_dims=8, num_layers=(1, 1, 1, 1),
                               num_heads=(1, 2, 5, 8),
                               sr_ratios=(8, 4, 2, 1), drop_path_rate=0.0,
                               instance_impl="host")  # the torch fixture
    # bakes cv2's hole filling in; auto would take the device CCL on the
    # suite's 8-device mesh (mesh-aware dispatch)
    x = np.random.default_rng(23).random((1, 128, 128, 3)).astype(np.float32)
    outs, det_logits = ours.apply(variables, jnp.asarray(x))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = ref(tx)  # eval branch returns the pyramid only
        # the det head the eval branch computes internally but drops
        # (cascade_mit.py:5028-5036), re-driven through ref's own modules:
        x1 = ref.bn1(ref.conv1(tx))
        x2 = ref.layer1(x1)
        x3 = ref.layer2(x2)
        x4 = ref.layer3(x3)
        import torch.nn.functional as F
        det_feat = [
            F.interpolate(ref.out_det_1(x1), size=x1.shape[2:],
                          mode="bilinear", align_corners=False),
            F.interpolate(ref.out_det_2(x2), size=x1.shape[2:],
                          mode="bilinear", align_corners=False),
            F.interpolate(ref.out_det_3(x3), size=x1.shape[2:],
                          mode="bilinear", align_corners=False),
            F.interpolate(ref.out_det_4(x4), size=x1.shape[2:],
                          mode="bilinear", align_corners=False),
        ]
        want_det = ref.det_cls(ref.fusion_conv(torch.cat(det_feat, dim=1)))

    np.testing.assert_allclose(np.asarray(det_logits),
                               want_det.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    for got_i, want_i in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(got_i), want_i.numpy().transpose(0, 2, 3, 1),
            rtol=2e-3, atol=5e-4)
