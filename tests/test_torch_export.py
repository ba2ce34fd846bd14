"""Round-trip tests for utils/torch_export: reference state_dict ->
port (flax tree) -> export -> state_dict must be BIT-IDENTICAL on every
key (the porters only move elements, so inversion is exact). No model
forwards run — these tests only construct reference modules for their
key/shape templates, so they are cheap.
"""

import os
import sys

import numpy as np
import pytest

REF_STT = "/root/reference/scene-text-telescope"

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from mmcv_shim import REF_SEG, install  # noqa: E402

from fudanocr_tpu.utils.torch_export import export_state_dict  # noqa: E402
from fudanocr_tpu.utils.torch_port import PORTERS  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_cuda_shim(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)


def _import_ref(root, module):
    sys.path.insert(0, root)
    try:
        import importlib
        for m in list(sys.modules):
            if m == module or m == "model" or m.startswith("model."):
                sys.modules.pop(m, None)
        return importlib.import_module(module)
    finally:
        sys.path.pop(0)


def _materialize(meta_sd, cap=None):
    """Fill a meta-device state_dict with globally-unique values (float
    params become float64 so large global offsets stay exact).

    With `cap`, every dimension is clamped to at most `cap` elements: the
    porters only MOVE elements (they never derive structure from sizes
    beyond consistent splits), so the round-trip property is
    size-independent — one full-width test keeps large-count coverage."""
    out, off = {}, 0
    for k, v in meta_sd.items():
        shape = (tuple(min(int(s), cap) for s in v.shape) if cap
                 else tuple(v.shape))
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        vals = torch.arange(off, off + n)
        out[k] = (vals if not v.dtype.is_floating_point
                  else vals.double()).reshape(shape)
        off += n
    return out


def _roundtrip(model, sd, **porter_kwargs):
    sd = {k: v for k, v in sd.items()}
    tree = PORTERS[model](sd, **porter_kwargs)
    out = export_state_dict(model, tree, sd, **porter_kwargs)
    assert set(out) == set(sd)
    for k in sd:
        want = np.asarray(sd[k].detach().cpu().numpy()
                          if hasattr(sd[k], "detach") else sd[k])
        np.testing.assert_array_equal(out[k], want, err_msg=k)
        assert out[k].dtype == want.dtype, k
    return out


needs_stt = pytest.mark.skipif(not os.path.isdir(REF_STT),
                               reason="reference absent")
needs_seg = pytest.mark.skipif(not os.path.isdir(REF_SEG),
                               reason="reference absent")


@needs_stt
def test_tbsrn_export_roundtrip():
    mod = _import_ref(REF_STT, "model.tbsrn")
    torch.manual_seed(0)
    ref = mod.TBSRN(scale_factor=2, width=128, height=32, STN=True,
                    srb_nums=2, hidden_units=32)
    _roundtrip("tbsrn", ref.state_dict(), srb_nums=2)


@needs_stt
def test_tsrn_export_roundtrip():
    mod = _import_ref(REF_STT, "model.tsrn")
    torch.manual_seed(1)
    ref = mod.TSRN(scale_factor=2, width=128, height=32, STN=False,
                   srb_nums=2, hidden_units=16)
    _roundtrip("tsrn", ref.state_dict(), srb_nums=2, stn=False)


@needs_stt
def test_crnn_export_roundtrip():
    mod = _import_ref(REF_STT, "model.crnn.crnn")
    torch.manual_seed(2)
    ref = mod.CRNN(32, 1, 37, 256)
    _roundtrip("crnn", ref.state_dict())


@needs_stt
def test_export_rejects_mismatched_tree():
    mod = _import_ref(REF_STT, "model.crnn.crnn")
    ref = mod.CRNN(32, 1, 37, 256)
    sd = ref.state_dict()
    tree = PORTERS["crnn"](sd)
    del tree["params"]["fc1"]
    with pytest.raises(ValueError, match="missing"):
        export_state_dict("crnn", tree, sd)


@needs_stt
def test_export_module_prefix_passthrough():
    """DataParallel-prefixed checkpoints export back WITH the prefix."""
    mod = _import_ref(REF_STT, "model.crnn.crnn")
    torch.manual_seed(3)
    ref = mod.CRNN(32, 1, 37, 256)
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    _roundtrip("crnn", sd)


@needs_seg
def test_cascade_mit_and_head_export_roundtrip():
    ns = install()
    torch.manual_seed(21)
    ref = ns.cascade_mit.CascadeMixVisionTransformer(
        drop_path_rate=0.0, embed_dims=8, num_layers=[1, 1, 1, 1],
        num_heads=[1, 2, 5, 8], sr_ratios=[8, 4, 2, 1])
    _roundtrip("cascade_mit", ref.state_dict(),
               embed_dims=8, num_layers=(1, 1, 1, 1))

    head = ns.segformer_head.SegformerHead(
        in_channels=[8, 16, 40, 64], in_index=[0, 1, 2, 3], channels=32,
        dropout_ratio=0.1, num_classes=2, norm_cfg=dict(type="BN"),
        align_corners=False,
        loss_decode=[dict(type="CrossEntropyLoss"),
                     dict(type="LovaszLoss", loss_name="loss_lovasz")])
    _roundtrip("segformer_head", head.state_dict())


REF_SLD = "/root/reference/stroke-level-decomposition"
REF_OICTR = "/root/reference/orientation-independent-CTR"
REF_ACPM = "/root/reference/character-profile-matching"
REF_CLIP = "/root/reference/image-ids-CTR/CCR-CLIP"


def _import_ctr_transformer(root):
    """Import a CTR project's model.transformer (stubbing its
    torchvision/lmdb imports and ./data file opens, as in
    test_torch_port.py)."""
    import importlib
    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "lmdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    cwd = os.getcwd()
    sys.path.insert(0, root)
    os.chdir(root)
    try:
        for m in list(sys.modules):
            if m == "model" or m.startswith("model.") \
                    or m == "data" or m.startswith("data.") \
                    or m in ("util", "config", "resnet50"):
                sys.modules.pop(m, None)
        return importlib.import_module("model.transformer")
    finally:
        os.chdir(cwd)
        sys.path.pop(0)


@pytest.mark.skipif(not os.path.isdir(REF_SLD), reason="reference absent")
def test_ocr_transformer_export_roundtrip():
    mod = _import_ctr_transformer(REF_SLD)
    with torch.device("meta"):  # shapes only — skip the ~1024-ch init cost
        ref = mod.Transformer("stroke")
    _roundtrip("ocr_transformer", _materialize(ref.state_dict()),
               layers=(3, 4, 6, 3))


@pytest.mark.skipif(not os.path.isdir(REF_OICTR), reason="reference absent")
def test_oictr_export_roundtrip():
    """The deconv reconstructor keys are unread by port_oictr and must
    pass through the export unchanged."""
    mod = _import_ctr_transformer(REF_OICTR)
    with torch.device("meta"):
        ref = mod.Transformer()
    # dim-capped: the full model is 201M elements of pure CPU churn; the
    # key set (incl. the unread reconstructor) is what this test is about
    _roundtrip("oictr", _materialize(ref.state_dict(), cap=10))


@pytest.mark.skipif(not os.path.isdir(REF_ACPM), reason="reference absent")
def test_acpm_export_roundtrip():
    mod = _import_ctr_transformer(REF_ACPM)
    with torch.device("meta"):
        ref = mod.Transformer("radical")
    _roundtrip("acpm", _materialize(ref.state_dict(), cap=10))


@pytest.mark.skipif(not os.path.isdir(REF_CLIP), reason="reference absent")
def test_ccr_clip_export_roundtrip():
    import importlib
    sys.path.insert(0, REF_CLIP)
    try:
        for m in ("model", "resnet50"):
            sys.modules.pop(m, None)
        mod = importlib.import_module("model")
        with torch.device("meta"):
            ref = mod.CLIP(embed_dim=2048, context_length=8, vocab_size=24,
                           transformer_width=64, transformer_heads=4,
                           transformer_layers=2)
    finally:
        sys.path.pop(0)
    _roundtrip("ccr_clip", _materialize(ref.state_dict()),
               transformer_layers=2)


@needs_seg
def test_cascade_mit_v10_export_roundtrip():
    ns = install()
    torch.manual_seed(22)
    ref = ns.cascade_mit.CascadeMixVisionTransformer_V10(
        drop_path_rate=0.0, embed_dims=8, num_layers=[1, 1, 1, 1],
        num_heads=[1, 2, 5, 8], sr_ratios=[8, 4, 2, 1])
    _roundtrip("cascade_mit_v10", ref.state_dict(),
               embed_dims=8, num_layers=(1, 1, 1, 1))


def test_intra_leaf_duplicate_guard_and_bf16_passthrough(monkeypatch):
    """A porter that broadcasts one template element into several leaf
    positions must be rejected when the values disagree; torch-only
    dtypes (bfloat16) pass through unread keys via ml_dtypes."""
    import ml_dtypes

    from fudanocr_tpu.utils import torch_export
    from fudanocr_tpu.utils.torch_port import PORTERS

    def fake_porter(sd):
        return {"params": {"w": np.broadcast_to(np.asarray(sd["a"]), (2, 3))}}

    monkeypatch.setitem(PORTERS, "_fake", fake_porter)
    template = {"a": torch.arange(3).float(),
                "b": torch.zeros(4, dtype=torch.bfloat16)}

    # consistent duplicated values round-trip fine, bf16 'b' passes through
    tree = {"params": {"w": np.tile(np.arange(3.0), (2, 1))}}
    out = torch_export.export_state_dict("_fake", tree, template)
    np.testing.assert_array_equal(out["a"], [0.0, 1.0, 2.0])
    assert out["b"].dtype == ml_dtypes.bfloat16 and out["b"].shape == (4,)

    # inconsistent values for one template element -> loud failure
    bad = {"params": {"w": np.arange(6.0).reshape(2, 3)}}
    with pytest.raises(ValueError, match="ambiguous"):
        torch_export.export_state_dict("_fake", bad, template)
