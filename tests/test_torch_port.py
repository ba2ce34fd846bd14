"""Checkpoint-port parity: reference torch models (random init) -> our
models via utils/torch_port, comparing full forward outputs.

The reference code hardcodes .cuda() calls (e.g. tbsrn.py:83), so the
fixture shims Tensor.cuda/Module.cuda to identity for CPU execution.
"""

import os
import sys

import numpy as np
import pytest

REF_STT = "/root/reference/scene-text-telescope"
REF_SLD = "/root/reference/stroke-level-decomposition"

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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


@pytest.mark.skipif(not os.path.isdir(REF_STT), reason="reference absent")
def test_tbsrn_port_parity():
    from fudanocr_tpu.models.sr import TBSRN
    from fudanocr_tpu.utils.torch_port import port_tbsrn

    mod = _import_ref(REF_STT, "model.tbsrn")
    torch.manual_seed(0)
    # hidden_units must be 32: the reference hardcodes the FeatureEnhancer
    # to 128-d tokens (64 trunk + 64 PE, tbsrn.py:68,83)
    ref = mod.TBSRN(scale_factor=2, width=128, height=32, STN=True,
                    srb_nums=2, hidden_units=32).eval()
    variables = port_tbsrn(ref.state_dict(), srb_nums=2)

    x = np.random.default_rng(0).random((1, 16, 64, 3)).astype(np.float32)
    ours = TBSRN(scale_factor=2, width=128, height=32, stn=True, srb_nums=2,
                 hidden_units=32)
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF_STT), reason="reference absent")
def test_tsrn_port_parity():
    from fudanocr_tpu.models.sr import TSRN
    from fudanocr_tpu.utils.torch_port import port_tsrn

    mod = _import_ref(REF_STT, "model.tsrn")
    torch.manual_seed(1)
    ref = mod.TSRN(scale_factor=2, width=128, height=32, STN=False,
                   srb_nums=2, hidden_units=16).eval()
    variables = port_tsrn(ref.state_dict(), srb_nums=2, stn=False)

    x = np.random.default_rng(1).random((2, 16, 64, 3)).astype(np.float32)
    ours = TSRN(scale_factor=2, width=128, height=32, stn=False, srb_nums=2,
                hidden_units=16)
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF_SLD), reason="reference absent")
def test_sld_transformer_port_parity():
    """The shared CTR core vs stroke-level-decomposition's Transformer."""
    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer
    from fudanocr_tpu.utils.torch_port import port_ocr_transformer

    # the reference chain (model.transformer -> util -> data.lmdbReader)
    # imports torchvision/lmdb (absent here) and opens ./data files; stub
    # the modules and chdir into the reference project
    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "lmdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    cwd = os.getcwd()
    sys.path.insert(0, REF_SLD)
    os.chdir(REF_SLD)
    try:
        for m in list(sys.modules):
            if m == "model" or m.startswith("model.") \
                    or m == "data" or m.startswith("data.") \
                    or m in ("util", "config", "resnet50"):
                sys.modules.pop(m, None)
        import importlib
        mod = importlib.import_module("model.transformer")
    finally:
        os.chdir(cwd)
        sys.path.pop(0)

    torch.manual_seed(2)
    ref = mod.Transformer("stroke").eval()
    sd = ref.state_dict()
    vocab = ref.word_n_class

    variables = port_ocr_transformer(sd, layers=(3, 4, 6, 3))
    # SLD's ResNet pools only at the stem (its layer1_pool is commented out)
    ours = OCRTransformer(vocab=vocab, num_in=3, layers=(3, 4, 6, 3),
                          num_heads=4, stage1_pool=False)

    rng = np.random.default_rng(2)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    text = rng.integers(0, vocab, (2, 5)).astype(np.int64)
    length = torch.tensor([5, 5])

    out = ours.apply(variables, jnp.asarray(img),
                     jnp.asarray(text.astype(np.int32)))
    got = np.asarray(out["pred"])
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)), length,
                   torch.from_numpy(text), test=True)["pred"].numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


@pytest.mark.skipif(not os.path.isdir(REF_SLD), reason="reference absent")
def test_greedy_decode_matches_reference_autoregressive_loop():
    """Our fixed-length fori_loop greedy decode must produce the same token
    sequences as the reference's python autoregressive eval loop with conv
    caching (stroke-level-decomposition/train.py:110-121)."""
    from fudanocr_tpu.models.rec.ocr_transformer import (OCRTransformer,
                                                         greedy_decode)
    from fudanocr_tpu.utils.torch_port import port_ocr_transformer

    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "lmdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    cwd = os.getcwd()
    sys.path.insert(0, REF_SLD)
    os.chdir(REF_SLD)
    try:
        for m in list(sys.modules):
            if m == "model" or m.startswith("model.") \
                    or m == "data" or m.startswith("data.") \
                    or m in ("util", "config", "resnet50"):
                sys.modules.pop(m, None)
        import importlib
        mod = importlib.import_module("model.transformer")
    finally:
        os.chdir(cwd)
        sys.path.pop(0)

    torch.manual_seed(7)
    ref = mod.Transformer("stroke").eval()
    vocab = ref.word_n_class
    variables = port_ocr_transformer(ref.state_dict(), layers=(3, 4, 6, 3))
    ours = OCRTransformer(vocab=vocab, num_in=3, layers=(3, 4, 6, 3),
                          num_heads=4, stage1_pool=False)

    rng = np.random.default_rng(7)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    max_len = 6

    got = np.asarray(greedy_decode(ours, variables, jnp.asarray(img),
                                   max_len))

    # reference loop: grow the prefix one token per step, reusing conv
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        conv = ref(timg, None, None)['conv']
        prefix = torch.zeros((2, 1), dtype=torch.long)
        preds = []
        for i in range(max_len):
            length = torch.tensor([i + 1] * 2)
            out = ref(timg, length, prefix, conv_feature=conv,
                      test=True)['pred']
            nxt = out[:, i, :].argmax(-1)
            preds.append(nxt.numpy())
            prefix = torch.cat([prefix, nxt[:, None]], dim=1)
    want = np.stack(preds, axis=1)
    np.testing.assert_array_equal(got, want)


REF_CLIP = "/root/reference/image-ids-CTR/CCR-CLIP"


@pytest.mark.skipif(not os.path.isdir(REF_CLIP), reason="reference absent")
def test_ccr_clip_port_parity():
    from fudanocr_tpu.models.rec.ccr_clip import CCRCLIP
    from fudanocr_tpu.utils.torch_port import port_ccr_clip

    # CLIP.__init__ does `from resnet50 import ...` lazily — keep the
    # reference dir on sys.path through construction
    sys.path.insert(0, REF_CLIP)
    try:
        for m in ("model", "resnet50"):
            sys.modules.pop(m, None)
        import importlib
        mod = importlib.import_module("model")
        torch.manual_seed(3)
        vocab = 24
        ref = mod.CLIP(embed_dim=2048, context_length=8, vocab_size=vocab,
                       transformer_width=64, transformer_heads=4,
                       transformer_layers=2).eval()
    finally:
        sys.path.pop(0)
    variables = port_ccr_clip(ref.state_dict(), transformer_layers=2)

    ours = CCRCLIP(vocab_size=vocab, context_length=8, transformer_width=64,
                   transformer_heads=4, transformer_layers=2)

    rng = np.random.default_rng(3)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    # token rows must end with the max id (EOT pooling, model.py:205)
    txt = np.asarray([[1, 2, 3, vocab - 1, 0, 0, 0, 0],
                      [4, 5, vocab - 1, 0, 0, 0, 0, 0]], np.int64)

    got_i, got_t, got_s = ours.apply(variables, jnp.asarray(img),
                                     jnp.asarray(txt.astype(np.int32)))
    with torch.no_grad():
        want_i, want_t, want_s = ref(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(txt))
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(),
                               rtol=2e-3, atol=2e-4)
    assert abs(float(got_s) - float(want_s)) < 1e-3


@pytest.mark.skipif(not os.path.isdir(REF_STT), reason="reference absent")
def test_text_focus_oracle_port_parity():
    """The frozen text-focus loss transformer (1-channel encoder
    [1,2,5,3], 16-head decoder) — predictions AND cross-attention maps
    must match, since the loss trains on the attention maps
    (text_focus_loss.py:95)."""
    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer
    from fudanocr_tpu.utils.torch_port import port_ocr_transformer

    sys.path.insert(0, REF_STT)
    try:
        sys.modules.pop("loss", None)
        sys.modules.pop("loss.transformer", None)
        import importlib
        mod = importlib.import_module("loss.transformer")
    finally:
        sys.path.pop(0)

    torch.manual_seed(11)
    ref = mod.Transformer().eval()  # vocab 37
    variables = port_ocr_transformer(ref.state_dict(), layers=(1, 2, 5, 3))
    ours = OCRTransformer(vocab=37, num_in=1, layers=(1, 2, 5, 3),
                          num_heads=16)

    rng = np.random.default_rng(11)
    img = rng.random((2, 32, 128, 1)).astype(np.float32)
    text = rng.integers(0, 37, (2, 5)).astype(np.int64)
    length = torch.tensor([5, 5])

    out = ours.apply(variables, jnp.asarray(img),
                     jnp.asarray(text.astype(np.int32)))
    with torch.no_grad():
        # test=True returns the dense (B, L, C) results
        want_pred = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                        length, torch.from_numpy(text), test=True)
        # grab the attention map via the non-test path's ragged packing
        _, want_map, _ = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                             length, torch.from_numpy(text), test=False)
    np.testing.assert_allclose(np.asarray(out["pred"]), want_pred.numpy(),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["map"]), want_map.numpy(),
                               rtol=2e-3, atol=1e-4)


REF_OICTR = "/root/reference/orientation-independent-CTR"


@pytest.mark.skipif(not os.path.isdir(REF_OICTR), reason="reference absent")
def test_oictr_rec_path_port_parity():
    """OI-CTR recognition + direction branches vs the reference (the
    deconv reconstructor is a redesigned head and excluded)."""
    from fudanocr_tpu.models.rec.oictr import OICTR
    from fudanocr_tpu.utils.torch_port import port_oictr

    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "lmdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    cwd = os.getcwd()
    sys.path.insert(0, REF_OICTR)
    os.chdir(REF_OICTR)
    try:
        for m in list(sys.modules):
            if m == "model" or m.startswith("model.") \
                    or m == "data" or m.startswith("data.") \
                    or m in ("util", "config"):
                sys.modules.pop(m, None)
        import importlib
        mod = importlib.import_module("model.transformer")
        torch.manual_seed(13)
        ref = mod.Transformer().eval()
    finally:
        os.chdir(cwd)
        sys.path.pop(0)

    vocab = ref.word_n_class
    ported = port_oictr(ref.state_dict())
    ours = OICTR(vocab=vocab)

    rng = np.random.default_rng(13)
    # reference geometry 32x256 -> 8x-downsampled 4x32 = 128 cells for
    # features_compress (transformer.py:406)
    img = rng.random((2, 32, 256, 3)).astype(np.float32)
    text = rng.integers(0, vocab, (2, 4)).astype(np.int64)
    length = torch.tensor([4, 4])

    # merge ported rec/direction params over an initialized tree (the
    # reconstructor keeps its random init)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(img),
                          jnp.zeros((2, 4), jnp.int32))
    params = dict(init_vars["params"])
    params.update(ported["params"])
    variables = {"params": params,
                 "batch_stats": {**init_vars["batch_stats"],
                                 **ported["batch_stats"]}}

    out = ours.apply(variables, jnp.asarray(img),
                     jnp.asarray(text.astype(np.int32)))
    with torch.no_grad():
        timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
        want = ref(timg, length, torch.from_numpy(text), is_v_char=None,
                   test=True)
        # direction branch (only returned in train mode): run it manually
        conv_raw = ref.encoder(timg)
        want_dir = ref.direction_cls(ref.direction_extractor(conv_raw))
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               want["pred"].numpy(), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["direction_logits"]),
                               want_dir.numpy(), rtol=2e-3, atol=5e-4)


REF_ACPM = "/root/reference/character-profile-matching"


@pytest.mark.skipif(not os.path.isdir(REF_ACPM), reason="reference absent")
def test_acpm_port_parity():
    """ACPM decode + counting heads vs the reference (resnet encoder,
    rn_loss L1, stn off — the config.py defaults)."""
    from fudanocr_tpu.models.rec.acpm import ACPM
    from fudanocr_tpu.utils.torch_port import port_acpm

    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "lmdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    cwd = os.getcwd()
    sys.path.insert(0, REF_ACPM)
    os.chdir(REF_ACPM)
    try:
        for m in list(sys.modules):
            if m == "model" or m.startswith("model.") \
                    or m == "data" or m.startswith("data.") \
                    or m in ("util", "config"):
                sys.modules.pop(m, None)
        import importlib
        mod = importlib.import_module("model.transformer")
        torch.manual_seed(17)
        ref = mod.Transformer("radical").eval()
    finally:
        os.chdir(cwd)
        sys.path.pop(0)

    vocab = ref.word_n_class
    ported = port_acpm(ref.state_dict())
    ours = ACPM(vocab=vocab, encoder="resnet", rn_loss="L1", stn=False)

    rng = np.random.default_rng(17)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    text = rng.integers(0, vocab, (2, 4)).astype(np.int64)
    length = torch.tensor([4, 4])

    out = ours.apply(ported, jnp.asarray(img),
                     jnp.asarray(text.astype(np.int32)))
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)), length,
                   torch.from_numpy(text), test=True)
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               want["pred"].numpy(), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["r_num"]),
                               want["r_num"].numpy(), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["s_num"]),
                               want["s_num"].numpy(), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["s_len"]),
                               want["s_len"].numpy(), rtol=2e-3, atol=5e-4)
