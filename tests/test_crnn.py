"""CRNN parity: port the reference torch CRNN's weights into ours and
compare logits end to end (the strongest checkpoint-compat test)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.models.rec.crnn import CRNN
from fudanocr_tpu.eval.ctc import CTCLabelConverter

REF = "/root/reference/scene-text-telescope"


def _port_conv(tp):  # torch OIHW -> flax HWIO
    return jnp.asarray(tp.detach().numpy().transpose(2, 3, 1, 0))


def _port_bilstm(dst, rnn):
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        dst[f"wi_{direction}"] = jnp.asarray(
            getattr(rnn, f"weight_ih_l0{suffix}").detach().numpy().T)
        dst[f"wh_{direction}"] = jnp.asarray(
            getattr(rnn, f"weight_hh_l0{suffix}").detach().numpy().T)
        dst[f"bi_{direction}"] = jnp.asarray(
            getattr(rnn, f"bias_ih_l0{suffix}").detach().numpy())
        dst[f"bh_{direction}"] = jnp.asarray(
            getattr(rnn, f"bias_hh_l0{suffix}").detach().numpy())
    return dst


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_crnn_logits_match_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from model.crnn.crnn import CRNN as RefCRNN
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    # the reference's REAL evaluator config: 1-channel gray input
    # (interfaces/base.py:310 `crnn.CRNN(32, 1, 37, 256)`)
    ref = RefCRNN(32, 1, 37, 256).eval()

    ours = CRNN(num_classes=37, hidden=256)
    x = np.random.default_rng(5).random((2, 32, 100, 1)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(lambda a: a, params)  # mutable copy
    p = {"params": dict(p["params"]), "batch_stats": dict(p["batch_stats"])}

    cnn = dict(ref.cnn.named_children())
    for i in range(7):
        conv = cnn[f"conv{i}"]
        p["params"][f"conv{i}"] = {"kernel": _port_conv(conv.weight),
                                   "bias": jnp.asarray(
                                       conv.bias.detach().numpy())}
        if f"batchnorm{i}" in cnn:
            bn = cnn[f"batchnorm{i}"]
            p["params"][f"bn{i}"] = {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy())}
            p["batch_stats"][f"bn{i}"] = {
                "mean": jnp.asarray(bn.running_mean.numpy()),
                "var": jnp.asarray(bn.running_var.numpy())}

    blstm0, blstm1 = ref.rnn[0], ref.rnn[1]
    p["params"]["rnn0"] = {"gru": None}  # placeholder replaced below
    p["params"]["rnn0"] = _port_bilstm({}, blstm0.rnn)
    p["params"]["fc0"] = {
        "kernel": jnp.asarray(blstm0.embedding.weight.detach().numpy().T),
        "bias": jnp.asarray(blstm0.embedding.bias.detach().numpy())}
    p["params"]["rnn1"] = _port_bilstm({}, blstm1.rnn)
    p["params"]["fc1"] = {
        "kernel": jnp.asarray(blstm1.embedding.weight.detach().numpy().T),
        "bias": jnp.asarray(blstm1.embedding.bias.detach().numpy())}

    got = np.asarray(ours.apply(p, jnp.asarray(x)))  # (B, T, C)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(1, 0, 2)  # (T, B, C) -> (B, T, C)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_parse_crnn_input_matches_reference_parse_crnn_data():
    """Our evaluator preprocessing must reproduce the reference's
    parse_crnn_data exactly: torch bicubic (a=-0.75, no antialias) to
    32x100 then 0.299R+0.587G+0.114B gray (interfaces/base.py:319-325)."""
    torch = pytest.importorskip("torch")
    from fudanocr_tpu.models.rec.crnn import parse_crnn_input

    x = np.random.default_rng(7).random((3, 16, 64, 3)).astype(np.float32)
    got = np.asarray(parse_crnn_input(jnp.asarray(x)))  # (B, 32, 100, 1)

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    t = torch.nn.functional.interpolate(t, (32, 100), mode="bicubic")
    want = (0.299 * t[:, 0:1] + 0.587 * t[:, 1:2] + 0.114 * t[:, 2:3])
    want = want.numpy().transpose(0, 2, 3, 1)

    assert got.shape == (3, 32, 100, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_parse_crnn_input_upscale_matches_torch():
    """Same parity on the upscale direction (LR 16x64 -> 32x100 covers
    both H-up and W-up; this covers a downscale in W too)."""
    torch = pytest.importorskip("torch")
    from fudanocr_tpu.ops.resize import resize_bicubic_torch

    x = np.random.default_rng(11).random((2, 32, 128, 3)).astype(np.float32)
    got = np.asarray(resize_bicubic_torch(jnp.asarray(x), (32, 100)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.interpolate(
        t, (32, 100), mode="bicubic").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ctc_converter_roundtrip():
    conv = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")
    labels, lengths = conv.encode(["hello", "a1"], max_len=8)
    assert labels.shape == (2, 8) and list(lengths) == [5, 2]
    # greedy path: repeated ids collapse; a blank separates the double-l
    h, e, l, o = labels[0][0], labels[0][1], labels[0][2], labels[0][4]
    ids = np.array([[h, h, 0, e, l, 0, l, o, 0]])
    assert conv.decode_ids(ids) == ["hello"]
