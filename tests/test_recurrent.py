"""GRU/LSTM scans vs torch.nn.GRU/LSTM oracles (torch is CPU-only here and
used purely as a numerics oracle, never in the framework)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fudanocr_tpu.nn.recurrent import BiGRU, BiLSTM


def _port_rnn_weights(params, rnn, kind):
    """Copy torch (Bi)GRU/LSTM weights into our param tree."""
    p = dict(params["params"])
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        p[f"wi_{direction}"] = jnp.asarray(
            getattr(rnn, f"weight_ih_l0{suffix}").detach().numpy().T)
        p[f"wh_{direction}"] = jnp.asarray(
            getattr(rnn, f"weight_hh_l0{suffix}").detach().numpy().T)
        p[f"bi_{direction}"] = jnp.asarray(
            getattr(rnn, f"bias_ih_l0{suffix}").detach().numpy())
        p[f"bh_{direction}"] = jnp.asarray(
            getattr(rnn, f"bias_hh_l0{suffix}").detach().numpy())
    return {"params": p}


@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_bidirectional_rnn_matches_torch(kind):
    torch.manual_seed(0)
    b, t, din, h = 3, 11, 8, 6
    x = np.random.default_rng(2).standard_normal((b, t, din)).astype(np.float32)

    if kind == "gru":
        rnn = torch.nn.GRU(din, h, bidirectional=True, batch_first=True)
        mod = BiGRU(hidden=h)
    else:
        rnn = torch.nn.LSTM(din, h, bidirectional=True, batch_first=True)
        mod = BiLSTM(hidden=h)

    with torch.no_grad():
        want, _ = rnn(torch.from_numpy(x))
    want = want.numpy()

    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _port_rnn_weights(params, rnn, kind)
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
