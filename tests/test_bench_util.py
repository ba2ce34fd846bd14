"""bench_util.analytic_flops: exactness on known-cost programs.

Exists because round-2 MFU numbers trusted XLA's executable-level
cost_analysis, which counts a lax.scan body ONCE (not x trip count) —
see BASELINE.md 'MFU accounting'."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")  # bench_util lives at the repo root


def test_matmul_and_scan_trip_count():
    from bench_util import analytic_flops

    A = jnp.ones((64, 64))

    def chain(x):
        def body(x, _):
            return x @ A, x.mean()
        _, m = jax.lax.scan(body, x, None, length=7)
        return m

    got = analytic_flops(chain, jnp.ones((64, 64)))
    assert got["flops"] == 7 * 2 * 64 ** 3


def test_conv_flops():
    import flax.linen as nn
    from bench_util import analytic_flops

    conv = nn.Conv(16, (3, 3))
    x = jnp.ones((2, 32, 32, 8))
    v = conv.init(jax.random.PRNGKey(0), x)
    got = analytic_flops(lambda v, x: conv.apply(v, x), v, x)
    assert got["flops"] == 2 * 2 * 32 * 32 * 16 * 8 * 9


def test_grouped_conv_flops():
    import flax.linen as nn
    from bench_util import analytic_flops

    conv = nn.Conv(8, (3, 3), feature_group_count=8)  # depthwise
    x = jnp.ones((1, 16, 16, 8))
    v = conv.init(jax.random.PRNGKey(0), x)
    got = analytic_flops(lambda v, x: conv.apply(v, x), v, x)
    assert got["flops"] == 2 * 16 * 16 * 8 * 1 * 9


def test_pallas_cost_estimate_credited():
    from bench_util import analytic_flops
    from fudanocr_tpu.ops.region_attention import packed_flash_mha

    q = jnp.ones((1, 1024, 32))
    k = jnp.ones((1, 128, 32))
    v = jnp.ones((1, 128, 32))
    got = analytic_flops(lambda q, k, v: packed_flash_mha(q, k, v, 1),
                         q, k, v)
    assert got["flops"] == 2 * 2 * 1024 * 128 * 32
    assert got["transcendentals"] == 1024 * 128


def test_grad_counts_forward_and_backward():
    from bench_util import analytic_flops

    A = jnp.ones((32, 32))

    def loss(x):
        return jnp.sum((x @ A) ** 2)

    fwd = analytic_flops(loss, jnp.ones((32, 32)))["flops"]
    both = analytic_flops(jax.grad(loss), jnp.ones((32, 32)))["flops"]
    assert fwd == 2 * 32 ** 3
    assert both >= 2 * fwd  # bwd adds ~2x the forward matmul cost


def test_require_device_passes_on_live_backend():
    # On the CPU test backend jax.devices() answers immediately; the
    # helper must return (the tunnel-down branch os._exit(1)s, which
    # would fail this test by killing the process).
    from bench_util import require_device

    require_device(timeout_s=60)
