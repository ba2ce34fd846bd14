"""Microbench the 7x7/4 stem conv: plain NHWC conv vs space-to-depth.

The space-to-depth rewrite (StemConv4x in models/seg/cascade_mit.py) is
motivated by the 3-of-128-lanes input channel waste of a C=3 conv; this
measures whether it actually wins on the chip, forward and fwd+bwd, at
the shapes the seg stack runs (512^2 train crop, 1024^2 det crop, the
3-crop slide batch).

Usage: python scripts/bench_stem.py
Prints one JSON line per (shape, variant, mode).
"""

import json
import time

import jax
import jax.numpy as jnp


def plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (4, 4), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, k):
    b, h, w, c = x.shape
    f = k.shape[-1]
    xp = x.reshape(b, h // 4, 4, w // 4, 4, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kp.reshape(2, 4, 2, 4, c, f)
    k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 16 * c, f)
    return jax.lax.conv_general_dilated(
        xp, k2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(fn, *args, iters=32):
    # chain inside one jit: axon tunnel dispatch ~1.4 s/call
    def chain(x, k):
        def body(c, _):
            y = fn(c, k)
            # data dependence: fold output back into a same-shaped carry
            return c + 1e-12 * y.mean(), y.mean()
        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs

    j = jax.jit(chain).lower(*args).compile()
    float(j(*args)[-1])  # warm
    t0 = time.perf_counter()
    float(j(*args)[-1])
    return (time.perf_counter() - t0) / iters


def timed_grad(fn, x, k, iters=32):
    def loss(x, k):
        return (fn(x, k).astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss, argnums=1)

    def chain(x, k):
        def body(kc, _):
            dk = g(x, kc)
            return kc - 1e-12 * dk, dk.mean()
        _, outs = jax.lax.scan(body, k, None, length=iters)
        return outs

    j = jax.jit(chain).lower(x, k).compile()
    float(j(x, k)[-1])
    t0 = time.perf_counter()
    float(j(x, k)[-1])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (7, 7, 3, 32), jnp.bfloat16) * 0.05
    shapes = [("512_b2", (2, 512, 512, 3)),
              ("1024_b1", (1, 1024, 1024, 3)),
              ("1024_b3_slide", (3, 1024, 1024, 3))]
    for name, shape in shapes:
        x = jax.random.uniform(key, shape, jnp.bfloat16)
        for vname, fn in (("plain", plain), ("s2d", s2d)):
            dt = timed(fn, x, k)
            dtg = timed_grad(fn, x, k)
            print(json.dumps({"shape": name, "variant": vname,
                              "fwd_ms": round(dt * 1e3, 3),
                              "fwd+wgrad_ms": round(dtg * 1e3, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
