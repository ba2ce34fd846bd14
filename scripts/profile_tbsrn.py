"""Profile TBSRN inference (the bench.py flagship config) on the chip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_tbsrn.py [outdir]
Prints the grouped per-op device-time breakdown for 4 chained forwards.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from trace_util import device_summary, load_trace  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tbsrn_trace"
    from fudanocr_tpu.models.sr import TBSRN

    model = TBSRN(scale_factor=2, width=128, height=32, stn=True,
                  srb_nums=5, hidden_units=32, dtype=jnp.bfloat16)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (512, 16, 64, 3),
                            jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

    def chain(variables, x):
        def body(x, _):
            y = model.apply(variables, x)
            return y[:, ::2, ::2, :].astype(jnp.float32), \
                y.astype(jnp.float32).mean()
        _, means = jax.lax.scan(body, x, None, length=4)
        return means

    compiled = jax.jit(chain).lower(variables, x0).compile()
    print("warm", float(compiled(variables, x0)[-1]), flush=True)
    jax.profiler.start_trace(outdir)
    print("profiled", float(compiled(variables, x0)[-1]), flush=True)
    jax.profiler.stop_trace()
    device_summary(load_trace(outdir))


if __name__ == "__main__":
    main()
