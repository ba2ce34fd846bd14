"""Shape tests for the SR baseline zoo."""

import jax
import jax.numpy as jnp
import pytest

from fudanocr_tpu.models.sr import build_baseline, SRDiscriminator


@pytest.mark.parametrize("arch,kw", [
    ("srcnn", {}),
    ("srresnet", {}),
    ("edsr", {"num_blocks": 2, "features": 32}),
    ("rdn", {"num_dense": 2}),
    ("esrgan", {"nb": 2}),
])
def test_baseline_shapes(arch, kw):
    from fudanocr_tpu.models.sr import baselines

    cls = {"srcnn": baselines.SRCNN, "srresnet": baselines.SRResNet,
           "edsr": baselines.EDSR, "rdn": baselines.RDN,
           "esrgan": baselines.RRDBNet}[arch]
    model = cls(scale_factor=2, **kw)
    x = jnp.zeros((2, 8, 32, 3))
    vs = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vs, x)
    assert y.shape == (2, 16, 64, 3), arch


def test_discriminator_shape():
    d = SRDiscriminator()
    x = jnp.zeros((2, 32, 128, 3))
    vs = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(vs, x)
    assert y.shape == (2,)
