"""Environment report (mmseg/utils/collect_env.py:1-18 equivalent).

The reference prints torch/CUDA/mmcv build info at train start so logs
are attributable; this reports the TPU-stack equivalent. Runnable as
`python -m fudanocr_tpu.utils.collect_env`.
"""

from __future__ import annotations

import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info: Dict[str, str] = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "Machine": platform.machine(),
    }
    try:
        import jax
        import jaxlib

        info["JAX"] = jax.__version__
        info["jaxlib"] = jaxlib.__version__
        info["jax.default_backend"] = jax.default_backend()
        try:
            devs = jax.devices()
            info["Devices"] = ", ".join(
                f"{d.device_kind}({d.platform})" for d in devs[:8])
            info["Device count"] = str(len(devs))
            ver = getattr(devs[0].client, "platform_version", "")
            if ver:
                info["Platform version"] = str(ver)
        except Exception as e:  # backend may be unreachable
            info["Devices"] = f"<unavailable: {e}>"
    except ImportError:
        info["JAX"] = "not installed"
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except ImportError:
            info[mod] = "not installed"
    try:
        import subprocess

        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, timeout=5)
        if sha.returncode == 0:
            info["fudanocr_tpu"] = sha.stdout.strip()
    except Exception:
        pass
    return info


if __name__ == "__main__":
    for name, val in collect_env().items():
        print(f"{name}: {val}")
