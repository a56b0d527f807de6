"""Platform override for benchmark/profile entry points.

The axon dev plugin's site hook ignores the ``JAX_PLATFORMS`` *environment
variable*, so CPU smoke runs of the measurement scripts must route the
request through the config API instead.  ``DEWI_BENCH_PLATFORM`` wins over
``JAX_PLATFORMS`` (it exists so CI can force CPU without disturbing the
test conftest's env handling).
"""

from __future__ import annotations

import os


def apply_platform_override() -> str | None:
    """Honor DEWI_BENCH_PLATFORM / JAX_PLATFORMS via jax.config.

    Must run before first backend use.  Returns the platform applied (or
    None).  Safe to call repeatedly.
    """
    plat = os.environ.get("DEWI_BENCH_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat or None


__all__ = ["apply_platform_override"]
