"""Shared demo bootstrap.

The ambient environment registers the remote-TPU (axon) backend via a
sitecustomize hook that can initialize it even when ``JAX_PLATFORMS=cpu``
is set — and that init blocks if the TPU tunnel is down.  Translating the
env var into ``jax.config`` *before* any backend is touched (the same
pattern as tests/conftest.py) makes ``JAX_PLATFORMS=cpu python demos/...``
reliable.  Import this module first in every demo.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)
    if _plat == "cpu" and jax.config.jax_num_cpu_devices < 2:
        jax.config.update("jax_num_cpu_devices", 8)
