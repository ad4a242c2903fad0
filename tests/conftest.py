"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must be hermetic and runnable without TPU hardware; multi-chip sharding
paths are exercised with ``--xla_force_host_platform_device_count=8``.
The driver separately compile-checks the TPU path (see ``__graft_entry__.py``).

Note: the ambient environment pins JAX to the TPU platform (JAX_PLATFORMS=axon
via a sitecustomize); the env var alone is not enough to override it, so we
update the jax config directly before any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
