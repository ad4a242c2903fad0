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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries.

    One full-suite process accumulates many hundreds of XLA CPU executables;
    past ~240 tests the NEXT compilation segfaults inside
    ``backend_compile_and_load`` (reproduced twice at the same test, while
    the same test passes at file scope — a cumulative-state crash in the
    CPU JIT, not a bug in the test).  Dropping the jit caches between
    modules keeps the in-process executable population bounded.  Tests
    never share compiled functions across modules, so the only cost is
    recompiling common helpers (renderer, pyramid) per module.
    """
    yield
    jax.clear_caches()
