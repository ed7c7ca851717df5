"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
is testable without TPU hardware (the TPU answer to 'test distributed without
a cluster' — SURVEY.md §4).

The environment force-registers a TPU backend via sitecustomize and sets
JAX_PLATFORMS=axon, so plain env overrides are not enough; the config update
below must run before any JAX backend initializes.
"""
import os

# Perf-only default: the unrolled depth scan (RenderConfig.depth_unroll)
# multiplies every traced program's size ~5x — bit-identical results, but
# it more than doubles the CPU suite's compile-dominated runtime.  Pin it
# to 1 here; tests/test_wavefront.py covers the unrolled path explicitly.
os.environ.setdefault("RT_DEPTH_UNROLL", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    """Make a missing native build LOUD: without librt_native.so the 4
    native-equality tests skip, which is easy to miss in a green run
    (VERDICT r2).  One `make -C native` builds it."""
    from raytracinggpu_tpu import native

    if not native.available():
        import warnings

        warnings.warn(
            "librt_native.so not built — the native C++ equality tests "
            "(tests/test_native.py) will SKIP.  Run `make -C native` first "
            "for full coverage.",
            stacklevel=1,
        )


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it.
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cat_mesh_raw():
    """Parsed cat OBJ without transforms (session-cached)."""
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH, read_obj

    return read_obj(CAT_OBJ_PATH)
