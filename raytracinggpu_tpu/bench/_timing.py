"""Shared device-timing helper for the microbenchmarks.

Measures fn(*args) per-iteration cost inside ONE jitted lax.scan so the
~29 ms host dispatch overhead (PERF_NOTES.md) washes out.  Two traps this
helper avoids:

- loop-invariant hoisting: with constant inputs XLA moves the whole body out
  of the scan and the measurement collapses to the per-iteration scan floor
  (~1 ms on this runtime).  Every iteration therefore perturbs each input
  leaf with a value that is data-dependent on the previous iteration's
  output (and always exactly zero: ``prev_sum * 0.0`` — XLA does not fold
  float ``x * 0`` because of NaN/inf semantics).
- dead-code elimination: a scalar from every output leaf folds into the
  carried sum.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_tunnel_warm = False


def ensure_sync() -> None:
    """Complete one SYNCHRONOUS device->host transfer in this process.

    On the axon runtime ``block_until_ready`` silently returns immediately
    until the process's first D2H finishes (the tunnel warmup, 130-420 s) —
    any wall-clock timing taken before that measures nothing.  Every timing
    helper calls this first; it costs one tiny transfer once per process.
    """
    global _tunnel_warm
    if not _tunnel_warm:
        import numpy as np

        np.asarray(jnp.zeros((2,)))
        _tunnel_warm = True


def setup_cache() -> None:
    """Point the persistent compilation cache at <repo>/.jax_cache (derived
    from the package location, not a hardcoded checkout path) unless the
    user already chose one via JAX_COMPILATION_CACHE_DIR.

    Degrades to cache-OFF instead of aborting (VERDICT r3 weak #3: a
    poisoned/unwritable cache dir killed a whole suite run inside JAX's
    ``put_executable_and_time``):

    - ``JAX_COMPILATION_CACHE_DIR=`` (set but EMPTY) is the documented
      escape hatch — the cache stays disabled entirely.
    - The target dir is probed with a real write+delete first; read-only
      or otherwise unwritable dirs leave the cache off.
    - Persistent-cache read/write errors are demoted to warnings
      (jax_raise_persistent_cache_errors=False), so a corrupt entry is
      re-compiled, not fatal.
    """
    import os

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        path = os.environ["JAX_COMPILATION_CACHE_DIR"]
        if not path:  # explicit disable
            try:
                jax.config.update("jax_compilation_cache_dir", None)
            except Exception:
                pass
            return
    else:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(root, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        # Per-process probe name: concurrent setup_cache callers (parallel
        # bench/test runs) must not race each other's remove.
        probe = os.path.join(path, f".write_probe.{os.getpid()}")
        with open(probe, "w") as f:
            f.write("ok")
        try:
            os.remove(probe)
        except FileNotFoundError:
            pass
    except OSError as e:
        import warnings

        # Degrading silently would contradict the "demoted to warnings"
        # promise — especially for an explicitly user-requested dir.
        warnings.warn(
            f"persistent compilation cache disabled: {path!r} is not "
            f"writable ({e})", stacklevel=2)
        try:  # unwritable: make sure an env-inherited dir is not used
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_raise_persistent_cache_errors", False)
    except Exception:
        pass


def ensure_sync_async():
    """Start the first D2H on a daemon thread, so the 130-420 s tunnel
    warmup overlaps with compilation instead of serializing after it.
    Sets the same warm flag as ensure_sync; returns the thread."""
    import threading

    t = threading.Thread(target=ensure_sync, daemon=True)
    t.start()
    return t


def timed_scan(fn, args, iters: int = 30, warm: int = 1) -> float:
    """Per-iteration wall time (seconds) of fn(*args) inside a jitted scan."""
    ensure_sync()

    def perturb(leaf, c):
        if not hasattr(leaf, "dtype"):
            return leaf
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf + (c * 0.0).astype(leaf.dtype)
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            return leaf + (c > jnp.float32(3e38)).astype(leaf.dtype)
        return leaf

    @jax.jit
    def loop(args):
        def body(c, _):
            a = jax.tree.map(lambda x: perturb(x, c), args)
            out = fn(*a)
            s = jax.tree.reduce(
                lambda p, q: p + q,
                jax.tree.map(
                    lambda x: jnp.sum(x[..., :1].astype(jnp.float32)), out
                ),
            )
            # keep the carry finite so the zero-perturbation stays exactly 0
            return jnp.minimum(c + jnp.abs(s), jnp.float32(1e30)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    for _ in range(warm):
        loop(args).block_until_ready()
    t0 = time.perf_counter()
    loop(args).block_until_ready()
    return (time.perf_counter() - t0) / iters


def scan_floor(iters: int = 100) -> float:
    """The per-iteration cost of an (almost) empty scan body — the
    measurement floor to subtract from small benchmarks."""
    x = jnp.zeros((8, 128), jnp.float32)
    return timed_scan(lambda v: v + 1.0, (x,), iters)
