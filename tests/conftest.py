"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
host-platform virtual devices (and separately by __graft_entry__.dryrun_multichip).

NOTE: the image's sitecustomize registers an `axon` PJRT plugin and forces
``jax_platforms="axon,cpu"`` in every interpreter, so plain env vars are not
enough — we must override jax.config before any backend initializes.
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the whole suite (same de-flake/speed trick
# test_multihost.py applies to its worker pods): the heavy integration
# tests are compile-bound on this 1-core host — a warm second run loads
# those XLA programs from disk instead of re-optimizing them. Correctness
# is unaffected (the cache keys on the full HLO + flags); per-uid path so
# multi-user hosts don't collide, and keyed on the host's CPU feature set
# (fixtures.host_cache_tag) so a /tmp cache surviving a re-image onto
# different hardware starts fresh instead of hitting slow per-entry
# machine-feature-mismatch AOT load fallbacks. NOTE: must go through
# jax.config.update — the image's sitecustomize imports jax at interpreter
# start, so the JAX_COMPILATION_CACHE_DIR env var is read before conftest
# runs.
import sys as _sys  # noqa: E402

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures import host_cache_tag  # noqa: E402

_TESTS_JAX_CACHE = os.path.join(
    tempfile.gettempdir(),
    f"recnet_tests_jaxcache_"
    f"{os.getuid() if hasattr(os, 'getuid') else 'u'}_{host_cache_tag()}")
jax.config.update("jax_compilation_cache_dir", _TESTS_JAX_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

# Build the C++ _fastmetrics extension for this session if it isn't built
# yet (VERDICT r2: a fresh clone silently skipped the 4 extension tests).
# Runs at collection time — before test modules import
# recnet_tpu.native.HAVE_FASTMETRICS. Skips quietly only when no compiler
# exists; a failed build with a compiler present is a loud error.
import importlib.util as _ilu  # noqa: E402
import shutil as _shutil  # noqa: E402
import subprocess as _sp  # noqa: E402
import sys as _sys  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ilu.find_spec("recnet_tpu.native._fastmetrics") is None:
    if _shutil.which("c++") or _shutil.which("g++") or _shutil.which("cc"):
        _build = _sp.run(
            [_sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_REPO, capture_output=True, text=True, timeout=300)
        if _build.returncode != 0:
            raise RuntimeError(
                "building recnet_tpu.native._fastmetrics failed (a C++ "
                "compiler exists, so this is a real error):\n"
                + _build.stdout[-2000:] + _build.stderr[-2000:])
        # find_spec imported the parent package, which cached
        # HAVE_FASTMETRICS=False before the build — re-evaluate it
        import importlib as _importlib
        _importlib.invalidate_caches()
        import recnet_tpu.native as _native
        _importlib.reload(_native)
        assert _native.HAVE_FASTMETRICS, \
            "_fastmetrics built but still not importable"
    else:
        print("conftest: no C++ compiler found; _fastmetrics tests will "
              "be skipped", file=_sys.stderr)


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
