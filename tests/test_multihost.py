"""Multi-host (multi-process) training: a real 2-process CPU 'pod'.

Spawns two fresh interpreters, each with 4 virtual CPU devices, joined via
jax.distributed (gloo collectives) into one 8-device global mesh — the
honest analogue of a 2-host TPU pod slice — and runs the FULL training
loop (loop.train) in SPMD. Asserts:

* both ranks finish and print the same final parameter digest;
* the digest matches a single-process 8-device run bit-for-bit (the
  global program is identical; only the host→device feeding differs);
* host side effects (logs, checkpoints, predictions.txt) happen on the
  primary rank only.

The reference has no distributed capability at all (SURVEY §2); this
pins the new capability end-to-end rather than only at the step level
(test_parallel.py covers single-process mesh numerics).
"""

import os
import re
import socket
import subprocess
import sys
import tempfile

import pytest

# the 2-process pods each boot two interpreters + gloo rendezvous —
# full-gate only (pytest -m "not slow" is the fast smoke tier)
pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "multihost_worker.py")

# Shared persistent compile cache for ALL worker processes (baseline,
# both ranks, every retry). gloo's connect/KV rendezvous deadline is a
# hard 30 s; on a slow or contended host two fresh interpreters compiling
# the SPMD program concurrently can miss it (the failure lands at the
# first collective dispatch, AFTER compile) — with the cache, a retry
# compiles in milliseconds and the ranks rendezvous comfortably. Keyed on
# the host CPU feature set (fixtures.host_cache_tag): a stale cache from a
# different machine image hits slow machine-feature-mismatch AOT load
# fallbacks, which push a rank past the same 30 s rendezvous (observed).
sys.path.insert(0, HERE)
from fixtures import host_cache_tag  # noqa: E402

_JAX_CACHE = os.path.join(
    tempfile.gettempdir(),
    f"recnet_multihost_jaxcache_"
    f"{os.getuid() if hasattr(os, 'getuid') else 'u'}_{host_cache_tag()}")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_rank(pid, nproc, port, root, out, mesh, ndev, backend="npz",
              cache=False, bundle=False):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    env["JAX_COMPILATION_CACHE_DIR"] = _JAX_CACHE
    # cache even sub-second compiles: rendezvous latency is what matters
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         root, out, mesh, str(ndev), backend,
         "cache" if cache else "nocache",
         "bundle" if bundle else "nobundle"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _digest(stdout: str) -> float:
    m = re.search(r"DIGEST \d+ ([0-9.]+)", stdout)
    assert m, f"no DIGEST line in:\n{stdout}"
    return float(m.group(1))



def _run_two_proc(tmp_path, root, mesh_shape, backend="npz", tag="",
                  cache=False, bundle=False):
    """Run the 2-process pod with retries for rendezvous timing flakes
    (gloo's 30 s deadline vs first-attempt compile times — the shared
    _JAX_CACHE makes retries compile instantly); returns (outs, results)
    of the successful attempt."""
    n_attempts = 3
    for attempt in range(n_attempts):
        port = _free_port()
        outs = [str(tmp_path / f"{tag}a{attempt}rank{i}") for i in range(2)]
        procs = [_run_rank(i, 2, port, root, outs[i], mesh_shape, 4,
                           backend=backend, cache=cache, bundle=bundle)
                 for i in range(2)]
        results = [pr.communicate(timeout=900) for pr in procs]
        if all(pr.returncode == 0 for pr in procs):
            return outs, results
        diag = "\n".join(
            f"--- attempt {attempt} rank {i} rc={procs[i].returncode} "
            f"stdout:\n{results[i][0][-1500:]}\nstderr:\n"
            f"{results[i][1][-3000:]}" for i in range(2))
        assert attempt < n_attempts - 1, \
            f"2-process run failed {n_attempts} times:\n{diag}"
        print(f"retrying flaky 2-process run:\n{diag}")


@pytest.mark.parametrize("mesh_shape", ["data=8", "data=4,model=2"])
def test_two_process_training_matches_single_process(tmp_path, mesh_shape):
    from fixtures import make_msvd_fixture

    root = str(tmp_path / "fixture")
    make_msvd_fixture(root, n_videos=12, feat_dim=32)

    # --- single-process 8-device baseline ---
    base_out = str(tmp_path / "single")
    p = _run_rank(0, 1, _free_port(), root, base_out, mesh_shape, 8)
    out0, err0 = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{err0[-3000:]}"
    base = _digest(out0)

    # --- two processes x 4 local devices, same global mesh ---
    outs, results = _run_two_proc(tmp_path, root, mesh_shape)
    d0, d1 = (_digest(results[i][0]) for i in range(2))

    assert d0 == d1, f"ranks disagree: {d0} vs {d1}"
    assert d0 == pytest.approx(base, abs=0.0), \
        f"multi-process {d0} != single-process {base}"

    # primary-only side effects
    assert os.path.isdir(os.path.join(outs[0], "ckpt"))
    assert os.listdir(os.path.join(outs[0], "ckpt"))
    assert not os.path.exists(os.path.join(outs[1], "ckpt"))
    assert os.path.exists(os.path.join(outs[0], "predictions.txt"))
    assert not os.path.exists(os.path.join(outs[1], "predictions.txt"))
    # rank 1 stays quiet on stdout (no Iter/loss lines)
    assert "Iter" not in results[1][0]


def test_two_process_cooperative_orbax_checkpoint(tmp_path):
    """Multi-host orbax checkpointing: EVERY rank participates in the save
    (loop.py routes orbax saves through all ranks), sidecar JSONs come from
    the primary only, and the saved state restores."""
    from fixtures import make_msvd_fixture

    root = str(tmp_path / "fixture")
    make_msvd_fixture(root, n_videos=12, feat_dim=32)

    outs, results = _run_two_proc(tmp_path, root, "data=8",
                                  backend="orbax")
    d0, d1 = (_digest(results[i][0]) for i in range(2))
    assert d0 == d1

    step_dir = str(tmp_path / "shared_ckpt" / "4")
    assert os.path.isdir(os.path.join(step_dir, "state_orbax"))
    for f in ("config.json", "vocab.json", "meta.json"):
        assert os.path.exists(os.path.join(step_dir, f))
    import json as _json
    meta = _json.load(open(os.path.join(step_dir, "meta.json")))
    assert meta["backend"] == "orbax"

    # restores in a fresh (single-process) context
    import jax
    from recnet_tpu import checkpoint as ckpt
    from recnet_tpu.training.step import init_train_state
    tc, vocab = ckpt.load_config_and_vocab(step_dir)
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc.replace(
        mesh_shape=(("data", 1),)), vocab.n_vocabs)
    restored, meta2 = ckpt.load_checkpoint(step_dir, state)
    assert meta2["step"] == 4


def test_two_process_training_with_device_cache(tmp_path):
    """The device-feature-cache path under a REAL 2-process pod: the train
    and val caches go through dist.put_global (replicated global arrays),
    row indices ride the sharded batch stream — and the result matches a
    single-process cached run bit-for-bit."""
    from fixtures import make_msvd_fixture

    root = str(tmp_path / "fixture")
    make_msvd_fixture(root, n_videos=12, feat_dim=32)

    base_out = str(tmp_path / "single")
    p = _run_rank(0, 1, _free_port(), root, base_out, "data=8", 8,
                  cache=True)
    out0, err0 = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{err0[-3000:]}"
    base = _digest(out0)

    outs, results = _run_two_proc(tmp_path, root, "data=8", tag="cache",
                                  cache=True)
    d0, d1 = (_digest(results[i][0]) for i in range(2))
    assert d0 == d1, f"ranks disagree: {d0} vs {d1}"
    assert d0 == pytest.approx(base, abs=0.0), \
        f"cached multi-process {d0} != cached single-process {base}"


def test_two_process_bundle_build_is_primary_only(tmp_path):
    """data_bundle under a REAL 2-process pod with a shared data_root:
    exactly one rank (the primary) packs the bundle, the other takes
    bundle.load_or_build's polling branch (or loads the finished artifact)
    — and training from it matches a single-process bundled run
    bit-for-bit (VERDICT r4 weak #5: the rank!=0 branch had no coverage)."""
    from fixtures import make_msvd_fixture

    root = str(tmp_path / "fixture")
    make_msvd_fixture(root, n_videos=12, feat_dim=32)

    base_out = str(tmp_path / "single")
    p = _run_rank(0, 1, _free_port(), root, base_out, "data=8", 8,
                  bundle=True)
    out0, err0 = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{err0[-3000:]}"
    base = _digest(out0)
    assert len(os.listdir(os.path.join(root, "bundles"))) == 1

    # the pod gets a FRESH copy of the fixture (same bytes, no bundle):
    # the single-process baseline above already built one under `root`,
    # and a pod run against that root would just load it — never driving
    # the primary-build/poll path this test exists to cover (code review,
    # round 5)
    import shutil
    pod_root = str(tmp_path / "fixture_pod")
    shutil.copytree(root, pod_root, ignore=shutil.ignore_patterns("bundles"))

    outs, results = _run_two_proc(tmp_path, pod_root, "data=8", tag="bundle",
                                  bundle=True)
    d0, d1 = (_digest(results[i][0]) for i in range(2))
    assert d0 == d1, f"ranks disagree: {d0} vs {d1}"
    assert d0 == pytest.approx(base, abs=0.0), \
        f"bundled multi-process {d0} != bundled single-process {base}"
    # the PRIMARY built during the pod run; the non-primary never builds —
    # it either polls for the primary's atomic rename or loads the
    # finished bundle, and neither leaves a build log
    assert "building" in results[0][1], results[0][1][-2000:]
    assert "building" not in results[1][1], results[1][1][-2000:]
    # exactly one bundle on disk (no duplicate keyed dirs)
    bundles = os.path.join(pod_root, "bundles")
    assert len(os.listdir(bundles)) == 1
