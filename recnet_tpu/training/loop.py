"""Training runtime — the reference's train.py main() (train.py:200-427)
rebuilt around one jitted step, a prefetching batcher, and a device mesh.

Cadence and semantics preserved: log every ``log_every`` iterations with the
loss averaged over log_every·batch_size samples (train.py:281-306), full val
pass with GT-vs-PD caption text every ``validate_every`` (train.py:310-372),
test-set decode+score for every search method every ``test_every``
(train.py:376-394), checkpoint every ``save_every`` (train.py:397-420).
New capability: resume from checkpoint (--resume), which the reference lacks.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from recnet_tpu.config import TrainConfig
from recnet_tpu.data import Corpus, cycle, prefetch_to_device
from recnet_tpu.decoding import tokens_to_sentences
from recnet_tpu.evaluation import evaluate
from recnet_tpu.training.step import (
    init_train_state, build_train_step, build_train_multi_step,
    build_train_step_cached, build_train_multi_step_cached, build_val_step,
    build_val_step_cached)
from recnet_tpu.utils.logging import MetricWriter
from recnet_tpu import checkpoint as ckpt
from recnet_tpu.parallel import mesh as mesh_lib
from recnet_tpu.parallel import distributed as dist

# time-to-first-iteration of the most recent train() call on this process
# (corpus build or bundle mmap + state init + cache placement) — benchmark
# scripts read it to record startup cost next to steps/sec
LAST_SETUP_SECONDS: float = float("nan")


def train(tc: TrainConfig, debug: bool = False, loss_only: bool = False,
          resume_from: Optional[str] = None, use_mesh: bool = False,
          log_dir: Optional[str] = None, save_dir: Optional[str] = None,
          profile_dir: Optional[str] = None,
          profile_window: tuple = (10, 14),
          keep_last_k: int = 0,
          ckpt_backend: str = "npz", async_ckpt: bool = False):
    """Run the full training loop. Returns the final TrainState.

    Multi-host: when ``jax.distributed`` has been initialized with >1
    process (parallel.distributed.initialize), every process runs this
    loop as one SPMD program over the global mesh; host-side side effects
    (logs, stdout, npz checkpoints, predictions.txt) happen on process 0
    only. Requires ``use_mesh=True`` — without a shared mesh each process
    would just train its own copy. Orbax checkpointing is cooperative
    (all ranks call save); the npz backend fetches on the primary, which
    requires params to be host-addressable there (true for dp-only
    meshes; a 'model' axis spanning hosts needs backend="orbax").
    """
    multihost = dist.is_multihost()
    primary = dist.is_primary()
    if multihost and not use_mesh:
        raise ValueError(
            "multi-process training requires use_mesh=True (one global "
            "mesh); without it each process would train independently")
    # one shared predicate for every knob-compatibility rule (cadence/k
    # divisibility, cache+sampling, greedy_segment gating, dtype names) —
    # the CLIs and presets run the same check at load time
    tc.validate(debug=debug)
    # k>1: one device dispatch drives k steps via lax.scan (config
    # steps_per_dispatch) — removes per-step host dispatch overhead.
    # Cadences land on dispatch boundaries (validate() enforced it) so
    # behavior stays observationally identical to k=1 (the scan itself is
    # bit-identical, tests/test_train_step.py).
    k = int(tc.steps_per_dispatch)   # validate() rejected k < 1 above
    cache_dt_name = tc.feature_cache_dtype
    say = print if primary else (lambda *a, **k: None)
    t_setup = time.time()
    # per-stage setup attribution: (name, seconds since the previous mark)
    # — printed with the [setup] line so a slow start is diagnosable from
    # any run's log (corpus build vs state-init compile vs cache uploads)
    _stages, _t_mark = [], t_setup

    def mark(name):
        nonlocal _t_mark
        now = time.time()
        _stages.append((name, now - _t_mark))
        _t_mark = now

    say(f"MODEL ID: {tc.id}")
    say(f"DEBUG MODE: {'ON' if debug else 'OFF'}")

    log_dir = log_dir or tc.log_dpath
    save_dir = save_dir or tc.save_dpath
    writer = None if (debug or not primary) else MetricWriter(log_dir)

    corpus = Corpus(tc)
    vocab = corpus.vocab
    say("#vocabs: {} ({}), #words: {} ({}). Trim words which appear less "
          "than {} times.".format(vocab.n_vocabs, vocab.n_vocabs_untrimmed,
                                  vocab.n_words, vocab.n_words_untrimmed,
                                  tc.min_count))

    mark("corpus")
    use_cache = bool(getattr(tc, "device_feature_cache", False))
    cache_dtype = jnp.dtype(cache_dt_name)

    def as_cache_dtype(x):
        # half-width storage halves the upload + HBM residency; the jitted
        # steps widen gathered rows back to f32 (step.py _gather_f32).
        # Bundles built under the same config already store this dtype
        # (bundle.feature_store_dtype), making the cast a no-op here.
        if x.dtype == cache_dtype:
            return x
        out = x.astype(cache_dtype)
        if cache_dt_name == "float16" and not np.isfinite(out).all():
            # f16 clips at ±65504 — an overflow here would NaN the loss
            # with no pointer back to this cast (ADVICE r4); bf16 keeps
            # the full f32 exponent range and cannot overflow
            raise ValueError(
                "feature_cache_dtype='float16' overflowed: features "
                "exceed the f16 range (±65504); use 'bfloat16' instead")
        return out

    def train_cache_host(suffix=""):
        # one cast+announce for both the overlapped and synchronous paths
        cache_np = as_cache_dtype(corpus.train_dataset.feature_cache())
        say(f"device feature cache: {cache_np.shape} {cache_dt_name} "
            f"({cache_np.nbytes / 2**20:.0f} MiB resident in HBM{suffix})")
        return cache_np

    # Single-host fast path: start the train-cache upload NOW, before state
    # init, so the two dominant setup costs overlap (the upload is pure
    # host->device I/O — seconds to tens of seconds on tunneled links at
    # MSR-VTT scale — while init is compile+dispatch). device_put is a pure
    # data move, so this changes nothing numerically. Mesh/multihost runs
    # keep the synchronous order: put_global is a collective whose ordering
    # must match across ranks.
    cache_future = None
    if use_cache and not use_mesh and not multihost:
        cache_np = train_cache_host(", upload overlapped with state init")
        from concurrent.futures import ThreadPoolExecutor
        _upload_pool = ThreadPoolExecutor(max_workers=1)
        cache_future = _upload_pool.submit(jax.device_put, cache_np)
        del cache_np                       # the future keeps it alive
        mark("cache-host+dispatch")

    state, dcfg, rcfg = init_train_state(
        jax.random.PRNGKey(tc.seed), tc, vocab.n_vocabs)
    mark("state-init")
    if resume_from:
        state, meta = ckpt.load_checkpoint(resume_from, state)
        say(f"Resumed from {resume_from} at step {meta['step']}")

    mesh = None
    if use_mesh:
        mesh = mesh_lib.make_mesh(tc.mesh_shape)
        state = mesh_lib.shard_state(state, mesh)

    def put_replicated(x):
        """One cache-placement rule for train AND val caches: replicated
        over the mesh (global array on multi-host), plain device_put
        single-device."""
        if multihost:
            return dist.put_global(x, mesh_lib.replicated(mesh))
        if mesh is not None:
            return jax.device_put(x, mesh_lib.replicated(mesh))
        return jax.device_put(x)

    if use_cache:
        # cache+sampling compatibility was enforced by tc.validate() above
        if cache_future is not None:
            cache_dev = cache_future.result()
            _upload_pool.shutdown(wait=False)
        else:
            cache_np = train_cache_host()
            cache_dev = put_replicated(cache_np)
            del cache_np
        _cached = (build_train_step_cached(tc, dcfg, rcfg) if k == 1
                   else build_train_multi_step_cached(tc, dcfg, rcfg, k))
        # same call shape as the uncached step: "videos" is the (B,) or
        # (k,B) row-index array; the cache never leaves the device
        train_step = lambda s, rows, caps, r: _cached(s, cache_dev, rows,
                                                      caps, r)
    else:
        train_step = (build_train_step(tc, dcfg, rcfg) if k == 1
                      else build_train_multi_step(tc, dcfg, rcfg, k))
    if use_cache and corpus.val_batcher is not None:
        # the val pass revisits every (video, caption) pair — its own
        # (tiny) cache saves ~0.7 GB of upload per validation at MSVD scale
        val_cache_dev = put_replicated(
            as_cache_dtype(corpus.val_dataset.feature_cache()))
        _val_cached = build_val_step_cached(tc, dcfg, rcfg)
        val_step = lambda dp, rp, rows, caps: _val_cached(
            dp, rp, val_cache_dev, rows, caps)
    else:
        val_step = build_val_step(tc, dcfg, rcfg)
    if use_cache:
        mark("cache-wait+val-cache")
    rng = jax.random.PRNGKey(tc.seed + 1)
    if multihost:
        # every jit input must be a global array when the mesh spans
        # processes; the seed key is identical on all ranks, so replicate
        rng = dist.put_global(np.asarray(rng), mesh_lib.replicated(mesh))

    def device_batches():
        it = cycle(corpus.train_batcher)
        stripped = ((videos, captions) for _, videos, captions in it)
        if k > 1:
            def chunked(src):
                while True:
                    pairs = [next(src) for _ in range(k)]
                    yield (np.stack([p[0] for p in pairs]),
                           np.stack([p[1] for p in pairs]))
            stripped = chunked(stripped)
        sharding = None
        if use_mesh:
            # the stacked leading (k,) axis shifts the batch dim right by 1;
            # in cache mode the first leaf is the (B,) row-index vector
            # (batch dim 0) instead of (B,F,E) videos (also batch dim 0)
            sharding = (mesh_lib.batch_sharding(mesh, 0 + (k > 1)),
                        mesh_lib.batch_sharding(mesh, 1 + (k > 1)))
        yield from prefetch_to_device(stripped, tc.prefetch_depth,
                                      sharding=sharding)

    train_loss = train_dec = train_rec = 0.0
    # time-to-first-iteration: everything above (corpus build or bundle
    # mmap, state init, cache placement) is the host-side startup cost the
    # data bundle exists to kill — make it visible on every run
    global LAST_SETUP_SECONDS
    LAST_SETUP_SECONDS = time.time() - t_setup
    mark("rest")
    breakdown = " | ".join(f"{n} {dt:.1f}s" for n, dt in _stages
                           if dt >= 0.05)
    say(f"[setup] corpus + state ready in {LAST_SETUP_SECONDS:.1f}s "
        f"({breakdown})")
    t_start = time.time()
    start_iter = int(state.step)

    batches = device_batches()
    iteration = start_iter
    tracing = False
    try:
        for (videos, captions) in batches:
            # jax.profiler trace window (new aux capability; SURVEY §5);
            # with k>1 the window snaps to dispatch boundaries
            if (profile_dir and not tracing
                    and iteration < profile_window[0] <= iteration + k):
                jax.profiler.start_trace(profile_dir)
                tracing = True
            elif (profile_dir and tracing
                    and profile_window[1] <= iteration + k):
                jax.profiler.stop_trace()
                tracing = False
            state, metrics = train_step(state, videos, captions, rng)
            iteration += k

            # accumulate on-device; only the log-cadence step forces a host sync
            # (the reference's loss.item() at train.py:275-277 synced every
            # iteration — a pipeline stall the TPU loop avoids). With k>1
            # metrics carry a leading (k,) axis — sum it on device.
            reduce = (lambda x: x) if k == 1 else jnp.sum
            train_loss = train_loss + reduce(metrics["loss"])
            train_dec = train_dec + reduce(metrics["dec_loss"])
            train_rec = train_rec + reduce(metrics["rec_loss"])

            if debug or iteration % tc.log_every == 0:
                n = tc.log_every * tc.batch_size
                train_loss = float(train_loss) / n
                train_dec = float(train_dec) / n
                train_rec = float(train_rec) / n
                # failure detection (new aux capability; the reference has none,
                # SURVEY §5): non-finite loss -> emergency checkpoint + abort
                if not np.isfinite(train_loss):
                    path = None
                    if primary or ckpt_backend == "orbax":
                        path = ckpt.save_checkpoint(
                            save_dir, iteration, state, tc, vocab,
                            backend=ckpt_backend,
                            extra={"emergency": True, "loss": train_loss})
                    where = (f"emergency checkpoint saved to {path}"
                             if path is not None
                             else "emergency checkpoint saved by primary")
                    raise FloatingPointError(
                        f"non-finite training loss {train_loss} at iteration "
                        f"{iteration}; {where}")
                dt = time.time() - t_start
                steps_sec = (tc.log_every if not debug else 1) / max(dt, 1e-9)
                if writer:
                    writer.scalar(tc.tx_train_loss, train_loss, iteration)
                    writer.scalar(tc.tx_lambda_decoder, tc.decoder_lambda_reg,
                                  iteration)
                    writer.scalar("perf/steps_per_sec", steps_sec, iteration)
                    if tc.use_recon:
                        writer.scalar(tc.tx_train_loss_decoder, train_dec, iteration)
                        writer.scalar(tc.tx_train_loss_reconstructor, train_rec,
                                      iteration)
                        writer.scalar(tc.tx_lambda_reconstructor,
                                      tc.reconstructor_lambda_reg, iteration)
                        writer.scalar(tc.tx_lambda, tc.lambda_recon, iteration)
                msg = "Iter {} / {} ({:.1f}%): loss {:.5f}".format(
                    iteration, tc.n_iterations,
                    iteration / tc.n_iterations * 100, train_loss)
                if tc.use_recon:
                    msg += " (dec {:.5f} + rec {:.5f})".format(train_dec, train_rec)
                msg += " [{:.1f} it/s]".format(steps_sec)
                say(msg)
                train_loss = train_dec = train_rec = 0.0
                t_start = time.time()

            if debug or iteration % tc.validate_every == 0:
                _validate(tc, corpus, state, val_step, writer, iteration,
                          mesh=mesh if multihost else None, say=say)

            if not loss_only and (debug or iteration % tc.test_every == 0):
                _test(tc, corpus, state, dcfg, writer, iteration,
                      mesh=mesh if multihost else None, say=say,
                      primary=primary)

            if iteration % tc.save_every == 0:
                # orbax saves are cooperative (every rank participates); npz
                # fetches host-side on the primary only
                if primary or ckpt_backend == "orbax":
                    path = ckpt.save_checkpoint(save_dir, iteration, state, tc,
                                                vocab, backend=ckpt_backend,
                                                async_save=async_ckpt)
                    if keep_last_k and primary:
                        ckpt.prune_old(save_dir, keep_last_k)
                    say(f"Saved checkpoint: {path}")

            if iteration >= tc.n_iterations:
                break

    finally:
        if tracing:
            jax.profiler.stop_trace()
        # stop the prefetch thread's device transfers on EVERY
        # exit path — a daemon thread mid-device_put during
        # multi-host teardown can wedge the shutdown barrier
        batches.close()
    ckpt.wait_for_async_saves()
    if writer:
        writer.close()
    if multihost:
        # leave SPMD together: rank 0 trails after host-side work (logs,
        # npz checkpoint, predictions.txt); without a barrier here the
        # fast ranks can hit jax.distributed's shutdown-barrier timeout
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("recnet_tpu_train_end")
    return state


def _validate(tc, corpus, state, val_step, writer, iteration, mesh=None,
              say=print):
    # mesh is passed only on multi-host runs: the sharded params make the
    # val step a global SPMD program, so its inputs must be global arrays
    # too — replicated over the mesh (every rank holds the identical
    # seed-reproduced batch), making the outputs replicated and fetchable.
    if mesh is not None:
        rep = mesh_lib.replicated(mesh)
        put = lambda x: dist.put_global(np.asarray(x), rep)
    else:
        put = jnp.asarray
    val_loss = val_dec = val_rec = 0.0
    gt_captions, pd_captions = [], []
    n_batches = 0
    eos = corpus.vocab.word2idx["<EOS>"]
    for _, videos, captions in corpus.val_batcher:
        m = val_step(state.dec_params, state.rec_params,
                     put(videos), put(captions))
        val_loss += float(m["loss"]) * tc.batch_size
        val_dec += float(m["dec_loss"]) * tc.batch_size
        val_rec += float(m["rec_loss"]) * tc.batch_size
        n_batches += 1
        gt_captions += tokens_to_sentences(captions, corpus.vocab.idx2word, eos)
        pd_captions += tokens_to_sentences(
            np.asarray(m["greedy_tokens"]), corpus.vocab.idx2word, eos)
    n_vals = max(n_batches * tc.batch_size, 1)
    val_loss /= n_vals
    val_dec /= n_vals
    val_rec /= n_vals
    msg = "[Validation] Iter {} / {} ({:.1f}%): loss {:.5f}".format(
        iteration, tc.n_iterations, iteration / tc.n_iterations * 100, val_loss)
    if tc.use_recon:
        msg += " (dec {:.5f} + rec {:5f})".format(val_dec, val_rec)
    say(msg)
    if writer:
        writer.scalar(tc.tx_val_loss, val_loss, iteration)
        if tc.use_recon:
            writer.scalar(tc.tx_val_loss_decoder, val_dec, iteration)
            writer.scalar(tc.tx_val_loss_reconstructor, val_rec, iteration)
        caption_log = "\n\n".join(
            "[GT] {}  \n[PD] {}".format(gt, pd)
            for gt, pd in zip(gt_captions, pd_captions))
        writer.text(tc.tx_predicted_captions, caption_log, iteration)


def _test(tc, corpus, state, dcfg, writer, iteration, mesh=None, say=print,
          primary=True):
    say("[Test] Iter {} / {} ({:.1f}%)".format(
        iteration, tc.n_iterations, iteration / tc.n_iterations * 100))
    for search_method in tc.search_methods:
        sm_id = tc.search_method_id(search_method)
        scores = evaluate(tc, corpus, state.dec_params, dcfg, search_method,
                          predictions_fpath="predictions.txt" if primary
                          else None, mesh=mesh, score_on_host=primary)
        summary = " ".join("{}: {:.3f}".format(s, scores[s])
                           for s in tc.scores if s in scores)
        say("\t{}: {}".format(sm_id, summary))
        if writer:
            for s in tc.scores:
                if s in scores:
                    writer.scalar(tc.tx_score(sm_id, s), scores[s], iteration)
