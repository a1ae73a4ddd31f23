"""Fused vocab-projection+top-K Pallas kernel: parity vs the XLA path.

Runs in interpret mode on the CPU test mesh; the same kernel was verified
token-exact (f32) against the XLA beam on real TPU hardware (see
benchmarks/results.json beam5 rows and decoding.beam_decode docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.ops.pallas.topk_proj import outproj_topk


@pytest.mark.parametrize("n,h,v,k,dtype", [
    (16, 32, 300, 5, jnp.float32),
    (12, 32, 130, 3, jnp.float32),     # non-multiple-of-block N and V
    (128, 64, 517, 5, jnp.bfloat16),
    (7, 32, 129, 2, jnp.float32),      # N < block
    (8, 16, 128, 1, jnp.float32),      # k=1, exact lane multiple
])
def test_outproj_topk_matches_lax_topk(n, h, v, k, dtype):
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.standard_normal((n, h)), dtype)
    w = jnp.asarray(rng.standard_normal((h, v)), dtype)
    b = jnp.asarray(rng.standard_normal((v,)), dtype)
    vals, idxs = outproj_topk(out, w, b, k=k, block_b=8, interpret=True)
    # the kernel computes logits entirely in f32 (see its docstring); the
    # reference is therefore the f32 projection regardless of input dtype
    ref_logits = (out.astype(jnp.float32) @ w.astype(jnp.float32)
                  + b.astype(jnp.float32))
    rv, ri = jax.lax.top_k(ref_logits, k)
    # indices (the semantic payload) must be exact; values may differ by
    # f32 summation order between the kernel's dot and the reference matmul
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)


def test_outproj_topk_tie_order_matches_lax_topk():
    """Repeated logit values must resolve to the same (first-occurrence)
    index order as lax.top_k."""
    h, v = 8, 256
    out = jnp.ones((8, h), jnp.float32)
    # weight columns engineered so many logits tie exactly
    w = jnp.asarray(np.tile(np.eye(h, 8, dtype=np.float32), (1, v // 8)))
    b = jnp.zeros((v,), jnp.float32)
    vals, idxs = outproj_topk(out, w, b, k=6, block_b=8, interpret=True)
    rv, ri = jax.lax.top_k((out @ w + b), 6)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv))


def test_beam_decode_pallas_topk_interpret_matches_xla():
    """Full beam search with the kernel == XLA beam, token for token (f32)."""
    from recnet_tpu.decoding import beam_decode
    from recnet_tpu.models import decoder as dec_mod

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", vocab_size=40, embedding_size=8, encoder_size=16,
        hidden_size=12, attn_size=6)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)  # exercise EOS paths
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((6, 5, 16)).astype(np.float32))
    a = beam_decode(params, cfg, enc, 5, 12)
    b = beam_decode(params, cfg, enc, 5, 12, use_pallas_topk=True,
                    interpret=True)
    assert int(a.n_steps) == int(b.n_steps)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
