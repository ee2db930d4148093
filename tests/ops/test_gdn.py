"""Gated delta rule: chunk-parallel form == sequential scan oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from lvllm_tpu.ops.gdn import (gated_delta_rule_chunked,
                               gated_delta_rule_ragged)

H, DK, DV = 3, 16, 8


def _inputs(L, seed=0, with_state=True):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((L, H, DK)).astype(np.float32)
    k = rng.standard_normal((L, H, DK)).astype(np.float32)
    v = rng.standard_normal((L, H, DV)).astype(np.float32) * 0.5
    g = -np.abs(rng.standard_normal((L, H))).astype(np.float32) * 0.3
    beta = rng.uniform(0.1, 0.9, (L, H)).astype(np.float32)
    s0 = (rng.standard_normal((H, DK, DV)).astype(np.float32) * 0.3
          if with_state else np.zeros((H, DK, DV), np.float32))
    return map(jnp.asarray, (q, k, v, g, beta, s0))


def _scan_reference(q, k, v, g, beta, s0):
    """Drive the ragged scan as a single-request sequence with slot 0."""
    L = q.shape[0]
    state = jnp.zeros((2, H, DK, DV), jnp.float32).at[0].set(s0)
    outs, state = gated_delta_rule_ragged(
        q, k, v, g, beta, state,
        token_slot=jnp.zeros(L, jnp.int32),
        reset=jnp.zeros(L, bool))
    return outs, state[0]


@pytest.mark.parametrize("L,chunk", [(64, 64), (100, 16), (7, 16),
                                     (128, 32)])
def test_chunked_matches_scan(L, chunk):
    q, k, v, g, beta, s0 = _inputs(L)
    ref_o, ref_s = _scan_reference(q, k, v, g, beta, s0)
    got_o, got_s = gated_delta_rule_chunked(q, k, v, g, beta, s0,
                                            chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-3, rtol=1e-3)


def test_chunked_zero_state():
    q, k, v, g, beta, s0 = _inputs(50, seed=3, with_state=False)
    ref_o, ref_s = _scan_reference(q, k, v, g, beta, s0)
    got_o, got_s = gated_delta_rule_chunked(q, k, v, g, beta, s0,
                                            chunk_size=16)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-3, rtol=1e-3)


def test_chunked_strong_decay_stable():
    """Large negative gates (fast forgetting) must not overflow — the
    chunked form only ever exponentiates non-positive differences."""
    q, k, v, g, beta, s0 = _inputs(96, seed=5)
    g = g * 50.0  # extreme decay
    ref_o, ref_s = _scan_reference(q, k, v, g, beta, s0)
    got_o, got_s = gated_delta_rule_chunked(q, k, v, g, beta, s0,
                                            chunk_size=32)
    assert np.isfinite(np.asarray(got_o)).all()
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-3, rtol=1e-2)


def test_decode_matches_scan():
    """Batched decode update == the per-token scan for a one-token-per-
    request batch (incl. duplicate scratch slots on padding and resets)."""
    from lvllm_tpu.ops.gdn import (causal_conv1d_decode,
                                   causal_conv1d_ragged,
                                   gated_delta_rule_decode)
    rng = np.random.default_rng(7)
    T, S = 6, 8  # 6 tokens; slots 0..7 with 7 = scratch
    q = rng.standard_normal((T, H, DK)).astype(np.float32)
    k = rng.standard_normal((T, H, DK)).astype(np.float32)
    v = rng.standard_normal((T, H, DV)).astype(np.float32) * 0.5
    g = -np.abs(rng.standard_normal((T, H))).astype(np.float32) * 0.3
    beta = rng.uniform(0.1, 0.9, (T, H)).astype(np.float32)
    state = rng.standard_normal((S, H, DK, DV)).astype(np.float32) * 0.3
    slots = jnp.asarray([0, 3, 1, 5, 7, 7], jnp.int32)  # two scratch pads
    reset = jnp.asarray([False, True, False, False, False, False])

    ref_o, ref_s = gated_delta_rule_ragged(
        *map(jnp.asarray, (q, k, v, g, beta, state)), slots, reset)
    got_o, got_s = gated_delta_rule_decode(
        *map(jnp.asarray, (q, k, v, g, beta, state)), slots, reset)
    active = np.asarray(slots) != 7
    np.testing.assert_allclose(np.asarray(got_o)[active],
                               np.asarray(ref_o)[active],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s)[:7],
                               np.asarray(ref_s)[:7],
                               atol=1e-5, rtol=1e-5)

    # Conv window decode update.
    C, K = 12, 4
    x = rng.standard_normal((T, C)).astype(np.float32)
    w = rng.standard_normal((C, K)).astype(np.float32)
    cstate = rng.standard_normal((S, C, K - 1)).astype(np.float32)
    ref_y, ref_cs = causal_conv1d_ragged(
        jnp.asarray(x), jnp.asarray(cstate), jnp.asarray(w), slots, reset)
    got_y, got_cs = causal_conv1d_decode(
        jnp.asarray(x), jnp.asarray(cstate), jnp.asarray(w), slots, reset)
    np.testing.assert_allclose(np.asarray(got_y)[active],
                               np.asarray(ref_y)[active],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cs)[:7],
                               np.asarray(ref_cs)[:7],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("L,chunk", [(64, 64), (128, 32), (96, 16)])
def test_pallas_chunk_kernel_matches_scan(L, chunk):
    """Pallas chunk kernel (interpret mode on CPU) == the scan oracle."""
    from lvllm_tpu.ops.gdn import l2norm
    from lvllm_tpu.ops.pallas.gdn_chunk import gdn_chunked_pallas
    q, k, v, g, beta, s0 = _inputs(L, seed=5)
    ref_o, ref_s = _scan_reference(q, k, v, g, beta, s0)
    qf = l2norm(q.astype(jnp.float32)) * (DK ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    got_o, got_s = gdn_chunked_pallas(
        qf, kf, v.astype(jnp.float32), g.astype(jnp.float32),
        beta.astype(jnp.float32), s0.astype(jnp.float32),
        chunk_size=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-3, rtol=1e-3)
