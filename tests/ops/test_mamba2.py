"""Mamba2 SSD op: ragged scan vs chunked form vs a plain numpy loop."""

import numpy as np
import jax.numpy as jnp

from lvllm_tpu.ops.mamba2 import mamba2_chunked, mamba2_scan_ragged


def numpy_oracle(x, B, C, dt, A, D, h0):
    L, NH, HD = x.shape
    N = B.shape[-1]
    h = h0.copy()
    ys = np.zeros((L, NH, HD), np.float32)
    for t in range(L):
        for hh in range(NH):
            h[hh] = h[hh] * np.exp(dt[t, hh] * A[hh]) + \
                dt[t, hh] * np.outer(x[t, hh], B[t, hh])
            ys[t, hh] = h[hh] @ C[t, hh] + D[hh] * x[t, hh]
    return ys, h


def make_case(rng, L, NH=3, HD=8, N=16):
    x = rng.standard_normal((L, NH, HD)).astype(np.float32)
    B = rng.standard_normal((L, NH, N)).astype(np.float32)
    C = rng.standard_normal((L, NH, N)).astype(np.float32)
    dt = rng.uniform(0.01, 1.2, (L, NH)).astype(np.float32)
    A = -rng.uniform(0.3, 4.0, NH).astype(np.float32)
    D = rng.standard_normal(NH).astype(np.float32)
    h0 = rng.standard_normal((NH, HD, N)).astype(np.float32)
    return x, B, C, dt, A, D, h0


def test_scan_matches_oracle():
    rng = np.random.default_rng(0)
    x, B, C, dt, A, D, h0 = make_case(rng, L=17)
    NH, HD, N = h0.shape
    want_y, want_h = numpy_oracle(x, B, C, dt, A, D, h0)
    state = np.zeros((2, NH, HD, N), np.float32)
    state[0] = h0
    slot = np.zeros(17, np.int32)
    reset = np.zeros(17, bool)
    got_y, got_state = mamba2_scan_ragged(
        jnp.asarray(x), jnp.asarray(B), jnp.asarray(C), jnp.asarray(dt),
        jnp.asarray(A), jnp.asarray(D), jnp.asarray(state),
        jnp.asarray(slot), jnp.asarray(reset))
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_state[0]), want_h, rtol=2e-4,
                               atol=2e-4)


def test_scan_ragged_resets_and_slots():
    rng = np.random.default_rng(1)
    # Two interleaved requests, second starts mid-stream (reset).
    L = 12
    x, B, C, dt, A, D, _ = make_case(rng, L)
    NH, HD, N = 3, 8, 16
    state = np.zeros((3, NH, HD, N), np.float32)
    slot = np.asarray([0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1], np.int32)
    reset = np.zeros(L, bool)
    reset[0] = reset[6] = True
    got_y, _ = mamba2_scan_ragged(
        jnp.asarray(x), jnp.asarray(B), jnp.asarray(C), jnp.asarray(dt),
        jnp.asarray(A), jnp.asarray(D), jnp.asarray(state),
        jnp.asarray(slot), jnp.asarray(reset))
    # Each request independently should match the oracle from zero state.
    for lo, hi in ((0, 6), (6, 12)):
        want, _ = numpy_oracle(x[lo:hi], B[lo:hi], C[lo:hi], dt[lo:hi],
                               A, D, np.zeros((NH, HD, N), np.float32))
        np.testing.assert_allclose(np.asarray(got_y[lo:hi]), want,
                                   rtol=2e-4, atol=2e-4)


def test_chunked_matches_scan():
    rng = np.random.default_rng(2)
    L = 150  # several chunks + ragged tail
    x, B, C, dt, A, D, h0 = make_case(rng, L)
    want_y, want_h = numpy_oracle(x, B, C, dt, A, D, h0)
    got_y, got_h = mamba2_chunked(
        jnp.asarray(x), jnp.asarray(B), jnp.asarray(C), jnp.asarray(dt),
        jnp.asarray(A), jnp.asarray(D), jnp.asarray(h0), chunk_size=64)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=3e-4,
                               atol=3e-4)


def test_mamba_decode_matches_scan():
    """mamba2_decode / mamba1_decode == their scans for one-token-per-
    request batches."""
    import jax.numpy as jnp

    from lvllm_tpu.ops.mamba1 import mamba1_decode, mamba1_scan_ragged
    from lvllm_tpu.ops.mamba2 import mamba2_decode, mamba2_scan_ragged
    rng = np.random.default_rng(11)
    T, S = 5, 6
    NH, HD, N = 3, 8, 4
    x = rng.standard_normal((T, NH, HD)).astype(np.float32)
    B = rng.standard_normal((T, NH, N)).astype(np.float32)
    C = rng.standard_normal((T, NH, N)).astype(np.float32)
    dt = rng.uniform(0.01, 0.5, (T, NH)).astype(np.float32)
    A = -rng.uniform(0.5, 2.0, NH).astype(np.float32)
    D = rng.standard_normal(NH).astype(np.float32)
    st = rng.standard_normal((S, NH, HD, N)).astype(np.float32) * 0.3
    slots = jnp.asarray([0, 2, 4, 5, 5], jnp.int32)
    reset = jnp.asarray([True, False, False, False, False])
    args = tuple(map(jnp.asarray, (x, B, C, dt, A, D, st)))
    ref_y, ref_s = mamba2_scan_ragged(*args, slots, reset)
    got_y, got_s = mamba2_decode(*args, slots, reset)
    active = np.asarray(slots) != 5
    np.testing.assert_allclose(np.asarray(got_y)[active],
                               np.asarray(ref_y)[active], atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s)[:5],
                               np.asarray(ref_s)[:5], atol=1e-5, rtol=1e-5)

    Dm, Nm = 8, 4
    x1 = rng.standard_normal((T, Dm)).astype(np.float32)
    B1 = rng.standard_normal((T, Nm)).astype(np.float32)
    C1 = rng.standard_normal((T, Nm)).astype(np.float32)
    dt1 = rng.uniform(0.01, 0.5, (T, Dm)).astype(np.float32)
    A1 = -rng.uniform(0.5, 2.0, (Dm, Nm)).astype(np.float32)
    Ds = rng.standard_normal(Dm).astype(np.float32)
    st1 = rng.standard_normal((S, Dm, Nm)).astype(np.float32) * 0.3
    args1 = tuple(map(jnp.asarray, (x1, B1, C1, dt1, A1, Ds, st1)))
    ref_y1, ref_s1 = mamba1_scan_ragged(*args1, slots, reset)
    got_y1, got_s1 = mamba1_decode(*args1, slots, reset)
    np.testing.assert_allclose(np.asarray(got_y1)[active],
                               np.asarray(ref_y1)[active], atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s1)[:5],
                               np.asarray(ref_s1)[:5], atol=1e-5,
                               rtol=1e-5)
