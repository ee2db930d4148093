"""Capture an xplane trace of the decode + prefill steps and print the HLO
op-time breakdown (uses tensorboard_plugin_profile's converter offline)."""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from probe_step_ablate import build  # noqa: E402

LOGDIR = "/tmp/lvllm_xprof"


def replay(runner, mc, T, prompt_len, reps):
    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    nb = runner.num_kv_blocks
    if T == R:  # decode shapes
        qsl = np.arange(R + 1).clip(0, T)
        positions = np.full((T,), prompt_len)
        seq_lens = np.full((R,), prompt_len + 1)
        slot = np.arange(T) + 16
        li = np.arange(R).clip(0, T - 1)[:, None]
    else:       # batch prefill shapes
        per = T // R
        qsl = np.arange(R + 1) * per
        positions = np.tile(np.arange(per), R)
        seq_lens = np.full((R,), per)
        bt = np.arange(R * maxb).reshape(R, maxb) % (nb - 2) + 1
        tok_pos = positions
        slot = bt[np.repeat(np.arange(R), per),
                  tok_pos // 16] * 16 + tok_pos % 16
        li = (qsl[1:] - 1).clip(0, T - 1)[:, None]
    bt = np.arange(R * maxb).reshape(R, maxb) % (nb - 2) + 1
    args = (
        jnp.asarray(np.arange(T) % mc.vocab_size, jnp.int32),
        jnp.asarray(positions, jnp.int32),
        jnp.asarray(qsl, jnp.int32),
        jnp.asarray(seq_lens, jnp.int32),
        jnp.asarray(bt, jnp.int32),
        jnp.asarray(slot, jnp.int32),
        jnp.asarray(li, jnp.int32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.int32),
        jnp.ones((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.uint32),
        jnp.zeros((R,), jnp.int32),
    )
    kv = runner.kv_caches
    kv, s0, _t, _h = runner._step_fn(runner.params, kv, *args,
                                     greedy_only=True)
    s0.block_until_ready()
    for _ in range(reps):
        kv, s0, _t, _h = runner._step_fn(runner.params, kv, *args,
                                         greedy_only=True)
    s0.block_until_ready()
    runner.kv_caches = kv


def main():
    runner, mc = build(nb=2048)
    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        replay(runner, mc, T=16, prompt_len=128, reps=5)      # decode
        replay(runner, mc, T=2048, prompt_len=128, reps=3)    # prefill
    xs = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs)
    if not xs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xs, "framework_op_stats^", {"tqx": "out:csv;"})
    out = "/tmp/opstats.csv"
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print("wrote", out)


if __name__ == "__main__":
    main()
