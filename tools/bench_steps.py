"""Device decode/prefill step timing at the 8B-A3B bench geometry for a
given quantization mode — the honest gate for perf changes (same replay
as bench.py legs 2a/2b, without the offload/hybrid legs).

Usage: python tools/bench_steps.py [int4|w4a8|w8a8] [num_layers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lvllm_tpu

lvllm_tpu.enable_compile_cache()


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "int4"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    batch, prompt_len, horizon = 16, 128, 16
    mc = bench._model_config(quant, num_layers=layers)
    t0 = time.time()
    llm = LLM(model_config=mc, load_format="dummy_device",
              max_num_seqs=batch, max_num_batched_tokens=2048,
              block_size=16, num_kv_blocks=2048,
              multi_step_decode=horizon)
    eng = llm.engine
    runner = eng.core.runner
    param_bytes = sum(l.nbytes for l in jax.tree.leaves(runner.params))
    embed_bytes = runner.params["embed"]["weight"].nbytes
    print(f"model up: {param_bytes/1e9:.2f} GB, {time.time()-t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    for i in range(batch):
        eng.add_request(f"b{i}", rng.integers(
            0, mc.vocab_size, prompt_len).tolist(), sp)
    while eng.get_stats()["num_waiting"] > 0:
        eng.step()
    eng.step()
    print(f"warm: {time.time()-t0:.1f}s", flush=True)
    eng.abort_request([f"b{i}" for i in range(batch)])

    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    tokens = (rng.integers(1, mc.vocab_size, size=R)).astype(np.int32)
    positions = np.full(R, prompt_len, np.int32)
    seq_lens = np.full(R, prompt_len + 1, np.int32)
    block_table = ((np.arange(R * maxb).reshape(R, maxb) % 2000) + 1
                   ).astype(np.int32)
    zeros_f = np.zeros(R, np.float32)
    margs = (jnp.asarray(tokens), jnp.asarray(positions),
             jnp.asarray(seq_lens), jnp.asarray(block_table),
             jnp.asarray(zeros_f), jnp.asarray(np.zeros(R, np.int32)),
             jnp.asarray(np.ones(R, np.float32)), jnp.asarray(zeros_f),
             jnp.asarray(np.zeros(R, np.uint32)),
             jnp.asarray(np.zeros(R, np.int32)))
    kv = runner.kv_caches
    kv, packed = runner._multi_step_fn(runner.params, kv, *margs,
                                       horizon=horizon, greedy_only=True)
    packed.block_until_ready()
    n_rep = 4
    t4 = time.time()
    for _ in range(n_rep):
        kv, packed = runner._multi_step_fn(runner.params, kv, *margs,
                                           horizon=horizon,
                                           greedy_only=True)
    packed.block_until_ready()
    step_ms = (time.time() - t4) / (n_rep * horizon) * 1000
    kv_read = (batch * (prompt_len + 1) * mc.num_key_value_heads *
               mc.head_dim * 2 * 2 * mc.num_hidden_layers)
    bps = ((param_bytes - embed_bytes) + kv_read) / (step_ms / 1000)
    print(f"decode step: {step_ms:.3f} ms  "
          f"({batch / step_ms * 1000:.0f} tok/s, "
          f"{bps/1e9:.0f} GB/s)", flush=True)
    runner.kv_caches = kv

    Tp = batch * prompt_len
    qsl_p = np.arange(R + 1) * prompt_len
    tok_pos = np.tile(np.arange(prompt_len), batch)
    slot_p = (block_table[np.repeat(np.arange(R), prompt_len),
                          tok_pos // 16] * 16 + tok_pos % 16)
    pargs = dict(
        input_ids=jnp.asarray(np.arange(Tp) % mc.vocab_size, jnp.int32),
        positions=jnp.asarray(tok_pos, jnp.int32),
        qsl=jnp.asarray(qsl_p, jnp.int32),
        seq_lens=jnp.full((R,), prompt_len, jnp.int32),
        block_table=jnp.asarray(block_table, jnp.int32),
        slot_mapping=jnp.asarray(slot_p, jnp.int32),
        logits_indices=jnp.asarray(
            (qsl_p[1:] - 1).clip(0, Tp - 1)[:, None], jnp.int32),
        temperature=jnp.zeros((R,), jnp.float32),
        top_k=jnp.zeros((R,), jnp.int32),
        top_p=jnp.ones((R,), jnp.float32),
        min_p=jnp.zeros((R,), jnp.float32),
        seeds=jnp.zeros((R,), jnp.uint32),
        steps=jnp.zeros((R,), jnp.int32),
    )
    kv = runner.kv_caches
    kv, s1, _tk, _ = runner._step_fn(runner.params, kv, *pargs.values(),
                                     greedy_only=True)
    s1.block_until_ready()
    t5 = time.time()
    for _ in range(4):
        kv, s1, _tk, _ = runner._step_fn(runner.params, kv,
                                         *pargs.values(),
                                         greedy_only=True)
    s1.block_until_ready()
    prefill_ms = (time.time() - t5) / 4 * 1000
    print(f"prefill step: {prefill_ms:.2f} ms  "
          f"({Tp / prefill_ms * 1000:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
