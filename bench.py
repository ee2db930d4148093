"""Benchmark: steady-state decode throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference fork's published decode rate
(90 tok/s for Qwen3-Next-80B-A3B on 2×EPYC+RTX6000, BASELINE.md) — not
hardware-equivalent, but the recorded north-star number until real
checkpoints are benchable.

Model: dummy-weight Qwen3-MoE sized to fit one v5e chip (~1.3B params bf16),
A3B-style sparsity (8 routed experts, top-2).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    t_start = time.time()
    budget_s = float(os.environ.get("LVLLM_BENCH_BUDGET_S", "420"))
    # Sized so weight upload over the dev tunnel (~5 MB/s) stays tractable;
    # on a real TPU host the same bench runs in well under a minute.
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=32768, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=8, num_attention_heads=16, num_key_value_heads=4,
        head_dim=128, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=1024, max_position_embeddings=4096,
        max_model_len=2048, eos_token_id=-1)

    batch = 16
    prompt_len = 128
    decode_tokens = 48

    llm = LLM(model_config=mc, load_format="dummy", max_num_seqs=batch,
              max_num_batched_tokens=2048, block_size=16,
              num_kv_blocks=2048, multi_step_decode=16)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, mc.vocab_size, size=prompt_len).tolist()
               for _ in range(batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_tokens)

    # Warmup: compiles prefill + decode buckets.
    llm.generate([prompts[0]], SamplingParams(temperature=0.0, max_tokens=4))

    t0 = time.time()
    outs = llm.generate(prompts, sp)
    elapsed = time.time() - t0
    total_decoded = sum(len(o.outputs[0].token_ids) for o in outs)

    # Separate decode-rate estimate: time per engine step at full batch.
    eng = llm.engine
    for i, p in enumerate(prompts):
        eng.add_request(f"bench-{i}", p, sp)
    # Prefill everything first.
    while True:
        stats = eng.get_stats()
        if stats["num_waiting"] == 0:
            break
        eng.step()
    t1 = time.time()
    steps = 0
    seen = {}
    while eng.has_unfinished_requests() and steps < decode_tokens - 2:
        for o in eng.step():
            seen[o.request_id] = len(o.outputs[0].token_ids)
        steps += 1
    decode_elapsed = time.time() - t1
    decoded = sum(seen.values())
    decode_tps = decoded / decode_elapsed if decode_elapsed > 0 else 0.0

    eng.abort_request([f"bench-{i}" for i in range(batch)])

    # Pure device decode-step time: replay the compiled decode-bucket
    # executable directly (same shapes the engine uses), chaining donated
    # KV caches, blocking only at the end — isolates device+dispatch cost
    # from the per-step host sync the engine loop pays.
    import jax.numpy as jnp
    runner = eng.core.runner
    R = runner.max_num_reqs
    T = 16
    maxb = runner.max_blocks_per_req
    args = dict(
        input_ids=jnp.asarray(np.arange(T) % mc.vocab_size, jnp.int32),
        positions=jnp.full((T,), prompt_len, jnp.int32),
        qsl=jnp.asarray(np.arange(R + 1).clip(0, T), jnp.int32),
        seq_lens=jnp.full((R,), prompt_len + 1, jnp.int32),
        block_table=jnp.asarray(
            (np.arange(R * maxb).reshape(R, maxb) % 2000) + 1, jnp.int32),
        slot_mapping=jnp.asarray(np.arange(T) + 16, jnp.int32),
        logits_indices=jnp.asarray(
            np.arange(R).clip(0, T - 1)[:, None], jnp.int32),
        temperature=jnp.zeros((R,), jnp.float32),
        top_k=jnp.zeros((R,), jnp.int32),
        top_p=jnp.ones((R,), jnp.float32),
        min_p=jnp.zeros((R,), jnp.float32),
        seeds=jnp.zeros((R,), jnp.uint32),
        steps=jnp.zeros((R,), jnp.int32),
    )
    kv = runner.kv_caches
    kv, s0, _tk, _ = runner._step_fn(runner.params, kv, *args.values(),
                                     greedy_only=True)
    s0.block_until_ready()
    n_rep = 20
    t4 = time.time()
    outs_dev = []
    for _ in range(n_rep):
        kv, s0, _tk, _ = runner._step_fn(runner.params, kv, *args.values(),
                                         greedy_only=True)
        outs_dev.append(s0)
    s0.block_until_ready()
    device_step_ms = (time.time() - t4) / n_rep * 1000
    runner.kv_caches = kv

    # Pure device prefill-step time: replay the 2048-token prefill bucket
    # (16 requests x 128 tokens — the same executable the engine's batch
    # prefill used) with chained donated caches.
    Tp = batch * prompt_len
    qsl_p = np.arange(R + 1) * prompt_len
    tok_pos = np.tile(np.arange(prompt_len), batch)
    blocks_p = np.arange(R * maxb).reshape(R, maxb) % 2000 + 1
    slot_p = (blocks_p[np.repeat(np.arange(R), prompt_len),
                       tok_pos // 16] * 16 + tok_pos % 16)
    pargs = dict(args)
    pargs.update(
        input_ids=jnp.asarray(np.arange(Tp) % mc.vocab_size, jnp.int32),
        positions=jnp.asarray(tok_pos, jnp.int32),
        qsl=jnp.asarray(qsl_p, jnp.int32),
        seq_lens=jnp.full((R,), prompt_len, jnp.int32),
        block_table=jnp.asarray(blocks_p, jnp.int32),
        slot_mapping=jnp.asarray(slot_p, jnp.int32),
        logits_indices=jnp.asarray(
            (qsl_p[1:] - 1).clip(0, Tp - 1)[:, None], jnp.int32),
    )
    kv, s1, _tk, _ = runner._step_fn(runner.params, kv, *pargs.values(),
                                     greedy_only=True)
    s1.block_until_ready()
    t5 = time.time()
    n_prefill = 8
    for _ in range(n_prefill):
        kv, s1, _tk, _ = runner._step_fn(runner.params, kv,
                                         *pargs.values(), greedy_only=True)
    s1.block_until_ready()
    prefill_step_ms = (time.time() - t5) / n_prefill * 1000
    runner.kv_caches = kv

    # Quantized (int8 weight-only experts) decode throughput — skipped when
    # the time budget is nearly spent so the primary metric always prints.
    decode_tps_q = None
    run_extras = (time.time() - t_start) < budget_s * 0.6
    mc_q = ModelConfig(**{**mc.__dict__, "quantization": "int8"})
    if run_extras:
        llm_q = LLM(model_config=mc_q, load_format="dummy",
                    max_num_seqs=batch, max_num_batched_tokens=2048,
                    block_size=16, num_kv_blocks=2048, multi_step_decode=16)
        eng_q = llm_q.engine
        for i, p in enumerate(prompts):
            eng_q.add_request(f"bq-{i}", p, sp)
        while eng_q.get_stats()["num_waiting"] > 0:
            eng_q.step()
        for _ in range(3):   # warm the decode-bucket executable
            eng_q.step()
        t3 = time.time()
        steps_q = 0
        seen_q = {}
        while eng_q.has_unfinished_requests() and steps_q < decode_tokens - 2:
            for o in eng_q.step():
                seen_q[o.request_id] = len(o.outputs[0].token_ids)
            steps_q += 1
        q_elapsed = time.time() - t3
        decode_tps_q = sum(seen_q.values()) / q_elapsed if q_elapsed > 0 \
            else 0.0
        eng_q.abort_request([f"bq-{i}" for i in range(batch)])

    result = {
        "metric": "decode_throughput_dummy_moe_bs16",
        "value": round(decode_tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(decode_tps / 90.0, 2),
        "detail": {
            "e2e_tokens_per_s": round(total_decoded / elapsed, 1),
            "int8_decode_tokens_per_s": (round(decode_tps_q, 1)
                                         if decode_tps_q else None),
            "device_step_ms": round(device_step_ms, 2),
            "device_decode_tokens_per_s": round(
                batch / device_step_ms * 1000, 1),
            "device_prefill_tokens_per_s": round(
                batch * prompt_len / prefill_step_ms * 1000, 1),
            "backend": jax.default_backend(),
            "batch": batch,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
