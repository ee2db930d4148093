"""Benchmark: steady-state decode throughput on one chip, quantized,
at realistic (8B-class) geometry, plus expert-offload streaming.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline compares against the reference fork's published decode rate
(90 tok/s for Qwen3-Next-80B-A3B on 2×EPYC+RTX6000, BASELINE.md).

Model: dummy-weight Qwen3-MoE, A3B-style sparsity — 8.1B params
(64 experts, top-8, hidden 2048, 24 layers), experts quantized to INT4
so the whole model fits one v5e chip (~5.7 GB weights). Weights are
generated ON the device (load_format="dummy_device") — no multi-GB
host→HBM upload, so the quantized leg always records even over the slow
dev tunnel (round-1 failure mode: int8 leg self-skipped on time budget).

Legs:
  1. engine-loop decode tok/s (multi-step scan, horizon 16)  ← primary
  2. device-step decode + prefill replays (isolates RPC overhead)
  3. roofline: achieved HBM read bandwidth fraction per decode step
  4. expert-offload streaming decode (4 of 24 MoE layers in host RAM,
     prefetch-window overlap) + achieved host→HBM stream bandwidth
"""

import json
import os
import sys
import time

import numpy as np

# v5e peak HBM bandwidth; other chips mapped by device_kind.
_PEAK_HBM_GBPS = {
    "v5 lite": 819.0, "v5e": 819.0, "v5litepod": 819.0,
    "v6 lite": 1638.0, "v6e": 1638.0,
    "v4": 1228.0, "v5p": 2765.0,
}


def _peak_hbm_bps(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, gbps in _PEAK_HBM_GBPS.items():
        if key in kind:
            return gbps * 1e9
    return 819.0 * 1e9


def _model_config(quantization="int4", num_layers=24):
    from lvllm_tpu.config import ModelConfig
    if os.environ.get("LVLLM_BENCH_SMALL"):  # CPU smoke-test geometry
        return ModelConfig(
            model="dummy", architecture="Qwen3MoeForCausalLM",
            dtype="bfloat16", vocab_size=2048, hidden_size=256,
            intermediate_size=512, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=128,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=256,
            max_position_embeddings=8192, max_model_len=2048,
            eos_token_id=-1, quantization=quantization)
    return ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=151936, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=num_layers, num_attention_heads=16,
        num_key_value_heads=4, head_dim=128, num_experts=64,
        num_experts_per_tok=8, moe_intermediate_size=768,
        max_position_embeddings=8192, max_model_len=2048,
        eos_token_id=-1, quantization=quantization)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    t_start = time.time()
    budget_s = float(os.environ.get("LVLLM_BENCH_BUDGET_S", "900"))

    def remaining() -> float:
        return budget_s - (time.time() - t_start)

    batch = 16
    prompt_len = 128
    decode_tokens = 48
    horizon = 16

    mc = _model_config("int4")
    llm = LLM(model_config=mc, load_format="dummy_device",
              max_num_seqs=batch, max_num_batched_tokens=2048, block_size=16,
              num_kv_blocks=2048, multi_step_decode=horizon)
    eng = llm.engine
    runner = eng.core.runner
    param_bytes = sum(l.nbytes for l in jax.tree.leaves(runner.params))
    embed_bytes = runner.params["embed"]["weight"].nbytes
    print(f"[bench] model up: {param_bytes / 1e9:.2f} GB params, "
          f"{time.time() - t_start:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, mc.vocab_size, size=prompt_len).tolist()
               for _ in range(batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_tokens)

    # ---- leg 1: engine-loop decode throughput (primary) -------------------
    for i, p in enumerate(prompts):
        eng.add_request(f"bench-{i}", p, sp)
    while eng.get_stats()["num_waiting"] > 0:   # prefill (compiles bucket)
        eng.step()
    eng.step()                                   # compiles multi-step scan
    print(f"[bench] warm: {time.time() - t_start:.1f}s", file=sys.stderr)
    t0 = time.time()
    steps = 0
    seen = {}
    while eng.has_unfinished_requests() and steps < 2:
        for o in eng.step():
            seen[o.request_id] = len(o.outputs[0].token_ids)
        steps += 1
    decode_elapsed = time.time() - t0
    decoded = batch * horizon * steps
    decode_tps = decoded / decode_elapsed if decode_elapsed > 0 else 0.0
    eng.abort_request([f"bench-{i}" for i in range(batch)])

    # ---- leg 2a: device multi-step decode replay ---------------------------
    # Replays the already-compiled horizon-16 scan with chained donated KV;
    # one host fetch per 16 steps isolates device time from tunnel RTTs.
    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    tokens = np.ones(R, np.int32)
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
                                           horizon=horizon, greedy_only=True)
    packed.block_until_ready()
    device_step_ms = (time.time() - t4) / (n_rep * horizon) * 1000
    runner.kv_caches = kv

    # Roofline: HBM bytes read per decode step = all weights except the
    # embedding table (gathered rows only) + the KV prefix for each row.
    kv_read = (batch * (prompt_len + 1) * mc.num_key_value_heads *
               mc.head_dim * 2 * 2 * mc.num_hidden_layers)
    bytes_per_step = (param_bytes - embed_bytes) + kv_read
    achieved_bps = bytes_per_step / (device_step_ms / 1000)
    peak_bps = _peak_hbm_bps(jax.devices()[0])
    hbm_util = achieved_bps / peak_bps

    # ---- leg 2b: device prefill replay (2048-token bucket) ----------------
    Tp = batch * prompt_len
    qsl_p = np.arange(R + 1) * prompt_len
    tok_pos = np.tile(np.arange(prompt_len), batch)
    blocks_p = block_table
    slot_p = (blocks_p[np.repeat(np.arange(R), prompt_len),
                       tok_pos // 16] * 16 + tok_pos % 16)
    pargs = dict(
        input_ids=jnp.asarray(np.arange(Tp) % mc.vocab_size, jnp.int32),
        positions=jnp.asarray(tok_pos, jnp.int32),
        qsl=jnp.asarray(qsl_p, jnp.int32),
        seq_lens=jnp.full((R,), prompt_len, jnp.int32),
        block_table=jnp.asarray(blocks_p, jnp.int32),
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
    n_prefill = 4
    for _ in range(n_prefill):
        kv, s1, _tk, _ = runner._step_fn(runner.params, kv, *pargs.values(),
                                         greedy_only=True)
    s1.block_until_ready()
    prefill_step_ms = (time.time() - t5) / n_prefill * 1000
    runner.kv_caches = kv
    print(f"[bench] device legs done: {time.time() - t_start:.1f}s",
          file=sys.stderr)

    # ---- leg 3: expert-offload streaming decode ----------------------------
    # 4 of 24 MoE layers' experts live in host RAM and stream to HBM one
    # layer ahead of compute (the LVLLM north-star tier). On the dev
    # tunnel host→HBM is ~30 MB/s so absolute tok/s is tunnel-bound; the
    # stream bandwidth + prefetch hit rate fields qualify the number.
    offload = None
    if remaining() > 240:
        try:
            from lvllm_tpu.config import OffloadConfig
            # Half-depth model: the point is measuring the streaming tier,
            # not re-paying the full dummy-device init (r02: the 24-layer
            # reload ate the leg's decode budget — 0 steps recorded).
            mc_o = _model_config("int4", num_layers=12)
            n_stream = 4 if mc_o.num_hidden_layers > 8 else 2
            oc = OffloadConfig(
                enabled=True,
                hbm_resident_moe_layers=(
                    f"0-{mc_o.num_hidden_layers - n_stream - 1}"),
                prefetch_window=1, num_hbm_buffers=2)
            llm_o = LLM(model_config=mc_o,
                        load_format="dummy_device", max_num_seqs=4,
                        max_num_batched_tokens=256, block_size=16,
                        num_kv_blocks=256, offload_config=oc)
            eng_o = llm_o.engine
            for i in range(4):
                eng_o.add_request(f"off-{i}", prompts[i][:16],
                                  SamplingParams(temperature=0.0,
                                                 max_tokens=8))
            while eng_o.get_stats()["num_waiting"] > 0:
                eng_o.step()
            eng_o.step()   # warm decode-shape stages
            store = eng_o.core.runner.expert_store
            b0 = store.stats["bytes_streamed"]
            t6 = time.time()
            osteps = 0
            # No budget guard here: the load is already paid, and a few
            # decode steps are the entire point of the leg.
            while eng_o.has_unfinished_requests() and osteps < 3:
                eng_o.step()
                osteps += 1
            o_elapsed = time.time() - t6
            streamed = store.stats["bytes_streamed"] - b0
            offload = {
                "offload_decode_tokens_per_s": round(
                    4 * osteps / o_elapsed, 2) if o_elapsed else None,
                "offload_streamed_layers": n_stream,
                "offload_stream_gbps": round(
                    streamed / o_elapsed / 1e9, 3) if o_elapsed else None,
                "offload_prefetch_hits": store.stats["prefetch_hits"],
                "offload_prefetch_misses": store.stats["prefetch_misses"],
            }
            eng_o.abort_request([f"off-{i}" for i in range(4)])
        except Exception as e:  # noqa: BLE001
            offload = {"offload_error": repr(e)[:200]}

    result = {
        "metric": "int4_decode_tokens_per_s_8b_a3b",
        "value": round(decode_tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(decode_tps / 90.0, 2),
        "detail": {
            "model": (f"Qwen3-MoE {mc.num_experts}e top-"
                      f"{mc.num_experts_per_tok}, {mc.num_hidden_layers}L, "
                      f"h{mc.hidden_size}, int4 experts"),
            "param_gb": round(param_bytes / 1e9, 2),
            "device_step_ms": round(device_step_ms, 3),
            "device_decode_tokens_per_s": round(
                batch / device_step_ms * 1000, 1),
            "device_prefill_tokens_per_s": round(
                batch * prompt_len / prefill_step_ms * 1000, 1),
            "hbm_read_bytes_per_decode_step": int(bytes_per_step),
            "hbm_bw_achieved_gbps": round(achieved_bps / 1e9, 1),
            "hbm_bw_util": round(hbm_util, 3),
            "offload": offload,
            "backend": jax.default_backend(),
            "batch": batch,
            "multi_step_horizon": horizon,
            "elapsed_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
