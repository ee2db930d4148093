"""Prefill/decode disaggregation: KV handoff between engines.

Counterpart of the reference's KV-transfer connector family
(``distributed/kv_transfer/kv_connector/v1/`` — NIXL, LMCache, p2p,
offloading connectors) and its P/D-disaggregation flow: a *prefill* engine
computes the prompt KV and the first token; the KV blocks are shipped to a
*decode* engine which injects them into its own paged cache and continues
decoding without re-running the prompt.

TPU-native shape of the transfer: full KV blocks are read back from the
prefill engine's paged cache (addressed through the prefix-cache block
chain — so extraction works for any completed prompt while its blocks
remain cached) and scattered into blocks allocated on the decode engine.
Partial tail blocks are not transferred; the decode engine recomputes the
tail (the reference's kv_load_failure_policy="recompute" degradation path).
Cross-host, the same handoff serializes over DCN; in-process it is a
device→host→device copy.
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from lvllm_tpu.core.kv_cache_utils import hash_request_tokens
from lvllm_tpu.core.request import Request
from lvllm_tpu.logger import init_logger
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


@dataclass
class KVHandoff:
    """Serialized prefill result: prompt, first sampled token, and the
    prompt's full-block KV for every layer."""

    prompt_token_ids: List[int]
    first_token_id: int
    num_full_block_tokens: int
    # Per layer: [2, n_full_blocks, block_size, H, D] numpy.
    kv_blocks: List[np.ndarray]
    # EC transfer (reference: encoder-cache transfer): Whisper-style
    # cross-attention K/V computed by the prefill engine's encoder,
    # [L, 2, S, H, Dh] — the decode engine parks it in its pool instead
    # of re-running the audio encoder.
    cross_kv: "Optional[np.ndarray]" = None

    def nbytes(self) -> int:
        n = sum(a.nbytes for a in self.kv_blocks)
        if self.cross_kv is not None:
            n += self.cross_kv.nbytes
        return n


def prefill_and_extract(engine, prompt_token_ids: List[int],
                        sampling_params: Optional[SamplingParams] = None,
                        mm_data: Optional[dict] = None) -> KVHandoff:
    """Run the prompt on a prefill engine (1 generated token) and extract
    its KV blocks via the prefix-cache chain. Multimodal inputs are
    encoded HERE (the prefill side owns the encoder); for splice-style
    VLMs the image lives entirely in the transferred KV, while
    encoder-decoder models additionally hand off their cross-attention
    K/V (EC transfer)."""
    sp = SamplingParams(temperature=(sampling_params.temperature
                                     if sampling_params else 0.0),
                        seed=(sampling_params.seed
                              if sampling_params else None),
                        max_tokens=1)
    rid = engine.add_request(None, list(prompt_token_ids), sp,
                             mm_data=mm_data)
    runner = engine.core.runner
    is_enc_dec = getattr(runner, "is_enc_dec", False)
    cross_kv = None
    final = None
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished and out.request_id == rid:
                final = out
        if is_enc_dec and cross_kv is None and \
                rid in runner.input_batch.req_id_to_index:
            # Capture the encoder's cross-KV while the slot is live.
            slot = runner.input_batch.req_id_to_index[rid]
            cross_kv = np.asarray(runner._cross_pool[:, :, slot])
    assert final is not None
    first_token = final.outputs[0].token_ids[0]

    mgr = engine.core.scheduler.kv_cache_manager
    bs = mgr.block_size
    hashes = hash_request_tokens(bs, prompt_token_ids)
    blocks = []
    for h in hashes:
        blk = mgr.block_pool.get_cached_block(h)
        if blk is None:
            # Evicted before extraction — transfer what we have; the decode
            # side recomputes the rest (reference: recompute policy).
            logger.warning("KV block evicted before handoff; truncating at "
                           "%d blocks", len(blocks))
            break
        blocks.append(blk.block_id)
    kv_blocks = []
    if blocks:
        ids = np.asarray(blocks)
        for layer_cache in engine.core.runner.kv_caches:
            kv_blocks.append(np.asarray(layer_cache[:, ids]))
    return KVHandoff(
        prompt_token_ids=list(prompt_token_ids),
        first_token_id=first_token,
        num_full_block_tokens=len(blocks) * bs,
        kv_blocks=kv_blocks,
        cross_kv=cross_kv,
    )


def inject_prefix_kv(engine, prompt_token_ids: List[int], connector,
                     rid: str) -> int:
    """Materialize as many leading full blocks of ``prompt_token_ids`` as
    ``connector`` (possibly a MultiConnector stacking P/D + host tier)
    can supply, as *prefix-cache* entries: a temporary request allocates
    + hash-registers them, the device blocks are overwritten with the
    supplied pages, then the temp is freed — the blocks stay cached and
    the real request picks them up via the ordinary prefix-cache hit
    path (no scheduler special-casing). Returns tokens covered."""
    import jax.numpy as jnp

    mgr = engine.core.scheduler.kv_cache_manager
    bs = mgr.block_size
    hashes = hash_request_tokens(bs, prompt_token_ids)
    n_blocks = 0
    for i, h in enumerate(hashes):
        if not connector.can_supply(i, h):
            break
        n_blocks += 1
    if n_blocks == 0:
        return 0
    tmp = Request(f"{rid}-kvload", prompt_token_ids,
                  SamplingParams(max_tokens=1))
    got = mgr.allocate_slots(tmp, n_blocks * bs)
    if got is None:
        raise RuntimeError("decode engine out of KV blocks for handoff")
    block_ids = np.asarray(mgr.get_block_ids(tmp.request_id))
    runner = engine.core.runner
    L = len(runner.kv_caches)
    # Gather per-block pages from the connector(s), batch per layer.
    per_layer = [[] for _ in range(L)]
    for i in range(n_blocks):
        pages = connector.fetch(i, hashes[i])
        for li in range(L):
            per_layer[li].append(pages[li])
    for li in range(L):
        cache = runner.kv_caches[li]
        data = np.stack(per_layer[li], axis=1)        # [2, n, BS, H, D]
        runner.kv_caches[li] = cache.at[:, block_ids].set(
            jnp.asarray(data, cache.dtype))
    mgr.free(tmp)
    mgr.free_block_hashes(tmp)
    return n_blocks * bs


def inject_and_decode_request(engine, handoff: KVHandoff,
                              sampling_params: SamplingParams,
                              request_id: str = None) -> str:
    """Register a request on the decode engine with the transferred KV
    already in place; returns the request id. The first prefill-produced
    token becomes the tail of the 'prompt' so scheduling proceeds as a
    1-token continuation.

    The KV source is a MultiConnector stacking the handoff with the
    decode engine's own host tier (reference multi_connector.py:126 +
    offloading_connector.py:44): blocks the prefill engine evicted
    before extraction can still be served from host RAM."""
    from lvllm_tpu.distributed.connectors import (HandoffConnector,
                                                  MultiConnector,
                                                  host_tier_connector_for)

    sp = sampling_params.clone()
    if sp.max_tokens is not None:
        sp.max_tokens = max(sp.max_tokens - 1, 1)
    prompt = handoff.prompt_token_ids + [handoff.first_token_id]
    rid = request_id or f"disagg-{id(handoff) & 0xFFFF:x}"

    mgr = engine.core.scheduler.kv_cache_manager
    connector = MultiConnector([
        HandoffConnector(handoff, mgr.block_size),
        host_tier_connector_for(engine),
    ])
    inject_prefix_kv(engine, handoff.prompt_token_ids, connector, rid)

    mm = None
    if handoff.cross_kv is not None:
        # EC transfer: the decode runner parks the prefill-computed
        # cross-KV directly (no re-encode) via the transferred-KV fast
        # path in ModelRunner._encode_mm.
        mm = {"cross_kv": handoff.cross_kv}
    engine.add_request(rid, prompt, sp, mm_data=mm)
    return rid
