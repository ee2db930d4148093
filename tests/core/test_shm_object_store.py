"""Shared-memory object store tests (reference:
device_communicators/shm_object_storage.py SingleWriterShmObjectStorage)."""

import multiprocessing as mp

import numpy as np

from lvllm_tpu.distributed.shm_object_store import (ShmObjectStore,
                                                    pack_mm_data,
                                                    unpack_mm_data)


def test_put_get_roundtrip_zero_copy():
    store = ShmObjectStore()
    try:
        a = np.random.default_rng(0).standard_normal((64, 128)).astype(
            np.float32)
        h = store.put(a)
        assert h.nbytes == a.nbytes
        b = ShmObjectStore.get(h, copy=True)
        np.testing.assert_array_equal(a, b)
        ShmObjectStore.release(h)
    finally:
        store.close()


def _child(handle_bytes, q):
    import pickle
    h = pickle.loads(handle_bytes)
    arr = ShmObjectStore.get(h, copy=True)
    ShmObjectStore.release(h)
    q.put(float(arr.sum()))


def test_cross_process_transfer():
    import pickle
    store = ShmObjectStore()
    try:
        a = np.ones((1000, 100), np.float32) * 2.0
        h = store.put(a)
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        p = ctx.Process(target=_child, args=(pickle.dumps(h), q))
        p.start()
        got = q.get(timeout=30)
        p.join(timeout=10)
        assert got == float(a.sum())
    finally:
        store.close()


def test_pack_unpack_mm_data():
    store = ShmObjectStore()
    try:
        big = np.zeros((1024, 512), np.float32)
        mm = {"pixel_values": big, "image_grid_thw": np.array([[1, 2, 2]])}
        packed = pack_mm_data(store, mm)
        from lvllm_tpu.distributed.shm_object_store import ShmHandle
        assert isinstance(packed["pixel_values"], ShmHandle)
        assert isinstance(packed["image_grid_thw"], np.ndarray)  # small
        out = unpack_mm_data(packed)
        np.testing.assert_array_equal(out["pixel_values"], big)
    finally:
        store.close()


def test_engine_core_proc_mm_over_shm(tmp_path):
    """MM request through the ZMQ core proc with pixel tensors riding
    shared memory (the reference's mm-input transfer path)."""
    import pytest
    torch = pytest.importorskip("torch")
    import transformers

    from lvllm_tpu.config import (CacheConfig, EngineConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.core_proc import EngineCoreClient
    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.sampling_params import SamplingParams

    IMG = 63
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    cfg = transformers.LlavaConfig(vision_config=vc, text_config=tc,
                                   image_token_index=IMG)
    torch.manual_seed(0)
    transformers.LlavaForConditionalGeneration(cfg).save_pretrained(
        str(tmp_path), safe_serialization=True)

    mc = load_model_config(str(tmp_path), max_model_len=96, dtype="float32")
    ecfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2, max_model_len=96))
    client = EngineCoreClient(ecfg, load_format="safetensors",
                              force_cpu=True)
    try:
        pixels = np.random.default_rng(0).standard_normal(
            (1, 3, 28, 28)).astype(np.float32)
        ids = [1, IMG, IMG, IMG, IMG, 5, 9]
        client.add_request("m0", ids,
                           SamplingParams(temperature=0.0, max_tokens=4),
                           mm_data={"pixel_values": pixels})
        outs = client.collect_finished(1, timeout_s=180)
        assert len(outs[0].outputs[0].token_ids) == 4
        # Same image again → identical tokens (content actually arrived).
        client.add_request("m1", ids,
                           SamplingParams(temperature=0.0, max_tokens=4),
                           mm_data={"pixel_values": pixels.copy()})
        outs2 = client.collect_finished(1, timeout_s=180)
        assert outs2[0].outputs[0].token_ids == outs[0].outputs[0].token_ids
    finally:
        client.shutdown()
