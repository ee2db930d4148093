"""Deviceless EPLB algorithm tests (reference:
tests/distributed/test_eplb_algo.py)."""

import numpy as np

from lvllm_tpu.parallel.eplb import (EplbConfig, ExpertLoadTracker,
                                     balance_ratio, pack_to_ranks,
                                     rebalance_experts, replica_counts)


def test_replica_counts_favor_hot_experts():
    load = np.array([100.0, 10, 10, 10])
    counts = replica_counts(load, 8)
    assert counts.sum() == 8
    assert counts[0] == max(counts)
    assert (counts >= 1).all()


def test_uniform_load_uniform_replicas():
    load = np.ones(8)
    counts = replica_counts(load, 16)
    assert (counts == 2).all()


def test_rebalance_improves_balance():
    rng = np.random.default_rng(0)
    # Zipf-ish skewed load over 32 experts.
    load = 1.0 / (1 + np.arange(32)) ** 1.2
    rng.shuffle(load)
    cfg = EplbConfig(num_logical_experts=32, num_physical_experts=64,
                     num_ranks=8)
    mapping = rebalance_experts(load, cfg)
    assert mapping.shape == (64,)
    assert set(mapping.tolist()) == set(range(32))  # every expert placed
    ratio = balance_ratio(load, mapping, 8)
    # Naive layout: experts 0..31 in order, one replica each rank-grouped.
    naive = np.concatenate([np.arange(32), np.arange(32)])
    naive_ratio = balance_ratio(load, naive, 8)
    assert ratio > naive_ratio
    assert ratio > 0.8, ratio


def test_pack_respects_slot_count():
    load = np.array([5.0, 4, 3, 2])
    counts = replica_counts(load, 8)
    slots = pack_to_ranks(load, counts, 4)
    assert all(len(s) == 2 for s in slots)


def test_load_tracker_ema():
    t = ExpertLoadTracker(num_layers=2, num_logical=4, ema_alpha=0.5)
    t.update(0, np.array([4.0, 0, 0, 0]))
    t.update(0, np.array([0.0, 4, 0, 0]))
    assert t.load[0, 0] == 1.0   # 4*0.5*0.5
    assert t.load[0, 1] == 2.0
    cfg = EplbConfig(num_logical_experts=4, num_physical_experts=8,
                     num_ranks=2)
    m = t.layer_mapping(0, cfg)
    assert len(m) == 8
