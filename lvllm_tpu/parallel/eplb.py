"""EPLB — expert parallelism load balancing.

Counterpart of the reference's EPLB subsystem (``distributed/eplb/
eplb_state.py:210`` load tracking, ``rearrange:657``, ``policy/`` packing
algorithms, ``rebalance_execute.py`` weight shuffling): MoE expert
popularity is tracked online; periodically the *physical* expert slots
(num_physical >= num_logical, hot experts replicated) are re-assigned to
ranks to even the per-rank load. The algorithm is deviceless (tested like
``tests/distributed/test_eplb_algo.py``); execution of a rearrangement is
a gather of expert weights by the new mapping.
"""

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np


@dataclass
class EplbConfig:
    num_logical_experts: int
    num_physical_experts: int    # >= logical; extras are replicas
    num_ranks: int
    ema_alpha: float = 0.9       # load EMA decay per rebalance window
    rebalance_interval_steps: int = 1024

    def __post_init__(self):
        assert self.num_physical_experts >= self.num_logical_experts
        assert self.num_physical_experts % self.num_ranks == 0


def replica_counts(load: np.ndarray, num_physical: int) -> np.ndarray:
    """Number of physical replicas per logical expert, proportional to load,
    ≥1 each (reference: policy/ 'replica assignment' stage)."""
    E = load.shape[0]
    extras = num_physical - E
    counts = np.ones(E, dtype=np.int64)
    if extras <= 0:
        return counts
    work = load.astype(np.float64) + 1e-9
    # Greedy: repeatedly replicate the expert with max load-per-replica.
    per = work / counts
    for _ in range(extras):
        i = int(np.argmax(per))
        counts[i] += 1
        per[i] = work[i] / counts[i]
    return counts


def pack_to_ranks(load: np.ndarray, counts: np.ndarray,
                  num_ranks: int) -> List[List[int]]:
    """LPT-pack physical experts onto ranks minimizing max rank load.
    Returns per-rank lists of logical expert ids (len = phys per rank)."""
    E = load.shape[0]
    phys: List[Tuple[float, int]] = []   # (share_load, logical_id)
    for e in range(E):
        share = load[e] / counts[e] if counts[e] else 0.0
        phys.extend([(float(share), e)] * int(counts[e]))
    phys.sort(reverse=True)
    per_rank = len(phys) // num_ranks
    rank_load = np.zeros(num_ranks)
    rank_slots: List[List[int]] = [[] for _ in range(num_ranks)]
    for share, e in phys:
        # Least-loaded rank with a free slot.
        order = np.argsort(rank_load)
        for r in order:
            if len(rank_slots[r]) < per_rank:
                rank_slots[int(r)].append(e)
                rank_load[int(r)] += share
                break
    return rank_slots


def rebalance_experts(load: np.ndarray, config: EplbConfig) -> np.ndarray:
    """Full rebalance: load [E_logical] → physical_to_logical [P].

    Physical slot p lives on rank p // (P/num_ranks) (reference keeps the
    same flat layout, eplb_state.py physical_to_logical_map).
    """
    counts = replica_counts(load, config.num_physical_experts)
    rank_slots = pack_to_ranks(load, counts, config.num_ranks)
    mapping = []
    for slots in rank_slots:
        mapping.extend(slots)
    return np.asarray(mapping, dtype=np.int64)


def balance_ratio(load: np.ndarray, mapping: np.ndarray,
                  num_ranks: int) -> float:
    """mean/max per-rank load under a mapping (1.0 = perfectly balanced)."""
    P = len(mapping)
    per_rank = P // num_ranks
    counts = np.bincount(mapping, minlength=load.shape[0])
    share = np.where(counts > 0, load / np.maximum(counts, 1), 0.0)
    rank_load = np.array([
        share[mapping[r * per_rank:(r + 1) * per_rank]].sum()
        for r in range(num_ranks)
    ])
    if rank_load.max() == 0:
        return 1.0
    return float(rank_load.mean() / rank_load.max())


class ExpertLoadTracker:
    """Online EMA of per-layer expert token counts (reference:
    eplb_state.py load window). Fed from routing stats; consumed by
    rebalance_experts."""

    def __init__(self, num_layers: int, num_logical: int,
                 ema_alpha: float = 0.9):
        self.ema_alpha = ema_alpha
        self.load = np.zeros((num_layers, num_logical), dtype=np.float64)
        self.steps = 0

    def update(self, layer_idx: int, expert_counts: np.ndarray) -> None:
        a = self.ema_alpha
        self.load[layer_idx] = a * self.load[layer_idx] + \
            (1 - a) * expert_counts
        self.steps += 1

    def layer_mapping(self, layer_idx: int, config: EplbConfig) -> np.ndarray:
        return rebalance_experts(self.load[layer_idx], config)
