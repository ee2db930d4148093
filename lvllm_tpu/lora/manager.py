"""LoRA adapter manager: registration, slot allocation, stacked weights.

Counterpart of the reference's ``vllm/lora/model_manager.py``
(LoRAModelManager — adapter add/remove, slot assignment, capacity) and
``worker_manager.py``. Adapters target the attention/MLP projections of the
unified model; weights are kept as stacked [max_loras+1, ...] arrays whose
slot 0 is the zero (null) adapter.
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger
from lvllm_tpu.lora.layers import LoRAWeights

logger = init_logger(__name__)

# Target module name → (input_dim_attr, output_dim fn)
DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


@dataclass
class LoRARequest:
    """Reference: vllm/lora/request.py LoRARequest."""

    lora_name: str
    lora_int_id: int                   # caller-facing id (>0)
    # {target: (A [r, in], B [out, r])} numpy, HF PEFT layout.
    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = None
    alpha: float = 16.0
    rank: int = 8


class LoRAManager:

    def __init__(self, model_config: ModelConfig, max_loras: int = 8,
                 max_rank: int = 16,
                 targets: Sequence[str] = DEFAULT_TARGETS):
        self.mc = model_config
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.targets = tuple(targets)
        self._dims = self._target_dims(model_config)
        dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        # Stacked weights; slot 0 = null adapter.
        self.stacks: Dict[str, LoRAWeights] = {}
        for t in self.targets:
            din, dout = self._dims[t]
            self.stacks[t] = LoRAWeights(
                a=jnp.zeros((max_loras + 1, din, max_rank), dtype),
                b=jnp.zeros((max_loras + 1, max_rank, dout), dtype),
                scale=jnp.zeros((max_loras + 1,), jnp.float32),
            )
        # lora_int_id -> slot (1-based).
        self.id_to_slot: Dict[int, int] = {}
        self.slot_to_id: List[Optional[int]] = [None] * (max_loras + 1)

    def _target_dims(self, mc: ModelConfig) -> Dict[str, Tuple[int, int]]:
        D = mc.head_dim
        return {
            "q_proj": (mc.hidden_size, mc.num_attention_heads * D),
            "k_proj": (mc.hidden_size, mc.num_key_value_heads * D),
            "v_proj": (mc.hidden_size, mc.num_key_value_heads * D),
            "o_proj": (mc.num_attention_heads * D, mc.hidden_size),
            "gate_up": (mc.hidden_size, 2 * mc.intermediate_size),
            "down": (mc.intermediate_size, mc.hidden_size),
        }

    # ---- add / remove ------------------------------------------------------

    def add_lora(self, req: LoRARequest) -> int:
        """Register an adapter; returns its slot. Idempotent per id."""
        if req.lora_int_id in self.id_to_slot:
            return self.id_to_slot[req.lora_int_id]
        slot = next((i for i in range(1, self.max_loras + 1)
                     if self.slot_to_id[i] is None), None)
        if slot is None:
            raise RuntimeError(f"LoRA capacity ({self.max_loras}) exhausted")
        assert req.rank <= self.max_rank, (req.rank, self.max_rank)
        for t, (A, B) in (req.weights or {}).items():
            if t not in self.stacks:
                logger.warning("LoRA target %s not supported; skipping", t)
                continue
            lw = self.stacks[t]
            r = A.shape[0]
            a_pad = np.zeros(lw.a.shape[1:], dtype=np.float32)
            a_pad[:, :r] = A.T                       # [in, r]
            b_pad = np.zeros(lw.b.shape[1:], dtype=np.float32)
            b_pad[:r, :] = B.T                       # [r, out]
            self.stacks[t] = LoRAWeights(
                a=lw.a.at[slot].set(jnp.asarray(a_pad, lw.a.dtype)),
                b=lw.b.at[slot].set(jnp.asarray(b_pad, lw.b.dtype)),
                scale=lw.scale.at[slot].set(req.alpha / max(req.rank, 1)),
            )
        self.id_to_slot[req.lora_int_id] = slot
        self.slot_to_id[slot] = req.lora_int_id
        logger.info("LoRA %s (id %d) loaded into slot %d", req.lora_name,
                    req.lora_int_id, slot)
        return slot

    def remove_lora(self, lora_int_id: int) -> bool:
        slot = self.id_to_slot.pop(lora_int_id, None)
        if slot is None:
            return False
        self.slot_to_id[slot] = None
        for t, lw in self.stacks.items():
            self.stacks[t] = LoRAWeights(
                a=lw.a.at[slot].set(0.0), b=lw.b.at[slot].set(0.0),
                scale=lw.scale.at[slot].set(0.0))
        return True

    def slot_for(self, lora_int_id: Optional[int]) -> int:
        if not lora_int_id:
            return 0
        return self.id_to_slot.get(lora_int_id, 0)

    def list_loras(self) -> Dict[int, str]:
        return {i: str(i) for i in self.id_to_slot}
