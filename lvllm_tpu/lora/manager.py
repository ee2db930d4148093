"""LoRA adapter manager: registration, slot allocation, stacked weights.

Counterpart of the reference's ``vllm/lora/model_manager.py``
(LoRAModelManager — adapter add/remove, slot assignment, capacity),
``worker_manager.py`` and the per-layer wrappers (``vllm/lora/layers/``).

Adapters are PER LAYER (PEFT checkpoints carry distinct A/B per layer)
and cover the attention projections, the MLP (fused gate_up + down), the
input embedding and the LM head. Weights live as stacked
[max_loras+1, ...] arrays whose slot 0 is the zero (null) adapter;
stack keys are ``"{layer}.{target}"`` plus the global ``embed_tokens`` /
``lm_head``. ``load_from_path`` reads a HF PEFT adapter directory
(adapter_config.json + adapter_model.safetensors), fusing separate
gate_proj/up_proj adapters into the model's fused gate_up layout as a
rank-2r block adapter.
"""

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger
from lvllm_tpu.lora.layers import LoRAWeights

logger = init_logger(__name__)

PER_LAYER_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_up",
                     "down")
GLOBAL_TARGETS = ("embed_tokens", "lm_head")
DEFAULT_TARGETS = PER_LAYER_TARGETS + GLOBAL_TARGETS

# PEFT module-path → our target name.
_PEFT_NAME = re.compile(
    r"(?:base_model\.model\.)?(?:model\.)?"
    r"(?:layers\.(?P<layer>\d+)\.)?"
    r"(?:self_attn\.|mlp\.)?(?P<target>[a-z_]+)\."
    r"lora_(?:embedding_)?(?P<ab>[AB])(?:\.weight)?$")
_PEFT_TARGET = {"q_proj": "q_proj", "k_proj": "k_proj",
                "v_proj": "v_proj", "o_proj": "o_proj",
                "down_proj": "down", "gate_proj": "gate_proj",
                "up_proj": "up_proj", "embed_tokens": "embed_tokens",
                "lm_head": "lm_head"}


@dataclass
class LoRARequest:
    """Reference: vllm/lora/request.py LoRARequest."""

    lora_name: str
    lora_int_id: int                   # caller-facing id (>0)
    # {key: (A [r, in], B [out, r])} numpy, HF PEFT layout. Keys are
    # either a plain target ("q_proj" — broadcast to every layer) or
    # layer-scoped ("3.q_proj"), plus "embed_tokens"/"lm_head".
    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = None
    alpha: float = 16.0
    rank: int = 8
    # Load lazily from a PEFT checkpoint dir instead of inline weights.
    lora_path: Optional[str] = None


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
        # Stacked weights; slot 0 = null adapter. One stack per
        # (layer, target) plus the global embedding/head stacks.
        self.stacks: Dict[str, LoRAWeights] = {}
        for key in self._stack_keys():
            din, dout = self._dims[key.split(".")[-1]]
            self.stacks[key] = LoRAWeights(
                a=jnp.zeros((max_loras + 1, din, max_rank), dtype),
                b=jnp.zeros((max_loras + 1, max_rank, dout), dtype),
                scale=jnp.zeros((max_loras + 1,), jnp.float32),
            )
        # lora_int_id -> slot (1-based).
        self.id_to_slot: Dict[int, int] = {}
        self.slot_to_id: List[Optional[int]] = [None] * (max_loras + 1)
        self._names: Dict[int, str] = {}

    def _stack_keys(self) -> List[str]:
        keys = []
        for i in range(self.mc.num_hidden_layers):
            for t in self.targets:
                if t in PER_LAYER_TARGETS:
                    keys.append(f"{i}.{t}")
        keys += [t for t in self.targets if t in GLOBAL_TARGETS]
        return keys

    def _target_dims(self, mc: ModelConfig) -> Dict[str, Tuple[int, int]]:
        D = mc.head_dim
        return {
            "q_proj": (mc.hidden_size, mc.num_attention_heads * D),
            "k_proj": (mc.hidden_size, mc.num_key_value_heads * D),
            "v_proj": (mc.hidden_size, mc.num_key_value_heads * D),
            "o_proj": (mc.num_attention_heads * D, mc.hidden_size),
            "gate_up": (mc.hidden_size, 2 * mc.intermediate_size),
            "down": (mc.intermediate_size, mc.hidden_size),
            "embed_tokens": (mc.vocab_size, mc.hidden_size),
            "lm_head": (mc.hidden_size, mc.vocab_size),
        }

    # ---- add / remove ------------------------------------------------------

    def _normalize_weights(self, weights: Dict) -> Dict:
        """Expand plain-target keys to every layer; pass scoped keys."""
        out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for key, ab in (weights or {}).items():
            if key in GLOBAL_TARGETS:
                out[key] = ab
            elif key in PER_LAYER_TARGETS:
                for i in range(self.mc.num_hidden_layers):
                    out[f"{i}.{key}"] = ab
            else:
                out[key] = ab
        return out

    def add_lora(self, req: LoRARequest) -> int:
        """Register an adapter; returns its slot. Idempotent per id."""
        if req.lora_int_id in self.id_to_slot:
            return self.id_to_slot[req.lora_int_id]
        if req.weights is None and req.lora_path:
            req = load_peft_adapter(req.lora_path, req.lora_int_id,
                                    name=req.lora_name)
        slot = next((i for i in range(1, self.max_loras + 1)
                     if self.slot_to_id[i] is None), None)
        if slot is None:
            raise RuntimeError(f"LoRA capacity ({self.max_loras}) exhausted")
        assert req.rank <= self.max_rank, (req.rank, self.max_rank)
        for key, (A, B) in self._normalize_weights(req.weights).items():
            if key not in self.stacks:
                logger.warning("LoRA target %s not supported; skipping",
                               key)
                continue
            lw = self.stacks[key]
            r = A.shape[0]
            assert r <= self.max_rank, (key, r, self.max_rank)
            a_pad = np.zeros(lw.a.shape[1:], dtype=np.float32)
            a_pad[:, :r] = A.T                       # [in, r]
            b_pad = np.zeros(lw.b.shape[1:], dtype=np.float32)
            b_pad[:r, :] = B.T                       # [r, out]
            self.stacks[key] = LoRAWeights(
                a=lw.a.at[slot].set(jnp.asarray(a_pad, lw.a.dtype)),
                b=lw.b.at[slot].set(jnp.asarray(b_pad, lw.b.dtype)),
                scale=lw.scale.at[slot].set(req.alpha / max(req.rank, 1)),
            )
        self.id_to_slot[req.lora_int_id] = slot
        self.slot_to_id[slot] = req.lora_int_id
        self._names[req.lora_int_id] = req.lora_name
        logger.info("LoRA %s (id %d) loaded into slot %d", req.lora_name,
                    req.lora_int_id, slot)
        return slot

    def remove_lora(self, lora_int_id: int) -> bool:
        slot = self.id_to_slot.pop(lora_int_id, None)
        if slot is None:
            return False
        self.slot_to_id[slot] = None
        self._names.pop(lora_int_id, None)
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
        return {i: self._names.get(i, str(i)) for i in self.id_to_slot}


def load_peft_adapter(path: str, lora_int_id: int,
                      name: Optional[str] = None) -> LoRARequest:
    """Read a HF PEFT adapter directory into a LoRARequest (reference:
    vllm/lora/peft_helper.py + lora model loading). Separate
    gate_proj/up_proj adapters fuse into the model's gate_up layout as a
    rank-2r block adapter (B block-diagonal over the two halves)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = int(cfg.get("r", 8))
    alpha = float(cfg.get("lora_alpha", 16))

    raw: Dict[str, Dict[str, np.ndarray]] = {}
    from safetensors import safe_open
    st = os.path.join(path, "adapter_model.safetensors")
    with safe_open(st, framework="np") as f:
        for tname in f.keys():
            m = _PEFT_NAME.match(tname)
            if not m:
                logger.warning("unrecognized PEFT tensor %s", tname)
                continue
            tgt = _PEFT_TARGET.get(m.group("target"))
            if tgt is None:
                continue
            layer = m.group("layer")
            key = f"{layer}.{tgt}" if layer is not None else tgt
            raw.setdefault(key, {})[m.group("ab")] = f.get_tensor(tname)

    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    gates: Dict[str, Dict[str, np.ndarray]] = {}
    # Bake the PEFT scale (alpha / r of the ORIGINAL module rank) into B
    # so fused gate_up blocks (rank 2r) keep the right magnitude; slot
    # scale then stays 1.
    bake = alpha / max(rank, 1)
    for key, ab in raw.items():
        if "A" not in ab or "B" not in ab:
            continue
        A, B = ab["A"], ab["B"] * bake
        base, _, tgt = key.rpartition(".")
        if tgt in ("gate_proj", "up_proj"):
            gates.setdefault(base, {})[tgt] = (A, B)
            continue
        if tgt == "embed_tokens":
            # PEFT embedding adapters: A [r, V], B [H, r] already.
            weights[key] = (A, B)
        else:
            weights[key] = (A, B)
    for base, parts in gates.items():
        if "gate_proj" not in parts or "up_proj" not in parts:
            continue
        (Ag, Bg), (Au, Bu) = parts["gate_proj"], parts["up_proj"]
        r = Ag.shape[0]
        I = Bg.shape[0]
        A = np.concatenate([Ag, Au], axis=0)            # [2r, H]
        B = np.zeros((2 * I, 2 * r), Bg.dtype)          # block-diag
        B[:I, :r] = Bg
        B[I:, r:] = Bu
        key = (f"{base}.gate_up" if base else "gate_up")
        weights[key] = (A, B)
        rank = max(rank, 2 * r)
    # Scale is baked into B above → slot scale must be exactly 1.
    return LoRARequest(lora_name=name or os.path.basename(path) or "peft",
                       lora_int_id=lora_int_id, weights=weights,
                       alpha=float(rank), rank=rank)
