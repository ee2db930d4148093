"""Medusa speculative decoding: k independent heads over the target's
last hidden state.

Behavioral reference: ``/root/reference/vllm/v1/spec_decode/medusa.py`` +
``model_executor/models/medusa.py`` (ResidualBlock heads + per-head LM
heads). Unlike EAGLE there is no draft KV cache and no autoregressive
feature loop — head i directly predicts token t+i+1 from hidden_t — so one
jitted call produces all k drafts. Verification is the runner's standard
exact-match pass, so random heads never change outputs (losslessness
tests), only acceptance.

Duck-types EagleProposer's runner-side interface (ingest_and_propose /
free / mode).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class MedusaProposer:

    mode = "medusa"
    aux_layers = ()

    def __init__(self, target_config: ModelConfig, k: int,
                 num_layers: int = 1, weights=None, seed: int = 0):
        self.config = target_config
        self.k = k
        self.num_layers = num_layers
        H = target_config.hidden_size
        V = target_config.vocab_size
        if weights is not None:
            self.params = self._load(weights, H, V)
        else:
            rng = np.random.default_rng(1000 + seed)
            self.params = {
                # [k, L, H, H] block weights, [k, L, H] biases, [k, H, V]
                "w": jnp.asarray(rng.standard_normal(
                    (k, num_layers, H, H), dtype=np.float32) * 0.02),
                "b": jnp.zeros((k, num_layers, H), jnp.float32),
                "lm": jnp.asarray(rng.standard_normal(
                    (k, H, V), dtype=np.float32) * 0.02),
            }

        @jax.jit
        def _propose(params, hidden, idx):
            h0 = hidden[idx].astype(jnp.float32)             # [H]
            def head(w, b, lm):
                h = h0
                for j in range(num_layers):
                    h = h + jax.nn.silu(h @ w[j] + b[j])     # ResidualBlock
                return jnp.argmax(h @ lm).astype(jnp.int32)
            return jax.vmap(head)(params["w"], params["b"], params["lm"])

        self._propose_fn = _propose

    def _load(self, weights, H, V):
        """Original Medusa checkpoint naming:
        ``medusa_head.{i}.{j}.linear.{weight,bias}`` ResidualBlocks and the
        final ``medusa_head.{i}.{L}.weight`` LM head."""
        import re
        w = np.zeros((self.k, self.num_layers, H, H), np.float32)
        b = np.zeros((self.k, self.num_layers, H), np.float32)
        lm = np.zeros((self.k, H, V), np.float32)
        for name, arr in weights:
            name = name.removeprefix("medusa_heads.").removeprefix(
                "medusa_head.")
            arr = np.asarray(arr, np.float32)
            if m := re.match(r"(\d+)\.(\d+)\.linear\.(weight|bias)$", name):
                i, j = int(m.group(1)), int(m.group(2))
                if i < self.k and j < self.num_layers:
                    if m.group(3) == "weight":
                        w[i, j] = arr.T
                    else:
                        b[i, j] = arr
            elif m := re.match(r"(\d+)\.(\d+)\.weight$", name):
                i = int(m.group(1))
                if i < self.k:
                    lm[i] = arr.T
            else:
                logger.debug("skipping medusa weight %s", name)
        return {"w": jnp.asarray(w), "b": jnp.asarray(b),
                "lm": jnp.asarray(lm)}

    # ---- runner-side interface (EagleProposer duck type) -------------------

    def ingest_and_propose(self, rid: str, hidden, row_t0: int,
                           chunk_start: int, accepted_end: int,
                           token_ids, want_drafts: bool, room: int,
                           embed_w, lm_w, sampling=None) -> List[int]:
        # Medusa heads are independent per-position classifiers; sampled
        # drafting (chain q) does not apply — greedy heads as reference.
        if not want_drafts or room <= 0 or accepted_end <= chunk_start:
            return []
        idx = row_t0 + (accepted_end - 1 - chunk_start)
        toks = np.asarray(self._propose_fn(self.params, hidden,
                                           jnp.asarray(idx, jnp.int32)))
        return [int(t) for t in toks[:min(self.k, room)]]

    def free(self, rid: str) -> None:
        pass
