"""Logits processors as jit-compatible table lookups.

The reference's AutoImageTokenGenerationProcessor
(/root/reference/src/models_clm/generation.py:9-31) is a Python loop with
``list.index``; here it is a 66-state transition table:

  * if the previous token is in the chain ``<img> <img_00000> ...
    <img_00063>`` (all but ``</img>``), the next token is FORCED to the
    chain successor (reference boosts its score to max+10; we set it to a
    large constant — identical argmax behavior, and sampling-proof)
  * otherwise the 65 ids ``<img_00000>..</img>`` get score 0.0 (the
    reference's exact soft-suppression semantics)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import (
    BOI_TOKEN_ID,
    EOI_TOKEN_ID,
    FIRST_IMG_TOKEN_ID,
    NUM_IMG_TOKENS,
)


class ImageTokenAutomaton:
    """Precomputed forced-successor table over the (padded) vocab."""

    def __init__(
        self,
        vocab_size: int,
        num_img_gen_tokens: int = NUM_IMG_TOKENS,
        boi_token_id: int = BOI_TOKEN_ID,
        eoi_token_id: int = EOI_TOKEN_ID,
        first_img_token_id: int = FIRST_IMG_TOKEN_ID,
    ):
        chain = (
            [boi_token_id]
            + [first_img_token_id + i for i in range(num_img_gen_tokens)]
            + [eoi_token_id]
        )
        forced = np.full((vocab_size,), -1, np.int32)
        for cur, nxt in zip(chain[:-1], chain[1:]):
            forced[cur] = nxt
        self.forced_next = jnp.asarray(forced)

        suppress = np.zeros((vocab_size,), bool)
        for t in chain[1:]:  # img tokens + </img>, but NOT <img>
            suppress[t] = True
        self.suppress_mask = jnp.asarray(suppress)

    def __call__(self, prev_token: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
        """prev_token: (B,) int32; scores: (B, V) raw logits."""
        forced = self.forced_next[prev_token]  # (B,)
        in_chain = forced >= 0

        # soft-suppress img tokens when not in the chain (reference :29)
        suppressed = jnp.where(self.suppress_mask[None, :], 0.0, scores)
        scores = jnp.where(in_chain[:, None], scores, suppressed)

        # force the successor when in the chain (reference :25-26)
        big = scores.max(axis=-1, keepdims=True) + 10.0
        v = scores.shape[-1]
        onehot = jnp.arange(v)[None, :] == jnp.clip(forced, 0)[:, None]
        forced_scores = jnp.where(onehot, big, scores)
        return jnp.where(in_chain[:, None], forced_scores, scores)
