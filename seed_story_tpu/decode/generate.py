"""Jit-compiled story-agent generation.

Reproduces ContinuousLVLM.generate
(/root/reference/src/models_clm/models.py:98-221) as a single on-device
program: padded-prompt prefill (image features scattered into the token
slots) -> ``lax.while_loop`` greedy decode with the image-token automaton
-> per-step hidden-state capture -> output-resampler features for the 64
tokens preceding the LAST ``</img>`` (models.py:185-205).

Everything is static-shape: prompts are bucket-padded (one compile per
bucket), the KV cache has fixed capacity, hidden states land in a
preallocated (max_new_tokens, D) buffer.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import EOI_TOKEN_ID, NUM_IMG_TOKENS
from ..models.llama import KVCache
from .logits_processors import ImageTokenAutomaton


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter: keep the smallest prefix of descending-probability
    tokens whose cumulative mass reaches ``top_p``; the rest go to -inf."""
    sorted_l = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_l, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    drop = (cum - probs) >= top_p  # cumulative mass BEFORE this token
    thresh = jnp.min(
        jnp.where(drop, jnp.inf, sorted_l), axis=-1, keepdims=True
    )  # smallest kept logit
    return jnp.where(logits >= thresh, logits, -jnp.inf)


@dataclasses.dataclass
class GenerateConfig:
    max_new_tokens: int = 500
    num_img_gen_tokens: int = NUM_IMG_TOKENS
    eos_token_id: int = 2
    eoi_token_id: int = EOI_TOKEN_ID
    cache_capacity: int = 4096
    prompt_bucket: int = 128  # prompts pad up to a multiple of this
    # 0 => greedy (the reference calls generate with do_sample=False);
    # >0 => temperature + nucleus sampling, seeded via generate(seed=...)
    temperature: float = 0.0
    top_p: float = 1.0
    # Testing/benchmark knob: force a '<img>' at this decode step if the
    # model hasn't opened an image block on its own (untrained weights
    # never would). None disables — trained models don't need it.
    force_boi_at: Optional[int] = None
    # Static upper bound on context images per call: the image axis is
    # padded to this so a growing story shares ONE compiled program
    # (window_size in the pipelines; 8 in the reference).
    max_context_images: int = 8
    # >0 enables speculative decoding via prompt-lookup drafting (greedy
    # only; works at any batch — B>1 rows run lockstep with per-row accept
    # counts): each step verifies K drafted tokens plus the committed
    # token in ONE K+1-query pass — decode is latency-bound per dependent
    # pass (PERF.md), so a pass costs about one token but can commit up to
    # K+1. Drafts come from the last occurrence of the trailing bigram in
    # prompt+generated history (the 66-token forced image chains repeat
    # verbatim, so image blocks stream at up to K+1 tokens/pass). Output
    # is EXACTLY the plain greedy output (verified token by token).
    speculate_k: int = 0
    # NOTE: K+1 verify queries must stay on the small-q cached-attention
    # path (models/llama.py decode_attention handles s <= 8 without
    # dequantizing the KV cache); K > 7 would silently fall back to the
    # cache-copying mha branch and defeat the latency win — rejected at
    # construction (see __post_init__).
    # When False the on-device program does not return the updated KV cache
    # (the gen_george story flow re-prefills the full prompt each segment and
    # never reads it back); combined with the always-on cache donation this
    # caps live cache copies at ONE — at 7B the cache is 0.5MB/slot, so the
    # story bench would otherwise OOM a 16GB chip. Keep True for the sink
    # pipeline, which threads the cache across turns.
    return_cache: bool = True

    def __post_init__(self):
        if self.speculate_k > 7:
            raise ValueError(
                f"speculate_k={self.speculate_k}: K+1 verify queries must "
                "stay <= 8 to ride the small-q cached-attention path "
                "(models/llama.py decode_attention); larger K would fall "
                "back to the cache-dequantizing mha branch and lose the "
                "latency win. Use speculate_k <= 7."
            )


class StoryGenerator:
    """Owns the jitted prefill+decode program for one agent+params set.

    Pass ``mesh`` (+ a sharding preset) to run generation tensor-parallel:
    params are laid out by the model's logical axes (parallel/sharding.py)
    and XLA turns the per-layer matmuls into sharded matmuls + collectives
    over ICI — how a 7B agent decodes on a v5e-8.
    """

    def __init__(self, agent_model, params, cfg: GenerateConfig,
                 mesh=None, sharding_preset: str = "fsdp_tp"):
        self.agent = agent_model
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        llm_cfg = agent_model.cfg.llm
        self.automaton = ImageTokenAutomaton(
            llm_cfg.vocab_padded, num_img_gen_tokens=cfg.num_img_gen_tokens
        )
        self._compiled: Dict[Any, Any] = {}
        self._param_sharding = None
        if mesh is not None:
            from ..parallel.sharding import PRESETS, logical_to_sharding

            seq = max(64, 2 * cfg.num_img_gen_tokens)
            abstract = jax.eval_shape(
                lambda: agent_model.init(
                    jax.random.PRNGKey(0),
                    input_ids=jnp.zeros((1, seq), jnp.int32),
                    attention_mask=jnp.ones((1, seq), jnp.int32),
                    labels=jnp.zeros((1, seq), jnp.int32),
                    image_embeds=jnp.zeros(
                        (1, agent_model.cfg.num_vit_tokens, agent_model.cfg.vit_dim)
                    ),
                    embeds_gen_mask=jnp.ones((1,), bool),
                    embeds_cmp_mask=jnp.ones((1,), bool),
                    ids_gen_mask=jnp.zeros((1, seq), bool),
                    ids_cmp_mask=jnp.zeros((1, seq), bool),
                )
            )["params"]
            self._param_sharding = logical_to_sharding(
                abstract, mesh, PRESETS[sharding_preset]
            )
            self.params = jax.device_put(params, self._param_sharding)

    # -- on-device program -------------------------------------------

    def _generate_impl(
        self,
        params,
        input_ids,  # (B, P) bucket-padded — B independent stories in lockstep
        prompt_len,  # (B,) true lengths
        image_embeds,  # (B*max_img, vit_tokens, vit_dim) flattened image axis
        embeds_cmp_mask,  # (B*max_img,)
        ids_cmp_mask,  # (B, P)
        seed,  # () int32 — sampling stream (unused/DCE'd when greedy)
        cache: KVCache,
    ):
        """Decode is HBM-bound on parameter bytes at B=1, so B stories share
        one parameter stream per token: measured near-linear story throughput
        in B (the reference's gen_george loops val stories one at a time)."""
        cfg = self.cfg
        agent = self.agent
        b = input_ids.shape[0]

        def apply(method, *a, **kw):
            return agent.apply({"params": params}, *a, method=method, **kw)

        # ---- prefill -------------------------------------------------
        embeds = apply(
            agent.embed_with_images, input_ids, image_embeds,
            ids_cmp_mask, embeds_cmp_mask,
        )
        # logits only at the last true prompt position (saves the (S, V)
        # lm_head activation — the margin that fits 7B prefill on one chip)
        last_idx = prompt_len - 1  # (B,)
        out = apply(agent.llm_step, embeds, cache, seq_lengths=prompt_len,
                    logits_indices=last_idx)
        cache = out["cache"]
        last_logits = out["logits"][:, 0]  # (B, V)

        d = out["hidden_states"].shape[-1]
        max_new = cfg.max_new_tokens

        tokens_buf = jnp.zeros((b, max_new), jnp.int32)
        hidden_buf = jnp.zeros((b, max_new, d), out["hidden_states"].dtype)

        from ..data.tokenizer import BOI_TOKEN_ID

        base_key = jax.random.PRNGKey(seed)

        def pick(prev_token, logits, step):  # (B,), (B, V) -> (B,)
            logits = self.automaton(prev_token, logits.astype(jnp.float32))
            if cfg.temperature > 0.0:
                scaled = logits / cfg.temperature
                if cfg.top_p < 1.0:
                    scaled = top_p_filter(scaled, cfg.top_p)
                tok = jax.random.categorical(
                    jax.random.fold_in(base_key, step), scaled, axis=-1
                ).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # greedy
            if cfg.force_boi_at is not None:
                in_chain = self.automaton.forced_next[prev_token] >= 0
                force = jnp.logical_and(step == cfg.force_boi_at,
                                        jnp.logical_not(in_chain))
                tok = jnp.where(force, BOI_TOKEN_ID, tok)
            return tok

        prev_token = jnp.take_along_axis(
            input_ids, last_idx[:, None], axis=1
        )[:, 0]  # (B,) last true prompt token per row
        first_token = pick(prev_token, last_logits, 0)
        tokens_buf = tokens_buf.at[:, 0].set(first_token)

        if cfg.speculate_k > 0:
            assert cfg.temperature == 0.0, "speculative decoding is greedy-only"
            # return_cache=True composes with speculation: commit blocks are
            # written contiguously at the per-row cache length, so the
            # committed prefix [0, length) is always valid KV; entries
            # beyond it are rejected-draft garbage. The sink pipeline (the
            # only cache-threading consumer) re-truncates `length` to the
            # tokens it keeps, which lands inside the committed prefix.
            num_generated, cache, tokens_buf, hidden_buf = self._spec_loop(
                apply, agent, cache, tokens_buf, hidden_buf,
                input_ids, prompt_len,
            )
        else:
            num_generated, cache, tokens_buf, hidden_buf = \
                self._plain_loop(apply, agent, cache, tokens_buf, hidden_buf,
                                 pick)

        # ---- image feature extraction (last </img> per row) ----------
        is_eoi = (tokens_buf == cfg.eoi_token_id) & (
            jnp.arange(max_new)[None, :] < num_generated[:, None]
        )
        has_img = is_eoi.any(axis=1)  # (B,)
        last_eoi = jnp.where(
            has_img, max_new - 1 - jnp.argmax(is_eoi[:, ::-1], axis=1),
            cfg.num_img_gen_tokens,
        )
        start = jnp.clip(last_eoi - cfg.num_img_gen_tokens, 0)  # (B,)
        block = jax.vmap(
            lambda hb, st: jax.lax.dynamic_slice(
                hb, (st, 0), (cfg.num_img_gen_tokens, d)
            )
        )(hidden_buf, start)  # (B, num_img_gen_tokens, D)
        img_feat = apply(agent.resample_output, block)  # (B, 256, vit_dim)

        out = {
            "tokens": tokens_buf,
            "num_generated": num_generated,
            "has_img_output": has_img,
            "img_gen_feat": img_feat,
        }
        if cfg.return_cache:
            out["cache"] = cache
        return out

    def _plain_loop(self, apply, agent, cache, tokens_buf, hidden_buf, pick):
        cfg = self.cfg
        b, max_new = tokens_buf.shape

        def cond(state):
            i, done, *_ = state
            return jnp.logical_and(i < max_new, jnp.logical_not(done.all()))

        def body(state):
            i, done, num_gen, cache, tokens_buf, hidden_buf = state
            tok = tokens_buf[:, i - 1]  # (B,)
            emb = apply(agent.embed_tokens, tok[:, None])  # (B,1,D)
            out = apply(agent.llm_step, emb, cache)
            cache = out["cache"]
            hidden_buf = hidden_buf.at[:, i - 1].set(out["hidden_states"][:, 0])
            nxt = pick(tok, out["logits"][:, 0], i)
            newly_done = tok == cfg.eos_token_id
            # per-row count, matching the B=1 semantics exactly: a row that
            # consumed eos this step froze at i; an active row advances to i+1
            num_gen = jnp.where(done, num_gen,
                                jnp.where(newly_done, i, i + 1))
            done = jnp.logical_or(done, newly_done)
            tokens_buf = tokens_buf.at[:, i].set(
                jnp.where(done, tokens_buf[:, i], nxt)
            )
            return i + 1, done, num_gen, cache, tokens_buf, hidden_buf

        state0 = (jnp.int32(1), jnp.zeros((b,), bool), jnp.full((b,), 1, jnp.int32),
                  cache, tokens_buf, hidden_buf)
        i, done, num_generated, cache, tokens_buf, hidden_buf = jax.lax.while_loop(
            cond, body, state0
        )
        return num_generated, cache, tokens_buf, hidden_buf

    def _spec_loop(self, apply, agent, cache, tokens_buf, hidden_buf,
                   input_ids, prompt_len):
        """Speculative greedy decode via prompt-lookup drafting (any B).

        Each pass feeds ``[t_prev, d_0..d_{K-1}]`` (K+1 tokens per row)
        through the small-q cache path and commits the longest verified
        prefix plus one bonus token — byte-identical output to the plain
        loop, pinned by ``test_speculative_decode_matches_greedy`` /
        ``test_speculative_batch_matches_sequential``. (Byte-identity holds
        at matched arithmetic; on TPU bf16 the K+1-query pass may round
        logits differently than the 1-query pass, so near-TIED logits —
        common with random weights, rare with trained ones — can resolve to
        a different equally-ranked token. Verified on-chip: at a divergence
        the f32 replay showed a top-2 gap below one bf16 quantum.) The
        per-row KV-cache ``length`` makes draft rollback free: rejected
        entries sit beyond ``length`` (masked) and the next pass's insert
        overwrites them. Worst case (no accepts) each pass still commits
        one token for about one token's cost — decode is latency-bound per
        dependent pass, not byte-bound (PERF.md "Decode roofline anatomy").

        B>1 runs the rows in LOCKSTEP with per-row progress: each row has
        its own ``idx``/``done``/cache ``length`` and commits its own
        accept count per pass; a finished row keeps riding the pass (its
        ncommit is forced to 0, so its state is frozen and every write it
        makes is either idempotent — t_prev re-fed at the same frozen cache
        position recomputes the identical hidden/KV — or lands beyond its
        committed count). The loop exits when every row is done, so batched
        speculation compounds the two measured levers: B stories share one
        parameter stream per pass AND each pass commits up to K+1 tokens
        per row (the forced 66-token image chains accept near 100%)."""
        import dataclasses as _dc

        cfg = self.cfg
        K = cfg.speculate_k
        b, max_new = tokens_buf.shape
        # K+1 slack: commit blocks are written as static K+1 slices; the
        # tail garbage is either overwritten by the next pass or masked out
        tokens_buf = jnp.pad(tokens_buf, ((0, 0), (0, K + 1)))
        hidden_buf = jnp.pad(hidden_buf, ((0, 0), (0, K + 1), (0, 0)))

        P = input_ids.shape[1]
        hist0 = jnp.zeros((b, P + max_new + K + 1), jnp.int32)
        hist0 = jax.lax.dynamic_update_slice(hist0, input_ids, (0, 0))
        p0 = prompt_len  # (B,)

        def draft_for(hist0_row, p0_row, tokens_row, idx):
            # most recent earlier occurrence of the trailing bigram; the K
            # tokens that followed it become the draft (garbage drafts are
            # safe — verification rejects them)
            hist = jax.lax.dynamic_update_slice(hist0_row, tokens_row,
                                                (p0_row,))
            hlen = p0_row + idx
            last2 = jax.lax.dynamic_slice(hist, (hlen - 2,), (2,))
            jpos = jnp.arange(hist.shape[0] - 1)
            match = (hist[:-1] == last2[0]) & (hist[1:] == last2[1]) & (
                jpos < hlen - 2
            )
            m = jnp.max(jnp.where(match, jpos, -1))
            src = jnp.where(m >= 0, m + 2, hlen)
            return jax.lax.dynamic_slice(hist, (src,), (K,))

        from ..data.tokenizer import BOI_TOKEN_ID

        def pick(prev, logits, steps):  # (B,K+1), (B,K+1,V), (B,K+1)
            flat = self.automaton(
                prev.reshape(-1),
                logits.reshape(-1, logits.shape[-1]).astype(jnp.float32),
            )
            tok = jnp.argmax(flat, axis=-1).astype(jnp.int32).reshape(
                prev.shape)
            if cfg.force_boi_at is not None:
                # same per-position semantics as the plain loop: the token
                # destined for buf position p is forced when p ==
                # force_boi_at and the automaton chain is not active
                in_chain = self.automaton.forced_next[prev] >= 0
                force = jnp.logical_and(steps == cfg.force_boi_at,
                                        jnp.logical_not(in_chain))
                tok = jnp.where(force, BOI_TOKEN_ID, tok)
            return tok

        def cond(state):
            idx, done, *_ = state
            return jnp.any(jnp.logical_and(idx < max_new,
                                           jnp.logical_not(done)))

        def body(state):
            idx, done, cache, tokens_buf, hidden_buf = state
            t_prev = jax.vmap(
                lambda row, i: jax.lax.dynamic_slice(row, (i - 1,), (1,))
            )(tokens_buf, idx)  # (B, 1)
            drafts = jax.vmap(draft_for)(hist0, p0, tokens_buf, idx)  # (B,K)
            block = jnp.concatenate([t_prev, drafts], axis=1)  # (B, K+1)
            L = cache.length
            out = apply(agent.llm_step,
                        apply(agent.embed_tokens, block), cache)
            cache = out["cache"]
            nxt = pick(block, out["logits"],
                       idx[:, None] + jnp.arange(K + 1)[None, :])  # (B,K+1)
            accept = jnp.sum(jnp.cumprod(
                (nxt[:, :K] == drafts).astype(jnp.int32), axis=1), axis=1)
            is_eos = nxt == cfg.eos_token_id
            first_eos = jnp.min(
                jnp.where(is_eos, jnp.arange(K + 1)[None, :], K + 1), axis=1)
            ncommit = jnp.minimum(
                jnp.minimum(accept + 1, first_eos + 1), max_new - idx)
            # the plain loop detects eos when CONSUMED: a pass whose t_prev
            # is already eos commits nothing and stops (num freezes at idx);
            # an already-done row is frozen the same way
            prev_is_eos = t_prev[:, 0] == cfg.eos_token_id
            ncommit = jnp.where(jnp.logical_or(prev_is_eos, done), 0, ncommit)
            done = jnp.logical_or(done, jnp.logical_or(
                prev_is_eos,
                jnp.logical_or(first_eos + 1 <= ncommit,
                               idx + ncommit >= max_new),
            ))
            tokens_buf = jax.vmap(
                lambda row, new, i: jax.lax.dynamic_update_slice(
                    row, new, (i,))
            )(tokens_buf, nxt, idx)
            hidden_buf = jax.vmap(
                lambda row, new, i: jax.lax.dynamic_update_slice(
                    row, new, (i - 1, 0))
            )(hidden_buf, out["hidden_states"], idx)
            # valid cache entries: t_prev + the accepted drafts that were
            # consumed (= ncommit-1); the bonus token is fed next pass
            cache = _dc.replace(cache, length=L + ncommit)
            return idx + ncommit, done, cache, tokens_buf, hidden_buf

        state0 = (jnp.ones((b,), jnp.int32), jnp.zeros((b,), bool),
                  cache, tokens_buf, hidden_buf)
        idx, done, cache, tokens_buf, hidden_buf = jax.lax.while_loop(
            cond, body, state0
        )
        return (idx, cache,
                tokens_buf[:, :max_new], hidden_buf[:, :max_new])

    # -- host API ------------------------------------------------------

    def _impl_entry(self):
        """The function handed to jit.

        return_cache=True: the cache is an ARGUMENT, donated, and returned —
        the output aliases the donated buffers so exactly one cache lives
        across the sink pipeline's cache-threading calls.

        return_cache=False: the cache is created INSIDE the program, so it is
        pure HLO temp (donating an argument that has no matching output is
        unusable — XLA keeps the argument alive AND builds the updated cache
        in temp, a whole extra 7B-cache of HBM)."""
        if self.cfg.return_cache:
            return self._generate_impl

        llm_cfg = self.agent.cfg.llm

        def impl_fresh_cache(params, input_ids, prompt_len, image_embeds,
                             embeds_cmp_mask, ids_cmp_mask, seed):
            # size the fresh cache to THIS bucket (static at trace time):
            # decode attention reads the whole capacity buffer every token,
            # so a short early-story prompt should not pay for the
            # worst-case capacity — at 7B a 2944-slot cache is ~3.1GB of
            # reads/token vs ~1.4GB for a 1280-slot one.
            bucket = input_ids.shape[1]
            # speculative mode writes a K+1-token verify block whose last
            # entries can land past prompt+max_new-1 (the bonus token of the
            # final pass): without the extra K+1 slots the
            # dynamic_update_slice start would clamp and overwrite committed
            # KV entries near max_new, corrupting verification.
            slack = self.cfg.speculate_k + 1 if self.cfg.speculate_k > 0 else 0
            need = bucket + self.cfg.max_new_tokens + slack
            capacity = ((need + 127) // 128) * 128
            if self.cfg.speculate_k == 0:
                capacity = min(self.cfg.cache_capacity, capacity)
            cache = KVCache.create(
                llm_cfg, batch=input_ids.shape[0], capacity=capacity,
                dtype=llm_cfg.dtype,
            )
            return self._generate_impl(
                params, input_ids, prompt_len, image_embeds,
                embeds_cmp_mask, ids_cmp_mask, seed, cache,
            )

        return impl_fresh_cache

    def _get_compiled(self, bucket: int, n_images: int, batch: int = 1):
        key = (batch, bucket, n_images)
        if key not in self._compiled:
            impl = self._impl_entry()
            takes_cache = self.cfg.return_cache
            donate = (7,) if takes_cache else ()
            if self._param_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                in_shardings = (self._param_sharding,) + (rep,) * 6
                if takes_cache:
                    # KV heads shard along the model axis when divisible
                    llm_cfg = self.agent.cfg.llm
                    kv_ok = llm_cfg.kv_heads % self.mesh.shape["model"] == 0
                    kv_spec = P(None, "model" if kv_ok else None, None, None)
                    kv = NamedSharding(self.mesh, kv_spec)
                    sc = NamedSharding(
                        self.mesh, P(None, "model" if kv_ok else None, None)
                    )
                    n_layers = llm_cfg.num_hidden_layers
                    in_shardings = in_shardings + (KVCache(
                        k=(kv,) * n_layers, v=(kv,) * n_layers, length=rep,
                        k_scale=(sc,) * n_layers if llm_cfg.quantize_kv else None,
                        v_scale=(sc,) * n_layers if llm_cfg.quantize_kv else None,
                    ),)
                self._compiled[key] = jax.jit(
                    impl, in_shardings=in_shardings, donate_argnums=donate
                )
            else:
                self._compiled[key] = jax.jit(impl, donate_argnums=donate)
        return self._compiled[key]

    def _pad_images(self, image_embeds, embeds_cmp_mask):
        """Pad ONE story's image axis to the static per-story bound."""
        cfg = self.cfg
        image_embeds = jnp.asarray(image_embeds)
        embeds_cmp_mask = np.asarray(embeds_cmp_mask, bool)
        n_img = image_embeds.shape[0]
        max_img = max(cfg.max_context_images, n_img)
        if n_img < max_img:
            image_embeds = jnp.concatenate(
                [image_embeds,
                 jnp.zeros((max_img - n_img,) + image_embeds.shape[1:],
                           image_embeds.dtype)],
                axis=0,
            )
            embeds_cmp_mask = np.concatenate(
                [embeds_cmp_mask, np.zeros(max_img - n_img, bool)]
            )
        return image_embeds, embeds_cmp_mask

    def generate(
        self,
        input_ids: np.ndarray,  # (P,) or (1, P) true prompt
        image_embeds,  # (N, vit_tokens, vit_dim)
        embeds_cmp_mask,  # (N,) bool
        ids_cmp_mask: np.ndarray,  # (P,) bool
        cache: Optional[KVCache] = None,
        seed: int = 0,  # sampling stream when cfg.temperature > 0
    ):
        """Pads the prompt to a bucket, runs the on-device program, returns
        host-side results (+ the updated cache for sink reuse)."""
        cfg = self.cfg
        input_ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        p = input_ids.shape[1]
        bucket = ((p + cfg.prompt_bucket - 1) // cfg.prompt_bucket) * cfg.prompt_bucket
        pad = bucket - p
        ids_pad = np.pad(input_ids, ((0, 0), (0, pad)))
        cmp_pad = np.pad(
            np.atleast_2d(np.asarray(ids_cmp_mask, bool)), ((0, 0), (0, pad))
        )
        # pad the image axis to the static bound -> one compile for the
        # story. Stays in jnp: the features are usually already device-side
        # (the pipeline feeds back the model's own output features), and an
        # np round-trip would drag ~33MB through the host per segment.
        image_embeds, embeds_cmp_mask = self._pad_images(
            image_embeds, embeds_cmp_mask
        )
        fn = self._get_compiled(bucket, int(image_embeds.shape[0]))
        args = [
            self.params,
            jnp.asarray(ids_pad),
            jnp.asarray([p], jnp.int32),
            jnp.asarray(image_embeds),
            jnp.asarray(embeds_cmp_mask),
            jnp.asarray(cmp_pad),
            jnp.int32(seed),
        ]
        if cfg.return_cache:
            if cache is None:
                llm_cfg = self.agent.cfg.llm
                cache = KVCache.create(
                    llm_cfg, batch=1, capacity=cfg.cache_capacity,
                    dtype=llm_cfg.dtype,
                )
            args.append(cache)
        else:
            assert cache is None, "return_cache=False cannot thread a cache"
        out = fn(*args)
        n = int(out["num_generated"][0])
        tokens = np.asarray(out["tokens"][0])[:n]
        has_img = bool(out["has_img_output"][0])
        return {
            "generate_ids": tokens,
            "has_img_output": has_img,
            "img_gen_feat": out["img_gen_feat"] if has_img else None,
            "cache": out.get("cache"),
            "num_generated": n,
        }

    def generate_batch(self, stories, seed: int = 0):
        """Run B independent stories in lockstep through ONE on-device
        program — B=1 decode is HBM-bound on parameter bytes, so the B
        stories ride the same per-token parameter stream (the serving-path
        batching the torch reference lacks: gen_george.py loops val stories
        one at a time).

        ``stories``: list of dicts with keys ``input_ids`` (P_i,),
        ``image_embeds`` (N_i, vit_tokens, vit_dim), ``embeds_cmp_mask``
        (N_i,), ``ids_cmp_mask`` (P_i,). Prompts pad to the max bucket;
        per-story image axes pad to ``max_context_images`` each.

        Returns a list of B per-story result dicts (no cache threading —
        batched mode targets the gen_george flow, which re-prefills)."""
        cfg = self.cfg
        assert not cfg.return_cache, (
            "generate_batch targets the re-prefill story flow; construct the "
            "generator with return_cache=False"
        )
        b = len(stories)
        lens = [np.atleast_2d(np.asarray(s["input_ids"], np.int32)).shape[1]
                for s in stories]
        p_max = max(lens)
        bucket = ((p_max + cfg.prompt_bucket - 1) // cfg.prompt_bucket
                  ) * cfg.prompt_bucket
        ids = np.zeros((b, bucket), np.int32)
        cmp_mask = np.zeros((b, bucket), bool)
        embeds, emasks = [], []
        for r, s in enumerate(stories):
            row = np.atleast_2d(np.asarray(s["input_ids"], np.int32))
            ids[r, : lens[r]] = row[0]
            cmp_mask[r, : lens[r]] = np.asarray(s["ids_cmp_mask"], bool)[: lens[r]]
            e, m = self._pad_images(s["image_embeds"], s["embeds_cmp_mask"])
            embeds.append(e)
            emasks.append(m)
        assert all(e.shape[0] == embeds[0].shape[0] for e in embeds), (
            "stories must share one static image bound (raise "
            "max_context_images to cover the largest story)"
        )
        image_embeds = jnp.concatenate(embeds, axis=0)  # (B*max_img, ...)
        embeds_cmp_mask = np.concatenate(emasks)
        fn = self._get_compiled(bucket, int(embeds[0].shape[0]), batch=b)
        out = fn(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(lens, jnp.int32),
            image_embeds,
            jnp.asarray(embeds_cmp_mask),
            jnp.asarray(cmp_mask),
            jnp.int32(seed),
        )
        results = []
        nums = np.asarray(out["num_generated"])
        tokens = np.asarray(out["tokens"])
        has = np.asarray(out["has_img_output"])
        for r in range(b):
            results.append({
                "generate_ids": tokens[r, : int(nums[r])],
                "has_img_output": bool(has[r]),
                "img_gen_feat": out["img_gen_feat"][r : r + 1]
                if bool(has[r]) else None,
                "num_generated": int(nums[r]),
            })
        return results
