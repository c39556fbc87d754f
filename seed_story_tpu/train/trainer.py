"""Generic pjit trainer: one train-step function covering all 3 stages.

The reference's three loops (train.py / train_clm_sft.py /
train_sdxl_img2img_llm.py, SURVEY §2.5) share: AdamW + cosine-min-ratio,
grad clip, gradient accumulation, bf16 mixed precision, ZeRO/FSDP
sharding, checkpoint/resume, all-gathered scalar metrics. Here that is a
single ``Trainer`` where:

  * ZeRO-1/2 and FSDP are both "shard params/opt-state along the data
    axis" — one rule table (parallel/sharding.py) instead of two plugins
  * gradient accumulation is a ``lax.scan`` over microbatches inside the
    jitted step (no Python-side accumulation)
  * frozen-module handling (ViT in stage 2, everything but the adapter in
    stage 3) is an optax ``masked`` transform; metrics come back as
    replicated scalars (XLA inserts the cross-device reductions)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import PRESETS, logical_to_sharding
from .scheduler import get_scheduler


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "cosine"
    warmup_steps: int = 100
    training_steps: int = 6000
    min_lr_ratio: float = 0.05
    grad_accum_steps: int = 1
    sharding_preset: str = "fsdp"


def make_optimizer(cfg: TrainConfig, trainable_mask=None) -> optax.GradientTransformation:
    schedule = get_scheduler(
        cfg.lr_scheduler_type, cfg.learning_rate, cfg.warmup_steps,
        cfg.training_steps, cfg.min_lr_ratio,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule, b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        ),
    )
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx


class TrainState:
    """Minimal pytree train state (params, opt_state, step)."""

    def __init__(self, params, opt_state, step):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


class Trainer:
    """Builds the sharded train step for a flax module.

    ``loss_fn(params, batch, rng) -> (loss, metrics_dict)`` is supplied per
    stage; the Trainer owns sharding, optimizer, accumulation and jit.
    """

    def __init__(
        self,
        mesh: Mesh,
        abstract_params,  # pytree w/ nn.Partitioned metadata (from eval_shape)
        loss_fn: Callable,
        cfg: TrainConfig,
        trainable_mask=None,
        batch_sharding: Optional[Any] = None,
        loss_consts: Optional[Any] = None,
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.loss_fn = loss_fn
        rules = PRESETS[cfg.sharding_preset]
        self.param_sharding = logical_to_sharding(abstract_params, mesh, rules)
        if batch_sharding is None:
            # with accumulation the leading axis is (accum, batch, ...)
            spec = P(None, "data") if cfg.grad_accum_steps > 1 else P("data")
            batch_sharding = NamedSharding(mesh, spec)
        self.batch_sharding = batch_sharding
        self.replicated = NamedSharding(mesh, P())
        self.trainable_mask = trainable_mask
        # With a mask, the Trainer partitions the tree itself and runs the
        # optimizer over ONLY the trainable leaves: gradients for frozen
        # params never exist (no stop_gradient+DCE reliance), frozen leaves
        # may even be non-differentiable dtypes (int8 quantize_base), and
        # the Adam state is exactly the trainable set.
        self._mask_flat = (
            jax.tree_util.tree_leaves(trainable_mask)
            if trainable_mask is not None else None
        )
        self.tx = make_optimizer(cfg, None)
        # Frozen parameter bundles (stage-2 ViT, stage-3 agent/VAE) ride as
        # jit ARGUMENTS, never as loss_fn closure constants: closed-over
        # arrays bake into the traced jaxpr/serialized HLO (hour-long
        # lowering at 7B; the axon remote-compile service rejects the
        # upload outright — HTTP 413). With loss_consts set, loss_fn is
        # called as loss_fn(params, batch, rng, consts).
        if loss_consts is not None:
            if jax.process_count() == 1:
                loss_consts = jax.device_put(
                    loss_consts, NamedSharding(mesh, P())
                )
            else:
                from jax.experimental import multihost_utils

                loss_consts = multihost_utils.host_local_array_to_global_array(
                    loss_consts, mesh, P()
                )
        self.loss_consts = loss_consts
        self._jitted = None

    # -- trainable-subtree partition -----------------------------------

    def _trainable_leaves(self, tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return [l for l, m in zip(leaves, self._mask_flat) if m]

    def _with_trainable(self, tree, t_leaves):
        leaves = jax.tree_util.tree_leaves(tree)
        treedef = jax.tree_util.tree_structure(tree)
        it = iter(t_leaves)
        merged = [next(it) if m else l for l, m in zip(leaves, self._mask_flat)]
        return jax.tree_util.tree_unflatten(treedef, merged)

    # -- state --------------------------------------------------------

    def init_state(self, params) -> TrainState:
        # Takes OWNERSHIP of params: step() donates the state buffers, so
        # the caller must not reuse the arrays it passed in (copying here
        # would double peak memory — prohibitive at 7B scale).
        params = jax.device_put(params, self.param_sharding)
        opt_target = (
            self._trainable_leaves(params)
            if self.trainable_mask is not None else params
        )
        opt_sharding = self.opt_state_sharding(opt_target)
        opt_state = jax.jit(self.tx.init, out_shardings=opt_sharding)(opt_target)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def opt_state_sharding(self, opt_target):
        """Adam moments mirror param shapes -> inherit the param sharding;
        scalars (step counts) replicate. Matching is by (shape, dtype).
        ``opt_target`` is the full tree, or the trainable-leaf list when a
        mask partitions the state."""
        shapes = jax.eval_shape(self.tx.init, opt_target)
        shardings = jax.tree_util.tree_leaves(self.param_sharding)
        if self.trainable_mask is not None:
            shardings = [s for s, m in zip(shardings, self._mask_flat) if m]
        shape_to_sharding = {}
        for p, s in zip(jax.tree_util.tree_leaves(opt_target), shardings):
            shape_to_sharding.setdefault((p.shape, str(p.dtype)), s)

        def pick(leaf):
            return shape_to_sharding.get((leaf.shape, str(leaf.dtype)), self.replicated)

        return jax.tree_util.tree_map(pick, shapes)

    def shard_batch(self, batch):
        """Host batch -> globally-sharded device batch.

        Single-process: a plain device_put onto batch_sharding. Multi-
        process: each process holds ITS shard of the global batch (the
        datapipes already host-shard, SURVEY §2.4) and the local arrays
        are assembled into global jax.Arrays without data movement
        (multihost_utils.host_local_array_to_global_array)."""
        if jax.process_count() == 1:
            return jax.device_put(batch, self.batch_sharding)
        from jax.experimental import multihost_utils

        spec = (
            self.batch_sharding.spec
            if isinstance(self.batch_sharding, NamedSharding)
            else jax.tree_util.tree_map(
                lambda s: s.spec, self.batch_sharding
            )
        )
        return multihost_utils.host_local_array_to_global_array(
            batch, self.mesh, spec
        )

    # -- step ---------------------------------------------------------

    def _train_step(self, state: TrainState, batch, rng, consts=None):
        cfg = self.cfg
        params = state.params
        masked = self.trainable_mask is not None

        def call_loss(p, micro):
            if consts is not None:
                return self.loss_fn(p, micro, rng, consts)
            return self.loss_fn(p, micro, rng)

        if masked:
            # differentiate w.r.t. the trainable leaves only; frozen leaves
            # enter the loss as plain (possibly int8) constants
            def loss_of(t_leaves, micro):
                return call_loss(self._with_trainable(params, t_leaves), micro)

            opt_target = self._trainable_leaves(params)
        else:
            loss_of = call_loss

            opt_target = params

        def microbatch_grads(micro):
            (loss, metrics), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(opt_target, micro)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return grads, metrics

        if cfg.grad_accum_steps > 1:
            # batch leaves are stacked (accum, micro_bs, ...): zeros-init the
            # carry from eval_shape so ALL microbatches run inside ONE scan —
            # unrolling the first microbatch to fix the metric structure
            # would compile the fwd+bwd body twice (at 7B that doubles
            # compile time and program size, the very cost scan_layers pays
            # down).
            first = jax.tree_util.tree_map(lambda x: x[0], batch)
            shapes = jax.eval_shape(microbatch_grads, first)
            carry0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

            def scan_body(carry, micro):
                g_acc, m_acc = carry
                g, m = microbatch_grads(micro)
                return (
                    jax.tree_util.tree_map(jnp.add, g_acc, g),
                    jax.tree_util.tree_map(jnp.add, m_acc, m),
                ), None

            (g_sum, m_sum), _ = jax.lax.scan(scan_body, carry0, batch)
            grads = jax.tree_util.tree_map(lambda g: g / cfg.grad_accum_steps, g_sum)
            metrics = jax.tree_util.tree_map(lambda m: m / cfg.grad_accum_steps, m_sum)
        else:
            grads, metrics = microbatch_grads(batch)

        updates, new_opt = self.tx.update(grads, state.opt_state, opt_target)
        new_target = optax.apply_updates(opt_target, updates)
        new_params = (
            self._with_trainable(params, new_target) if masked else new_target
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    def compile(self, state: TrainState):
        state_shardings = TrainState(
            self.param_sharding,
            jax.tree_util.tree_map(lambda x: x.sharding, state.opt_state),
            self.replicated,
        )
        in_shardings = [state_shardings, self.batch_sharding, self.replicated]
        if self.loss_consts is not None:
            in_shardings.append(
                jax.tree_util.tree_map(lambda _: self.replicated,
                                       self.loss_consts)
            )
        self._jitted = jax.jit(
            self._train_step,
            in_shardings=tuple(in_shardings),
            out_shardings=(state_shardings, self.replicated),
            donate_argnums=(0,),
        )
        return self._jitted

    def step(self, state, batch, rng):
        if self._jitted is None:
            self.compile(state)
        if self.loss_consts is not None:
            return self._jitted(state, batch, rng, self.loss_consts)
        return self._jitted(state, batch, rng)
