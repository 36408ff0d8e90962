"""Training driver: sharded train state, jitted update step, train loop.

The reference's entire "runtime" is a 30-line eager loop
(reference demo.py:83-113).  Here the step is a single jitted SPMD program
over a ('data','model') mesh:

  - parameters/optimizer state are placed by the partition rules in
    parallel/mesh.py (replicated on a 1-chip mesh, TP-sharded otherwise);
  - the batch is sharded over 'data'; XLA inserts the gradient psum over ICI;
  - loss = PIT SI-SNR + L1 (losses.py), optimizer = global-norm clip 1.0 +
    Adam(3e-4) matching reference demo.py:88,103;
  - donate_argnums donates the previous state so params/opt-state update
    in-place in HBM (no double residency).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av_separation_tpu.config import ExperimentConfig
from av_separation_tpu.losses import separation_loss
from av_separation_tpu.models.model import AVSeparationTransformer
from av_separation_tpu.ops import policy
from av_separation_tpu.parallel.mesh import param_shardings, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(cfg.train.learning_rate),
    )


def create_train_state(cfg: ExperimentConfig, mesh: Optional[Mesh] = None,
                       ) -> Tuple[AVSeparationTransformer, TrainState]:
    """Initialize model + optimizer state, sharded over `mesh` if given."""
    model = AVSeparationTransformer(cfg.model)
    d = cfg.data
    sample_mixed = jnp.zeros((1, d.freq_bins, d.num_stft_frames), jnp.float32)
    sample_frames = jnp.zeros((1, d.total_lip_frames, d.frame_h, d.frame_w),
                              jnp.float32)
    tx = make_optimizer(cfg)

    def init_fn(rng):
        variables = model.init(rng, sample_mixed, sample_frames,
                               deterministic=True)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            # Raw key data (not a typed key) so the state checkpoints as a
            # plain uint32 array; re-wrapped with the configured impl each
            # step.  rbg is the TPU-native generator (see TrainConfig).
            rng=jax.random.key_data(
                jax.random.key(cfg.train.seed + 1,
                               impl=cfg.train.rng_impl)),
        )

    rng = jax.random.PRNGKey(cfg.train.seed)
    if mesh is None:
        # Jitted even single-device: eager init is one tunnel round-trip
        # per op on remote backends (measured 90 s for the demo model on
        # the axon TPU vs one cached compile), and the persistent
        # compilation cache amortizes it across processes.
        return model, jax.jit(init_fn)(rng)

    # Shard by rule: params get PARAM_RULES placements; the optimizer state
    # mirrors them (XLA propagates from the params input of tx.init).
    abstract = jax.eval_shape(init_fn, rng)
    p_sh = param_shardings(mesh, abstract.params)
    out_sh = TrainState(
        step=NamedSharding(mesh, P()),
        params=p_sh,
        batch_stats=replicated(mesh, abstract.batch_stats),
        opt_state=_opt_state_shardings(mesh, abstract.opt_state,
                                       abstract.params, p_sh),
        rng=NamedSharding(mesh, P()),
    )
    with mesh, policy.use_mesh(mesh):
        state = jax.jit(init_fn, out_shardings=out_sh)(rng)
    return model, state


def _opt_state_shardings(mesh: Mesh, abstract_opt: Any, abstract_params: Any,
                         p_sh: Any) -> Any:
    """Optimizer-state shardings: leaves shaped like a param tree (Adam
    mu/nu) inherit the param shardings; scalars are replicated."""
    params_struct = jax.tree_util.tree_structure(abstract_params)

    def assign(node):
        try:
            if jax.tree_util.tree_structure(node) == params_struct:
                return p_sh
        except Exception:
            pass
        if hasattr(node, "shape"):
            return NamedSharding(mesh, P())
        return None

    return jax.tree_util.tree_map(
        assign, abstract_opt,
        is_leaf=lambda n: (hasattr(n, "shape")
                           or jax.tree_util.tree_structure(n) == params_struct))


def _train_step_body(model: AVSeparationTransformer,
                     cfg: ExperimentConfig) -> Callable:
    """Unjitted (state, batch) -> (state, metrics) update body, shared by the
    per-step jit, the scan-fused step, and the multi-chip pjit."""
    tx = make_optimizer(cfg)
    loss_cfg = cfg.loss

    rng_impl = cfg.train.rng_impl

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        typed = jax.random.wrap_key_data(state.rng, impl=rng_impl)
        rng, dropout_rng = jax.random.split(typed)

        def loss_fn(params):
            (separated, masks), updated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["mixed_spec"], batch["lip_frames"],
                deterministic=False, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            loss = separation_loss(separated, batch["clean_specs"],
                                   l1_weight=loss_cfg.l1_weight,
                                   pit_mode=loss_cfg.pit_mode,
                                   eps=loss_cfg.eps)
            return loss, updated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  rng=jax.random.key_data(rng))
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step_fn


def make_train_step(model: AVSeparationTransformer, cfg: ExperimentConfig,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Build the jitted fwd+bwd+update step: (state, batch) -> (state, metrics).

    batch: dict with mixed_spec (B,F,T), lip_frames (B,N,H,W),
    clean_specs (B,S,F,T).
    """
    step_fn = _train_step_body(model, cfg)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    from av_separation_tpu.parallel.mesh import BATCH_SPEC
    batch_spec = {k: NamedSharding(mesh, BATCH_SPEC)
                  for k in ("mixed_spec", "lip_frames", "clean_specs")}

    def step_sharded(state, batch):
        # Declare the mesh for trace-time kernel policy: Pallas kernels
        # route through shard_map (or fall back to XLA) instead of letting
        # GSPMD replicate an unpartitionable custom call (ops/policy.py).
        with policy.use_mesh(mesh):
            return step_fn(state, batch)

    return jax.jit(step_sharded, donate_argnums=(0,),
                   in_shardings=(None, batch_spec))


def make_fused_train_steps(model: AVSeparationTransformer,
                           cfg: ExperimentConfig, steps_per_call: int,
                           mesh: Optional[Mesh] = None) -> Callable:
    """Fully-fused training: `steps_per_call` update steps per dispatch via
    lax.scan, with the synthetic batch generated ON DEVICE inside the scan —
    data synthesis, STFT, fwd, bwd and the optimizer update compile into one
    XLA program with zero host involvement between dispatches.

    (state,) -> (state, last_loss).  The reference's equivalent is a Python
    loop over a host DataLoader (reference demo.py:94-104).
    """
    from av_separation_tpu.data.device_synthetic import generate_batch

    step_fn = _train_step_body(model, cfg)
    data_cfg = cfg.data
    batch_size = cfg.train.batch_size

    def body(state, _):
        key = jax.random.fold_in(
            jax.random.key(cfg.train.seed + 17, impl=cfg.train.rng_impl),
            state.step)
        batch = generate_batch(key, data_cfg, batch_size)
        if mesh is not None:
            # Pin the on-device batch to the DP axes so the whole scan body
            # runs data-parallel (the generator itself is elementwise over
            # batch, so GSPMD shards it for free given this constraint).
            from av_separation_tpu.parallel.mesh import BATCH_SPEC
            spec = NamedSharding(mesh, BATCH_SPEC)
            batch = {k: jax.lax.with_sharding_constraint(v, spec)
                     for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        return state, metrics["loss"]

    def multi(state):
        with policy.use_mesh(mesh):
            state, losses = jax.lax.scan(body, state, None,
                                         length=steps_per_call)
        return state, losses[-1]

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(model: AVSeparationTransformer,
                   mesh: Optional[Mesh] = None) -> Callable:
    """Jitted eval: (variables, batch) -> dict of SNR metrics."""
    from av_separation_tpu.utils.metrics import input_snr, permutation_snr

    @jax.jit
    def eval_fn(params, batch_stats, batch):
        with policy.use_mesh(mesh):
            separated, masks = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["mixed_spec"], batch["lip_frames"], deterministic=True)
        return {
            "input_snr": jnp.mean(
                input_snr(batch["mixed_spec"], batch["clean_specs"])),
            "output_snr": jnp.mean(
                permutation_snr(separated, batch["clean_specs"])),
            "mask_min": jnp.min(masks),
            "mask_max": jnp.max(masks),
        }

    return eval_fn
