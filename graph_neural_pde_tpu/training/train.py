"""Training harness: one-jit train/eval steps, optimizers, metrics.

Replaces the host-side epoch loop of /root/reference/src/run_GNN.py:62-148:
loss + regularisation + gradient + optimizer update compile into a single
XLA program; forward/backward NFE are carried on-device in the solver stats
(the reference meters them on the host via mutable counters,
run_GNN.py:90-95).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.functions import active_regularizers
from graph_neural_pde_tpu.models.gnn import GNNModel


def _torch_rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8
                   ) -> optax.GradientTransformation:
    """torch.optim.RMSprop semantics: update = g / (sqrt(nu) + eps).

    optax.rmsprop computes g * rsqrt(nu + eps) — eps inside the sqrt — which
    diverges from torch for small-magnitude gradient components (the first
    steps are effectively sign-SGD either way, but the eps floor kicks in at
    |g| ~ sqrt(eps) instead of ~eps). The tuned CoauthorCS / ogbn-arxiv
    configs train with rmsprop, so torch-exact semantics matter for
    reproduction; pinned by tests/test_torch_training_parity.py.
    """

    def init(params):
        return {"nu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        del params
        nu = jax.tree_util.tree_map(
            lambda n, g: alpha * n + (1.0 - alpha) * g * g,
            state["nu"], grads)
        upd = jax.tree_util.tree_map(
            lambda g, n: -lr * g / (jnp.sqrt(n) + eps), grads, nu)
        return upd, {"nu": nu}

    return optax.GradientTransformation(init, update)


def _decay_mask_fn(cfg: Config):
    """Mirror torch's grad-None semantics for coupled weight decay.

    In the reference's hard-attention block with a non-attention function,
    the block's own attention layer runs ENTIRELY under torch.no_grad during
    training (block_transformer_hard_attention.py:52-65), so its parameters
    have .grad None and torch optimizers skip them — no update AND no weight
    decay. jax.grad returns structural zeros instead, and un-masked
    add_decayed_weights would shrink those frozen Q/K weights every step,
    changing the forward (the tuned Computers/Photo configs train exactly
    this family with nonzero decay). Pinned by
    tests/test_torch_parity_extended.py::TestHardAttentionParity.
    """
    freeze_block_att = (cfg.block == "hard_attention"
                        and cfg.function not in ("GAT", "transformer"))

    def mask(params):
        def leaf_mask(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            if freeze_block_att and keys[:2] == ["block", "att"]:
                return False
            return True

        return jax.tree_util.tree_map_with_path(leaf_mask, params)

    return mask


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Torch-style coupled weight decay (L2 added to gradients before the
    moment updates), matching run_GNN.get_optimizer (run_GNN.py:24-36)."""
    name, lr, wd = cfg.optimizer, cfg.lr, cfg.decay
    if name == "sgd":
        core = optax.sgd(lr)
    elif name == "rmsprop":
        core = _torch_rmsprop(lr, alpha=0.99, eps=1e-8)
    elif name == "adagrad":
        core = optax.adagrad(lr, eps=1e-10)
    elif name == "adam":
        core = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "adamax":
        core = optax.adamax(lr, b1=0.9, b2=0.999, eps=1e-8)
    else:
        raise ValueError(f"Unsupported optimizer: {name}")
    if wd and wd > 0:
        return optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask_fn(cfg)), core)
    return core


def cross_entropy_loss(logits, labels, mask):
    """Masked-mean cross entropy (CrossEntropyLoss over data.train_mask,
    run_GNN.py:75-80; ogbn-arxiv's nll(log_softmax) is the same quantity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def _probe_paths(tree):
    jtu = jax.tree_util
    flat, _ = jtu.tree_flatten_with_path(tree)
    return [(p, l) for p, l in flat
            if p and isinstance(p[-1], jtu.DictKey)
            and p[-1].key == "adjoint_nfe_probe"]


def _sum_probe_leaves(tree):
    """Sum of every adjoint_nfe_probe cotangent, or None if absent."""
    hits = _probe_paths(tree)
    if not hits:
        return None
    total = jnp.zeros(())
    for _, leaf in hits:
        total = total + jnp.sum(leaf)
    return total


def _zero_probe_leaves(tree):
    jtu = jax.tree_util

    def fn(path, leaf):
        if path and isinstance(path[-1], jtu.DictKey) \
                and path[-1].key == "adjoint_nfe_probe":
            return jnp.zeros_like(leaf)
        return leaf

    return jtu.tree_map_with_path(fn, tree)


def accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels) * m) / jnp.maximum(jnp.sum(m), 1.0)


@dataclass
class EpochLog:
    epoch: int
    loss: float
    train_acc: float
    val_acc: float
    test_acc: float
    fwd_nfe: int
    bwd_nfe: int
    runtime: float


class Trainer:
    """Owns the jitted steps; epoch-invariant data is baked into the
    compiled train step as constants (see _train_step) while params/state/
    opt_state/rng — and the graph, when rewiring passes one — stay traced."""

    def __init__(self, model: GNNModel):
        self.model = model
        self.cfg = model.cfg
        self.optimizer = make_optimizer(model.cfg)
        # backward NFE per accepted forward step (the reference meters bwd
        # NFE with a host counter, run_GNN.py:93-95): the discrete adjoint
        # replays each accepted step once (same stage count); the continuous
        # adjoint's measured count arrives per-step via the
        # adjoint_nfe_probe gradient side channel (stats["bwd_nfe"]).
        from graph_neural_pde_tpu.solvers.tableaus import TABLEAUS
        self._bwd_evals_per_step = (
            0 if model.cfg.adjoint
            else TABLEAUS[model.cfg.method].num_stages
            if model.cfg.method in TABLEAUS else 1)
        _, self.reg_coeffs = active_regularizers(model.cfg)
        # eval steps are re-jitted when the stripe plan is rebuilt (the
        # rewiring hook) — same staleness discipline as _train_step
        self._eval_cache = {}
        # epoch-invariant operands (x/pos/y/mask) are baked into the
        # compiled step as CONSTANTS, not traced arguments — measured at
        # ogbn-arxiv bench scale the identical remat train step runs
        # 992 ms closed-over vs 2000 ms with x traced (probe8c: the
        # penalty is the feature table alone; rng/state traced are free).
        # Full-batch data never changes between epochs, so constants are
        # semantically identical; the cache rebuilds when the caller swaps
        # arrays (keyed by identity, strong refs pinned against id reuse).
        # rng/params/state/opt_state stay traced; the graph remains a
        # traced argument when passed (between-epoch rewiring swaps edge
        # CONTENT at fixed shapes — no recompile).
        self._step_cache = {}

    def _train_step(self, params, state, opt_state, x, pos, y, train_mask,
                    rng, graph=None):
        # keyed ALSO by the stripe plan's identity: the plan's slot layout
        # is baked into the traced step as constants, and a rewiring hook
        # that rebuilds the plan (GNNKNNModel.rewire) must retrace —
        # reusing a stale executable against a re-planned graph would be
        # silently wrong. layout-equal rebuilds keep the old plan OBJECT,
        # so only a genuinely new layout (the first kNN rewire) retraces.
        plan_tok = (id(getattr(self.model, "stripe_plan", None)),
                    id(getattr(self.model, "fa_plan", None)))
        key = (id(x), id(pos), id(y), id(train_mask), plan_tok)
        entry = self._step_cache.get(key)
        if entry is None:
            def impl(params, state, opt_state, rng, graph=None,
                     fa_graph=None):
                return self._train_step_impl(params, state, opt_state, x,
                                             pos, y, train_mask, rng,
                                             graph=graph, fa_graph=fa_graph)

            if len(self._step_cache) >= 4:      # bound executable count
                self._step_cache.pop(next(iter(self._step_cache)))
            entry = (jax.jit(impl), (x, pos, y, train_mask,
                                     getattr(self.model, "stripe_plan",
                                             None)))
            self._step_cache[key] = entry
        fn = entry[0]
        # the fa graph is traced alongside the main graph: between-epoch fa
        # rebuilds (run.py fa hook) swap edge CONTENT at stable capacity —
        # baking it as a trace-time closure would pin epoch-1's fa edges
        # into every later step
        fa = getattr(self.model, "fa_graph", None)
        if graph is None:
            return fn(params, state, opt_state, rng)
        if fa is None:
            return fn(params, state, opt_state, rng, graph)
        return fn(params, state, opt_state, rng, graph, fa)

    # -- label diffusion (run_GNN.py:39-59) --------------------------------
    def _with_labels(self, x, y, label_mask):
        """Append a one-hot label channel for the masked nodes."""
        onehot = jax.nn.one_hot(y, self.model.num_classes, dtype=x.dtype)
        return jnp.concatenate([x, onehot * label_mask[:, None]], axis=-1)

    # -- jitted impls ----------------------------------------------------
    # NOTE: the graph is an explicit (traced) argument rather than a capture
    # of model.graph — between-epoch rewiring swaps the graph arrays, and a
    # trace-time capture would silently keep using the original graph.
    def _train_step_impl(self, params, state, opt_state, x, pos, y,
                         train_mask, rng, graph=None, fa_graph=None):
        if self.cfg.use_labels:
            rng, k_lab = jax.random.split(rng)
            # split the train nodes into label-carrying and prediction nodes
            # (get_label_masks, run_GNN.py:48-59)
            coin = jax.random.uniform(k_lab, train_mask.shape) < self.cfg.label_rate
            x = self._with_labels(x, y, (train_mask & coin).astype(x.dtype))

        fa_kw = {} if fa_graph is None else {"fa_graph": fa_graph}

        def loss_fn(p):
            logits, new_state, stats, regs = self.model.apply(
                p, state, x, pos, training=True, rng=rng, graph=graph,
                **fa_kw)
            loss = cross_entropy_loss(logits, y, train_mask)
            for coeff, rs in zip(self.reg_coeffs, regs):
                if coeff:
                    loss = loss + coeff * jnp.mean(rs)
            return loss, (new_state, stats)

        (loss, (new_state, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # Continuous-adjoint backward NFE rides out of the custom-VJP solve
        # as the cotangent of the inert "adjoint_nfe_probe" leaf
        # (solvers/api._adj_bwd). Harvest it into the step stats and zero
        # it so the probe param never moves (the reference's bm meter,
        # run_GNN.py:93-95).
        probe = _sum_probe_leaves(grads)
        if probe is not None:
            stats = dict(stats)
            stats["bwd_nfe"] = probe.astype(jnp.int32)
            grads = _zero_probe_leaves(grads)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, stats

    def _eval_step(self, *args, **kwargs):
        plan = getattr(self.model, "stripe_plan", None)
        fa_plan = getattr(self.model, "fa_plan", None)
        key = (id(plan), id(fa_plan))
        entry = self._eval_cache.get(key)
        if entry is None:
            if len(self._eval_cache) >= 4:
                self._eval_cache.pop(next(iter(self._eval_cache)))
            entry = (jax.jit(self._eval_step_impl), plan, fa_plan)
            self._eval_cache[key] = entry
        fa = getattr(self.model, "fa_graph", None)
        if fa is not None and "fa_graph" not in kwargs:
            kwargs = dict(kwargs, fa_graph=fa)
        return entry[0](*args, **kwargs)

    def _eval_step_impl(self, params, state, x, pos, y, masks, graph=None,
                        fa_graph=None):
        if self.cfg.use_labels:
            # at test time every train node carries its label (run_GNN.py:141-142)
            x = self._with_labels(x, y, masks[0].astype(x.dtype))
        fa_kw = {} if fa_graph is None else {"fa_graph": fa_graph}
        logits, _, stats, _ = self.model.apply(params, state, x, pos,
                                               training=False, graph=graph,
                                               **fa_kw)
        accs = tuple(accuracy(logits, y, m) for m in masks)
        return accs, logits, stats

    # -- vmapped multi-seed training (one jit trains the whole ensemble) ---
    def fit_ensemble(self, data, *, num_seeds: int = 4,
                     epochs: Optional[int] = None, seed: int = 0,
                     verbose: bool = False):
        """Train ``num_seeds`` independent initialisations in lock-step with
        vmap — the TPU-idiomatic replacement for the reference's sequential
        per-init training inside a Ray trial (ray_tune.py:96-146): identical
        math per seed, one compiled program, MXU-batched.

        Returns (params_stack, state_stack, per_seed_best, summary).
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epoch
        init_keys = jax.random.split(jax.random.PRNGKey(seed), num_seeds)
        params = jax.vmap(self.model.init)(init_keys)[0]
        state = jax.vmap(lambda k: self.model.init(k)[1])(init_keys)
        opt_state = jax.vmap(self.optimizer.init)(params)
        pos = getattr(data, "pos_encoding", None)

        train_v = jax.jit(jax.vmap(
            self._train_step_impl,
            in_axes=(0, 0, 0, None, None, None, None, 0)))
        eval_v = jax.jit(jax.vmap(
            self._eval_step_impl, in_axes=(0, 0, None, None, None, None)))

        key = jax.random.PRNGKey(seed + 1)
        best = [{"val_acc": 0.0, "test_acc": 0.0, "epoch": 0}
                for _ in range(num_seeds)]
        for epoch in range(1, epochs):
            key, k = jax.random.split(key)
            ks = jax.random.split(k, num_seeds)
            params, state, opt_state, loss, _ = train_v(
                params, state, opt_state, data.x, pos, data.y,
                data.train_mask, ks)
            (tr, va, te), _, _ = eval_v(
                params, state, data.x, pos, data.y,
                (data.train_mask, data.val_mask, data.test_mask))
            for i in range(num_seeds):
                if float(va[i]) > best[i]["val_acc"]:
                    best[i] = {"val_acc": float(va[i]),
                               "test_acc": float(te[i]), "epoch": epoch}
            if verbose:
                print(f"Epoch {epoch:03d}: val "
                      f"{np.asarray(va).mean():.4f}±{np.asarray(va).std():.4f}")
        from graph_neural_pde_tpu.utils.stats import aggregate_runs
        summary = {
            "val": aggregate_runs([b["val_acc"] for b in best]),
            "test": aggregate_runs([b["test_acc"] for b in best]),
        }
        return params, state, best, summary

    # -- public ----------------------------------------------------------
    def fit(self, data, *, epochs: Optional[int] = None, seed: int = 0,
            log_every: int = 1, verbose: bool = True, carry: dict = None,
            return_carry: bool = False):
        """data: object with x, y, pos (optional), train/val/test masks (jnp).

        ``carry`` (from a previous fit with return_carry=True) resumes
        training from its params/opt-state/rng at its next epoch — a resumed
        10→30-epoch run takes the exact same steps as a fresh 30-epoch run
        (ASHA rung resume, the reference restores torch checkpoints at
        ray_tune.py:128-134). With return_carry=True the result tuple gains a
        carry dict as 5th element.
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epoch
        pos = getattr(data, "pos_encoding", None)
        if carry is not None:
            params, state, opt_state = (carry["params"], carry["state"],
                                        carry["opt_state"])
            key = carry["key"]
            start_epoch = carry["epoch"]
            best = dict(carry["best"])
        else:
            key = jax.random.PRNGKey(seed)
            k_init, key = jax.random.split(key)
            params, state = self.model.init(k_init)
            opt_state = self.optimizer.init(params)
            start_epoch = 1
            best = {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0,
                    "epoch": 0}

        logs = []
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            key, k_step = jax.random.split(key)
            params, state, opt_state, loss, tstats = self._train_step(
                params, state, opt_state, data.x, pos, data.y,
                data.train_mask, k_step)
            (tr, va, te), _, _ = self._eval_step(
                params, state, data.x, pos, data.y,
                (data.train_mask, data.val_mask, data.test_mask))
            tr, va, te = float(tr), float(va), float(te)
            if va > best["val_acc"]:
                best = {"val_acc": va, "test_acc": te, "train_acc": tr,
                        "epoch": epoch}
            if self.cfg.adjoint and "bwd_nfe" in tstats:
                bwd_nfe = int(tstats["bwd_nfe"])
            else:
                bwd_nfe = (int(tstats["accepted"])
                           * self._bwd_evals_per_step)
            log = EpochLog(epoch, float(loss), tr, va, te,
                           int(tstats["nfe"]), bwd_nfe, time.time() - t0)
            logs.append(log)
            if verbose and epoch % log_every == 0:
                print(f"Epoch: {epoch:03d}, Runtime {log.runtime:.4f}, "
                      f"Loss {log.loss:.4f}, forward nfe {log.fwd_nfe}, "
                      f"backward nfe {log.bwd_nfe}, "
                      f"Train: {tr:.4f}, Val: {va:.4f}, Test: {te:.4f}")
        if return_carry:
            new_carry = {"params": params, "state": state,
                         "opt_state": opt_state, "key": key, "epoch": epochs,
                         "best": best}
            return params, state, best, logs, new_carry
        return params, state, best, logs
