"""Training engine: jitted train/val steps, epoch loop, early stopping,
checkpointing, metric logging, optional data parallelism over a device mesh.

The reference delegates all of this to PyTorch-Lightning (run.py:52); the
TPU rebuild supplies its own engine (SURVEY.md §1 "no custom runtime in the
repo").  Design: the model wrapper exposes pure ``loss(params, batch, graph,
rng, train)``; the trainer jits one step that fuses loss+grad+optimizer
update (donated state), shards the batch over the ``dp`` mesh axis, and
lets jit insert the gradient psum.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magnet_tpu.train.checkpoint import CheckpointManager, load_checkpoint
from magnet_tpu.train.optim import make_optimizer
from magnet_tpu.utils import get_logger

log = get_logger("magnet_tpu.trainer")


def _to_device(tree, sharding=None):
    if sharding is None:
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


class EarlyStopping:
    def __init__(self, patience: int = 35, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.count = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience


class Trainer:
    def __init__(
        self,
        model,
        max_epochs: int = 100,
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        factor: float = 0.3,
        step_size: int = 50,
        patience: int = 35,
        workdir: str = "runs/default",
        seed: int = 42,
        mesh: Optional[jax.sharding.Mesh] = None,
        graph_shards: int = 1,
        graph_halo=False,
        log_every: int = 10,
        check_val_every: int = 1,
        steps_per_call: int = 1,
        skip_nonfinite: bool = False,
        grad_clip: float = 0.0,
        save_last_every: int = 1,
        best_weights_only: bool = False,
    ):
        self.model = model
        self.max_epochs = max_epochs
        self.lr = lr
        self.weight_decay = weight_decay
        self.factor = factor
        self.step_size = step_size
        self.workdir = workdir
        self.seed = seed
        self.mesh = mesh
        self.graph_shards = graph_shards
        # False = all-gather; True = halo all_to_all; "overlap" = halo with
        # the interior/boundary edge split (collective/compute overlap)
        self.graph_halo = graph_halo
        if graph_shards > 1:
            assert mesh is not None and "graph" in mesh.axis_names, (
                "graph_shards > 1 needs a mesh with a 'graph' axis"
            )
            assert hasattr(model, "loss_partitioned"), (
                f"{model.name} has no graph-parallel execution path"
            )
        self.log_every = log_every
        self.check_val_every = check_val_every
        # device-side multi-step loop: lax.scan over k stacked batches per
        # jitted call amortizes per-step dispatch (+6.5% at bench shapes,
        # benchmarks/variants.py scan10); graph-partitioned runs keep k=1
        # (the per-key sharding layout in _put doesn't stack).
        self.steps_per_call = max(1, int(steps_per_call))
        self.skip_nonfinite = bool(skip_nonfinite)
        # global-norm gradient clipping (Lightning's gradient_clip_val
        # analog — the reference STACK supports it though its configs
        # leave it unset).  Applied to the grads before the optimizer, not
        # as an optax transform, so the opt_state layout (and therefore
        # checkpoint compatibility) is independent of the setting.
        self.grad_clip = float(grad_clip)
        if self.steps_per_call > 1 and graph_shards > 1:
            log.warning(
                "steps_per_call > 1 unsupported with graph_shards > 1; using 1"
            )
            self.steps_per_call = 1
        self.ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"),
                                      last_every=save_last_every,
                                      best_weights_only=best_weights_only)
        self.early = EarlyStopping(patience=patience)
        self._last_val: Optional[float] = None
        os.makedirs(workdir, exist_ok=True)
        self._metrics_f = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._tx = None
        self.state: dict[str, Any] = {}
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("dp"))
            self._rep_sharding = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    def _build_steps(self, steps_per_epoch: int):
        self._tx = make_optimizer(
            self.lr, self.weight_decay, self.factor, self.step_size,
            steps_per_epoch, skip_nonfinite=self.skip_nonfinite,
        )
        model = self.model

        partitioned = self.graph_shards > 1
        mesh = self.mesh
        clip = self.grad_clip

        def _clip(grads):
            if clip <= 0:
                return grads
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / jnp.maximum(gn, 1e-12))
            return jax.tree.map(lambda g: g * scale, grads)

        def train_step(params, opt_state, batch, graph, rng):
            def lfn(p):
                if partitioned:
                    return model.loss_partitioned(
                        p, batch, graph, mesh, rng=rng, train=True
                    )
                return model.loss(p, batch, graph, rng=rng, train=True)

            (loss, metrics), grads = jax.value_and_grad(lfn, has_aux=True)(params)
            updates, opt_state = self._tx.update(_clip(grads), opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        def val_step(params, batch, graph):
            if partitioned:
                _, metrics = model.loss_partitioned(
                    params, batch, graph, mesh, train=False
                )
            else:
                _, metrics = model.loss(params, batch, graph, train=False)
            return metrics

        donate = (0, 1)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._val_step = jax.jit(val_step)

        def _scan_body(carry, batch, graph, rng):
            params, opt_state = carry
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: model.loss(p, batch, graph, rng=rng, train=True),
                has_aux=True,
            )(params)
            updates, opt_state = self._tx.update(_clip(grads), opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        def train_scan(params, opt_state, batches, graphs, rngs):
            """k steps per call: scan over stacked batches AND graphs."""
            (params, opt_state), metrics = jax.lax.scan(
                lambda c, xs: _scan_body(c, xs[0], xs[1], xs[2]),
                (params, opt_state),
                (batches, graphs, rngs),
            )
            return params, opt_state, metrics

        def train_scan_shared(params, opt_state, batches, graph, rngs):
            """k steps per call with one graph shared by every step (the
            graph cache returns the same object for repeated coordinate
            batches — regular grids — so don't stack k copies)."""
            (params, opt_state), metrics = jax.lax.scan(
                lambda c, xs: _scan_body(c, xs[0], graph, xs[1]),
                (params, opt_state),
                (batches, rngs),
            )
            return params, opt_state, metrics

        self._train_scan = jax.jit(train_scan, donate_argnums=donate)
        self._train_scan_shared = jax.jit(train_scan_shared, donate_argnums=donate)

    def _build_graph(self, batch):
        if self.graph_shards > 1:
            return self.model.build_graph_partitioned(
                batch, self.graph_shards, halo=self.graph_halo
            )
        return self.model.build_graph(batch)

    def _put(self, batch, graph):
        jb = {k: v for k, v in batch.items()}
        if self._data_sharding is not None:
            jb = _to_device(jb, self._data_sharding)
            if graph is not None:
                if self.graph_shards > 1:
                    graph = self._place_pg(graph)
                else:
                    graph = _to_device(graph, self._data_sharding)
        else:
            jb = _to_device(jb)
        return jb, graph

    def _place_pg(self, g):
        """Shard partition buffers: per-shard arrays over (dp, graph), flat
        edge lists over dp; recurses into nested dicts (models with several
        partitioned graphs, e.g. MAgNetGNN's lr/all pair)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        eg = NamedSharding(self.mesh, P("dp", "graph"))
        g = dict(g)
        for k, v in g.items():
            if isinstance(v, dict):
                g[k] = self._place_pg(v)
        for k in ("senders", "recv_loc", "mask", "table",
                  "senders_remap", "halo_idx",
                  "remap_int", "recv_int", "mask_int", "t_int",
                  "remap_bnd", "recv_bnd", "mask_bnd", "t_bnd",
                  "degree"):
            if k in g:
                g[k] = jax.device_put(jnp.asarray(g[k]), eg)
        for k in ("senders_flat", "receivers_flat",
                  "senders_flat_int", "receivers_flat_int",
                  "senders_flat_bnd", "receivers_flat_bnd", "nbr"):
            if k in g:
                g[k] = jax.device_put(
                    jnp.asarray(g[k]), self._data_sharding
                )
        return g

    @staticmethod
    def _sig(pair):
        """Static-shape signature of a (batch, graph) pair — scan needs every
        step in a chunk to share shapes/dtypes/tree structure."""
        def leaves_sig(tree):
            leaves, treedef = jax.tree.flatten(tree)
            return treedef, tuple(
                (np.shape(l), str(getattr(l, "dtype", type(l)))) for l in leaves
            )

        batch, graph = pair
        return leaves_sig(dict(batch)), leaves_sig(graph)

    def _put_stacked(self, batches, graphs):
        """Stack k (batch, graph) pairs on a new leading axis and transfer.
        Returns (stacked_batch, graph, shared): shared=True when every graph
        is the same cached object (regular grids — the graph cache in
        models/common.py returns one Graph per coordinate digest), in which
        case the graph is passed unstacked."""
        sb = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[dict(b) for b in batches],
        )
        shared = graphs[0] is None or all(g is graphs[0] for g in graphs)
        if self._data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stacked_sh = NamedSharding(self.mesh, P(None, "dp"))
            sb = _to_device(sb, stacked_sh)
            if shared:
                g = (None if graphs[0] is None
                     else _to_device(graphs[0], self._data_sharding))
            else:
                g = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
                g = _to_device(g, stacked_sh)
        else:
            sb = _to_device(sb)
            if shared:
                g = None if graphs[0] is None else _to_device(graphs[0])
            else:
                g = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
        return sb, g, shared

    def _run_chunk(self, buf, params, opt_state, rng, pending):
        """Run the buffered (batch, graph) pairs: one scanned jit call when a
        full, shape-uniform chunk is available, single steps otherwise.
        Returns (params, opt_state, rng, n_steps)."""
        k = len(buf)
        use_scan = k == self.steps_per_call and k > 1
        if use_scan:
            sig0 = self._sig(buf[0])
            use_scan = all(self._sig(p) == sig0 for p in buf[1:])
        if use_scan:
            sb, g, shared = self._put_stacked(
                [b for b, _ in buf], [g for _, g in buf]
            )
            rng, *subs = jax.random.split(rng, k + 1)
            rngs = jnp.stack(subs)
            fn = self._train_scan_shared if shared else self._train_scan
            params, opt_state, metrics = fn(params, opt_state, sb, g, rngs)
            pending.append(metrics)
            return params, opt_state, rng, k
        n = 0
        for batch, graph in buf:
            jb, g = self._put(batch, graph)
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = self._train_step(
                params, opt_state, jb, g, sub
            )
            pending.append(metrics)
            n += 1
        return params, opt_state, rng, n

    # ------------------------------------------------------------------
    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        resume: Optional[str] = None,
    ):
        rng = jax.random.PRNGKey(self.seed)
        steps_per_epoch = len(train_loader)
        self._build_steps(steps_per_epoch)

        # init from first batch
        train_loader.set_epoch(0)
        it = iter(train_loader)
        first = next(it)
        graph0 = self._build_graph(first)
        jb0, g0 = self._put(first, graph0)
        rng, init_rng = jax.random.split(rng)
        if self.graph_shards > 1:
            # param init uses the standard (unpartitioned) forward
            init_graph = self.model.build_graph(first)
            params = self.model.init(init_rng, _to_device(dict(first)), init_graph)
        else:
            params = self.model.init(init_rng, jb0, g0)
        opt_state = self._tx.init(params)
        start_epoch = 0
        if resume:
            state, meta = load_checkpoint(
                resume, {"params": params, "opt_state": opt_state}
            )
            params, opt_state = state["params"], state["opt_state"]
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.info(f"resumed from {resume} at epoch {start_epoch}")
        if self._data_sharding is not None:
            # EVERY input of a sharded jit must be explicitly placed:
            # mixing committed (sharded batch) and uncommitted (params)
            # inputs forces a per-call reshard (~100x on the axon relay,
            # CLAUDE.md) — replicate params/opt_state across the mesh
            params = jax.tree.map(
                lambda a: jax.device_put(a, self._rep_sharding), params
            )
            opt_state = jax.tree.map(
                lambda a: jax.device_put(a, self._rep_sharding), opt_state
            )
        n_params = sum(x.size for x in jax.tree.leaves(params))
        log.info(f"model {self.model.name}: {n_params:,} params; "
                 f"{steps_per_epoch} steps/epoch")

        profile_dir = os.environ.get("MAGNET_TPU_PROFILE_DIR")
        step = 0
        stop = False
        epoch = start_epoch - 1
        for epoch in range(start_epoch, self.max_epochs):
            if profile_dir and epoch == start_epoch + 1:
                # second epoch: steady state, compiles done
                jax.profiler.start_trace(profile_dir)
            train_loader.set_epoch(epoch)
            t0 = time.time()
            pending = []          # device-side metric dicts; one sync per epoch
            count = 0
            buf = []
            for batch in train_loader:
                buf.append((batch, self._build_graph(batch)))
                if len(buf) == self.steps_per_call:
                    params, opt_state, rng, n = self._run_chunk(
                        buf, params, opt_state, rng, pending
                    )
                    count += n
                    step += n
                    buf = []
            if buf:
                params, opt_state, rng, n = self._run_chunk(
                    buf, params, opt_state, rng, pending
                )
                count += n
                step += n
            train_time = time.time() - t0
            agg: dict[str, float] = {}
            for m in jax.device_get(pending):
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(np.sum(v))
            tm = {f"train_{k}": v / max(count, 1) for k, v in agg.items()}

            row = {
                "epoch": epoch,
                "time": train_time,
                "steps_per_s": count / max(train_time, 1e-9),
                **tm,
            }

            if val_loader is not None and (epoch + 1) % self.check_val_every == 0:
                vm = self.evaluate(params, val_loader)
                row.update({f"val_{k}": v for k, v in vm.items()})
                monitored = row.get("val_mae_loss", row.get("val_loss"))
                if monitored is not None:
                    self._last_val = float(monitored)
                    self.ckpt.update(
                        {"params": params, "opt_state": opt_state}, epoch,
                        {"val_mae_loss": monitored},
                    )
                    stop = self.early.update(monitored)
                else:
                    log.warning("val loader produced no batches; skipping "
                                "checkpoint/early-stop this epoch")

            if profile_dir and epoch == start_epoch + 1:
                jax.profiler.stop_trace()
                log.info(f"profiler trace written to {profile_dir}")
            self._metrics_f.write(json.dumps(row) + "\n")
            self._metrics_f.flush()
            log.info(
                " ".join(
                    [f"epoch {epoch}"]
                    + [f"{k}={v:.5f}" for k, v in row.items() if k not in ("epoch",)]
                )
            )
            if stop:
                log.info(f"early stopping at epoch {epoch}")
                break

        self.state = {"params": params, "opt_state": opt_state}
        # guarantee a final rolling checkpoint for resume even when
        # save_last_every skipped the final epoch's write
        if epoch >= start_epoch and self.ckpt.last_epoch != epoch:
            # record the FINAL epoch's metric (what these weights achieve),
            # not the best-so-far; omit it entirely when no validation ran
            # (inf would serialize as non-standard JSON 'Infinity')
            meta = ({"val_mae_loss": self._last_val}
                    if self._last_val is not None else {})
            self.ckpt.save_last(self.state, epoch, meta)
        return params

    # ------------------------------------------------------------------
    def evaluate(self, params, loader) -> dict[str, float]:
        # keep metric dicts on device and fetch once: a blocking
        # device_get costs ~40 ms through the axon relay (CLAUDE.md)
        pending = []
        for batch in loader:
            graph = self._build_graph(batch)
            jb, g = self._put(batch, graph)
            pending.append(self._val_step(params, jb, g))
        agg: dict[str, float] = {}
        for metrics in jax.device_get(pending):
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return {k: v / max(len(pending), 1) for k, v in agg.items()}
