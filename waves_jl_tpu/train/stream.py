"""Streaming trainer: host-resident episodes, per-dispatch batch upload.

The device-resident trainers (`train`, `train_windowed`) cap the dataset at
HBM size — at reference width a 500-episode store is ~6 GB, so scaling the
dataset past ~1000 episodes (the cheapest quality lever: datagen is
~0.3 s/episode) is impossible on one chip. Here the episode store stays in
host memory as numpy, each dispatch uploads ONE (K, B) chunk of horizon
windows (~270 MB at K=B=32, reference width) gathered by vectorized numpy
indexing, and the device runs the same scan-of-K fused train step. JAX's
async dispatch overlaps the next chunk's host gather with the current
chunk's device compute, so the steady-state cost is max(compute, gather +
upload) — compute-bound at reference width (~0.8 s/update vs ~10 ms/update
of gather+transfer).

The reference has no analog (its whole dataset is `gpu(...)`'d per batch
from CPU BSON, `scripts/main.jl:78`); this is the TPU-native shape of a
bigger-than-device-memory training pipeline: static shapes (every chunk
identical), one transfer per K updates, no host syncs inside the chunk.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import Episode
from ..utils.logging import MetricsLogger, Timer
from .checkpoint import save_checkpoint
from .loop import TrainConfig, make_optimizer, make_scan_eval
from .windows import sample_window_indices, stack_episodes


def gather_window_batch_host(store: Episode, idx: np.ndarray, horizon: int,
                             stride: int = 1) -> dict:
    """Vectorized numpy version of `windows.gather_window_batch`: gather N
    horizon windows from a HOST (numpy) episode store.

    idx (N, 2) int [episode, start] -> batch dict with leading axis N, same
    fields/joining as `data.prepare_data` (first window keeps all T+1 rows,
    each later window drops its duplicated first row; stride subsamples the
    joined grid). Parity with the device gather is pinned by
    `tests/test_stream_train.py`.
    """
    e, s = idx[:, 0], idx[:, 1]
    N, H = len(e), horizon
    T = store.s_tspan.shape[-1] - 1
    win = s[:, None] + np.arange(H)[None, :]  # (N, H)
    ee = e[:, None]

    t_win = store.s_tspan[ee, win]  # (N, H, T+1)
    t = np.concatenate([t_win[:, 0], t_win[:, 1:, 1:].reshape(N, (H - 1) * T)],
                       axis=1)
    y_win = store.y[ee, win]  # (N, H, T+1, 3)
    y = np.concatenate(
        [y_win[:, 0], y_win[:, 1:, 1:, :].reshape(N, (H - 1) * T, 3)], axis=1
    )
    if stride > 1:
        t = t[:, ::stride]
        y = y[:, ::stride]
    return {
        "s_wave": store.s_wave[e, s],
        "s_design": jax.tree_util.tree_map(lambda x: x[e, s], store.s_design),
        "a": jax.tree_util.tree_map(lambda x: x[ee, win], store.a),
        "t": t,
        "y": y,
    }


def make_scan_train_steps_batched(loss_fn: Callable, opt) -> Callable:
    """Scan-of-K trainer over an UPLOADED (K, B, ...) chunk of minibatches
    (no device-resident dataset): one dispatch runs K (fwd+bwd -> optimizer)
    iterations over the chunk's leading axis.

    Returns jitted run(params, opt_state, batches) -> (params, opt_state,
    losses (K,)).
    """

    @jax.jit
    def run(params, opt_state, batches):
        def body(carry, batch):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batches
        )
        return params, opt_state, losses

    return run


def train_streaming(
    loss_fn: Callable,
    params,
    train_eps: list,
    val_data: dict,
    config: TrainConfig,
    horizon: int = 8,
    stride: int = 1,
    logger: MetricsLogger | None = None,
    on_checkpoint: Callable | None = None,
):
    """Train over a host-resident episode list of unbounded size.

    Same schedule semantics as the device-resident `train` (epochs of
    shuffled distinct windows, K = val_every * accumulate micro-steps per
    dispatch, exact validation cadence); `val_data` is a small prepared
    dataset kept device-resident. Loss readback for chunk i is deferred
    until chunk i+1 is dispatched so the device never idles on the host.
    Returns (params, opt_state, logger).
    """
    logger = logger or MetricsLogger(config.metrics_path)
    timer = Timer()
    opt = make_optimizer(config)
    opt_state = opt.init(params)
    store = (
        stack_episodes(train_eps, device=False)
        if isinstance(train_eps, list) else train_eps
    )
    E, A = store.s_wave.shape[0], store.s_wave.shape[1]
    B = config.batch_size
    K = config.val_every * config.accumulate
    n_windows = E * (A - horizon + 1)
    nb = n_windows // B
    rng = np.random.default_rng(config.seed)

    run_k = make_scan_train_steps_batched(loss_fn, opt)
    eval_k = make_scan_eval(loss_fn)
    val_data = jax.device_put(val_data)
    n_val = val_data["s_wave"].shape[0]

    rows = []
    epoch_of_row = []
    for epoch in range(config.epochs):
        idx = sample_window_indices(rng, E, A, horizon, nb * B)
        rows.append(idx.reshape(nb, B, 2))
        epoch_of_row.extend([epoch] * nb)
    rows = np.concatenate(rows, axis=0)

    def finish(pending_losses, micro_step, p_snap, o_snap):
        # reads chunk i's results AFTER chunk i+1 was dispatched: the sync
        # waits on chunk i only, the device is already busy with i+1
        train_loss = float(jnp.mean(pending_losses))
        updates_done = micro_step // config.accumulate
        nvb = min(config.val_batches, max(1, n_val // B))
        val_idx = jnp.asarray(
            rng.integers(0, n_val, size=(nvb, B)), dtype=jnp.int32
        )
        with timer("validate"):
            val_loss = float(eval_k(p_snap, val_data, val_idx))
        epoch = epoch_of_row[min(micro_step - 1, len(epoch_of_row) - 1)]
        total_updates = micro_step / config.accumulate
        logger.log(
            step=updates_done, epoch=epoch, train_loss=train_loss,
            val_loss=val_loss,
            step_time=timer.totals["train_chunk"] / max(1.0, total_updates),
        )
        print(
            f"Step: {updates_done}, Train Loss: {train_loss:.6g}, "
            f"Val Loss: {val_loss:.6g}", flush=True,
        )
        if config.checkpoint_dir:
            path = f"{config.checkpoint_dir}/checkpoint_step={updates_done}"
            with timer("checkpoint"):
                save_checkpoint(path, p_snap, o_snap, updates_done)
            if on_checkpoint is not None:
                on_checkpoint(path, p_snap)

    pending = None  # chunk still on device: (losses, micro, params, opt)
    micro_step = 0
    for start in range(0, rows.shape[0], K):
        chunk_idx = rows[start : start + K]
        with timer("gather"):
            batches = gather_window_batch_host(
                store, chunk_idx.reshape(-1, 2), horizon, stride
            )
            k_this = chunk_idx.shape[0]
            batches = jax.tree_util.tree_map(
                lambda x: x.reshape((k_this, B) + x.shape[1:]), batches
            )
        with timer("train_chunk"):
            params, opt_state, losses = run_k(
                params, opt_state, jax.device_put(batches)
            )
        micro_step += k_this
        if pending is not None:
            finish(*pending)
        pending = (losses, micro_step, params, opt_state)
    if pending is not None:
        finish(*pending)

    return params, opt_state, logger
