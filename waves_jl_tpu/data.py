"""Episode data generation, horizon windowing, storage, batching.

TPU-native re-design of reference `src/data.jl`. Episodes are pytrees with a
leading action axis; generation runs the jitted env step in a Python loop
(one device dispatch per action window) or fully `lax.scan`-fused; windowing
(`prepare_data`) is pure array ops; storage is npz of named leaves (the
reference uses BSON, `src/data.jl:60-71`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .env import WaveEnv, env_observe, env_reset, env_step
from .utils.interp import flatten_repeated_last_dim
from .utils.trees import (
    decode_structure,
    encode_structure,
    register_pytree_dataclass,
    tree_index,
    tree_stack,
)


@register_pytree_dataclass
@dataclass(frozen=True)
class Episode:
    """One episode: A = number of actions (reference `Episode`,
    `src/data.jl:3-8`).

    s_wave:   (A, res, res, 4)  observation images
    s_design: design pytree with leading axis A (observed design at step i)
    s_tspan:  (A, T+1)
    a:        action pytree with leading axis A
    y:        (A, T+1, 3) energy signals
    """

    s_wave: jax.Array
    s_design: Any
    s_tspan: jax.Array
    a: Any
    y: jax.Array

    def __len__(self):
        return self.s_wave.shape[0]


@jax.jit
def _episode_scan(env: WaveEnv, state, actions):
    """Scan the whole episode on device: one dispatch for A action windows."""

    def body(st, action):
        obs = env_observe(env, st)
        st2, info = env_step(env, st, action)
        return st2, (obs.wave, obs.design, info["tspan"], st2.signal)

    final_state, (s_wave, s_design, s_tspan, y) = jax.lax.scan(body, state, actions)
    return final_state, Episode(s_wave=s_wave, s_design=s_design, s_tspan=s_tspan, a=actions, y=y)


def generate_episode(env: WaveEnv, policy, key: jax.Array, reset: bool = True, state=None):
    """Roll one full episode (reference `generate_episode!`,
    `src/data.jl:12-33`): A = env.actions windows, random policy actions
    sampled up front (they are state-independent for RandomDesignPolicy).

    Returns (final_state, Episode).
    """
    k_reset, k_actions = jax.random.split(key)
    if reset or state is None:
        state = env_reset(env, k_reset)
    action_keys = jax.random.split(k_actions, env.actions)
    actions = jax.vmap(policy)(action_keys)
    return _episode_scan(env, state, actions)


def generate_episode_fused(env: WaveEnv, policy, key: jax.Array, fused_step, state=None):
    """Episode generation on the Pallas fused-kernel path (~6x faster
    windows). fused_step comes from
    `waves_jl_tpu.physics.fused.make_env_step_fused(env)`."""
    k_reset, k_actions = jax.random.split(key)
    if state is None:
        state = env_reset(env, k_reset)
    observe = jax.jit(lambda s: env_observe(env, s))
    action_keys = jax.random.split(k_actions, env.actions)
    actions = jax.vmap(policy)(action_keys)

    s_wave, s_design, s_tspan, ys = [], [], [], []
    for i in range(env.actions):
        obs = observe(state)
        action = tree_index(actions, i)
        state, info = fused_step(state, action)
        s_wave.append(obs.wave)
        s_design.append(obs.design)
        s_tspan.append(info["tspan"])
        ys.append(state.signal)
    return state, Episode(
        s_wave=jnp.stack(s_wave),
        s_design=tree_stack(s_design),
        s_tspan=jnp.stack(s_tspan),
        a=actions,
        y=jnp.stack(ys),
    )


def _fused_episode_fn(env: WaveEnv, tile_interior: int, interpret: bool):
    """Shared traceable whole-episode body: observe + fused Pallas window
    scanned over the action sequence. Single definition so the one-episode
    and chunk-of-episodes generators cannot drift."""
    from .physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)

    def one_episode(state, actions):
        def body(st, action):
            obs = env_observe(env, st)
            st2, info = step(st, action)
            return st2, (obs.wave, obs.design, info["tspan"], st2.signal)

        final, (s_wave, s_design, s_tspan, y) = jax.lax.scan(body, state, actions)
        return final, Episode(
            s_wave=s_wave, s_design=s_design, s_tspan=s_tspan, a=actions, y=y
        )

    return one_episode


def make_episode_fused(env: WaveEnv, tile_interior: int = 48, interpret: bool = False):
    """Whole-episode fused generator: observe + Pallas window for all
    `env.actions` windows inside ONE `lax.scan` program (one device dispatch
    per episode instead of 2 per action window — the per-window loop in
    `generate_episode_fused` is dispatch-bound at ~30 ms/call through the
    axon tunnel).

    Returns run(state, actions) -> (final_state, Episode), jitted.
    """
    return jax.jit(_fused_episode_fn(env, tile_interior, interpret))


def make_episode_chunk_fused(env: WaveEnv, tile_interior: int = 48,
                             interpret: bool = False):
    """Chunk-of-episodes fused generator: K independent episodes
    sequentially inside one program (outer scan over episodes, inner scan
    over action windows). Amortizes dispatch + keeps peak memory at one
    episode's working set (unlike vmap batching at 700^2).

    Returns run(states, actions) -> Episode with leading axis K on every
    leaf, where `states`/`actions` are stacked over K.
    """
    one_episode = _fused_episode_fn(env, tile_interior, interpret)

    @jax.jit
    def run(states, actions):
        def body(_, xs):
            st, acts = xs
            return None, one_episode(st, acts)[1]

        _, eps = jax.lax.scan(body, None, (states, actions))
        return eps

    return run


def generate_episodes_chunked(env: WaveEnv, policy, key: jax.Array,
                              episodes: int, chunk: int = 8,
                              run_chunk=None, on_episode=None):
    """Generate `episodes` episodes on the fused path, `chunk` per dispatch.

    `on_episode(i, episode)` is called for each finished episode (e.g. to
    save it); returns the list of episodes if no callback is given.
    """
    if run_chunk is None:
        run_chunk = make_episode_chunk_fused(env)
    out = []

    def dispatch(start: int, key):
        # always dispatch a FULL chunk (a ragged tail would recompile the
        # whole-episode program for the leftover size — minutes of compile
        # for a few episodes); surplus episodes are dropped in collect()
        k_this = min(chunk, episodes - start)
        k_reset, k_act = jax.random.split(key)
        states = jax.vmap(lambda kk: env_reset(env, kk))(
            jax.random.split(k_reset, chunk)
        )
        akeys = jax.random.split(k_act, chunk * env.actions).reshape(
            chunk, env.actions, 2
        )
        actions = jax.vmap(jax.vmap(policy))(akeys)
        return k_this, run_chunk(states, actions)

    def collect(start: int, k_this: int, eps):
        # one batched device->host transfer for the whole chunk (per-episode
        # pulls serialize many small copies through the tunnel)
        eps_host = jax.device_get(eps)
        for j in range(k_this):
            ep = tree_index(eps_host, j)
            if on_episode is not None:
                on_episode(start + j, ep)
            else:
                out.append(ep)

    # depth-1 pipeline: dispatch chunk i+1 (async) before pulling chunk i,
    # so the host transfer overlaps the next chunk's device compute
    pending = None
    done = 0
    while done < episodes:
        key, k = jax.random.split(key)
        k_this, eps = dispatch(done, k)
        if pending is not None:
            collect(*pending)
        pending = (done, k_this, eps)
        done += k_this
    if pending is not None:
        collect(*pending)
    return out


def generate_episodes_batch(env: WaveEnv, policy, key: jax.Array, batch: int):
    """vmap-batched episode generation: `batch` independent episodes
    (random designs/sources/actions) in one device program. Returns an
    Episode pytree with an extra leading batch axis on every leaf."""
    k_reset, k_actions = jax.random.split(key)
    states = jax.vmap(lambda k: env_reset(env, k))(jax.random.split(k_reset, batch))
    akeys = jax.random.split(k_actions, batch * env.actions).reshape(
        batch, env.actions, 2
    )
    actions = jax.vmap(jax.vmap(policy))(akeys)
    return jax.vmap(lambda s, a: _episode_scan(env, s, a), in_axes=(0, 0))(
        states, actions
    )


def split_episode_batch(batched) -> list:
    """Split a batched (final_state, Episode) into a list of Episodes."""
    _, eps = batched
    n = eps.s_wave.shape[0]
    return [tree_index(eps, i) for i in range(n)]


def prepare_data(episode: Episode, horizon: int, stride: int = 1):
    """Sliding-window horizon batching (reference `prepare_data`,
    `src/data.jl:35-58`).

    ``stride`` subsamples the joined time grid by keeping every stride-th
    point (action boundaries are preserved when stride divides the window
    step count) — the training view for coarse-latent-dt surrogates
    (`AcousticEnergyModel.create(dt=stride*env_dt,
    integration_steps=steps//stride)`), which cut the sequential latent
    step count of MPC action selection by the same factor.

    Returns a dict of stacked samples with leading axis
    S = A - horizon + 1:
      s_wave   (S, res, res, 4)
      s_design design pytree (S, ...)
      a        action pytree (S, horizon, ...)
      t        (S, horizon*T//stride + 1) joined tspans
      y        (S, horizon*T//stride + 1, 3) joined signals
    """
    A = len(episode)
    S = A - horizon + 1
    assert S >= 1, f"horizon {horizon} > episode length {A}"
    T = episode.s_tspan.shape[-1] - 1
    assert T % stride == 0, f"stride {stride} must divide window steps {T}"
    idx = jnp.arange(S)

    win = idx[:, None] + jnp.arange(horizon)[None, :]  # (S, horizon)

    s_wave = episode.s_wave[idx]
    s_design = tree_index(episode.s_design, idx)
    a = jax.tree_util.tree_map(lambda x: x[win], episode.a)

    # tspans: (S, horizon, T+1) -> flatten shared endpoints -> (S, horizon*T+1)
    t = flatten_repeated_last_dim(episode.s_tspan[win])
    # signals: (S, horizon, T+1, 3) -> per-channel flatten
    y_win = episode.y[win]  # (S, horizon, T+1, 3)
    y = flatten_repeated_last_dim(jnp.moveaxis(y_win, -1, 1))  # (S, 3, L)
    y = jnp.moveaxis(y, 1, -1)  # (S, L, 3)
    if stride > 1:
        t = t[:, ::stride]
        y = y[:, ::stride]

    return {"s_wave": s_wave, "s_design": s_design, "a": a, "t": t, "y": y}


def concat_datasets(datasets: list[dict]) -> dict:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *datasets
    )


def num_samples(data: dict) -> int:
    return data["s_wave"].shape[0]


def dataloader(data: dict, batch_size: int, key: jax.Array, drop_last: bool = True):
    """Shuffled minibatch iterator over a prepared dataset."""
    n = num_samples(data)
    perm = jax.random.permutation(key, n)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(n_batches):
        idx = perm[b * batch_size : (b + 1) * batch_size]
        yield jax.tree_util.tree_map(lambda x: x[idx], data)


# ---------------------------------------------------------------------------
# Storage (npz of named leaves; reference uses BSON)
# ---------------------------------------------------------------------------


_STRUCT_KEY = "__structure__"


def _flatten_named(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def _named_with_structure(episode: Episode) -> dict:
    """Leaf arrays + the JSON structure descriptor (float32-encoded bytes:
    the native store is float32-only). Single definition shared by every
    episode writer so readers and writers cannot drift."""
    import json

    named = _flatten_named(episode)
    desc = json.dumps(encode_structure(episode)).encode()
    named[_STRUCT_KEY] = np.frombuffer(desc, dtype=np.uint8).astype(np.float32)
    return named


def _load_episode_cloak_fallback(data, as_arr, path: str) -> Episode:
    """Pre-descriptor files (round-1 datasets) stored standard Cloak
    episodes; rebuild that structure explicitly."""
    from .designs import AdjustableRadiiScatterers, Cloak, Cylinders

    def cloak(prefix):
        return Cloak(
            config=AdjustableRadiiScatterers(
                Cylinders(
                    pos=as_arr(data[prefix + ".config.cylinders.pos"]),
                    r=as_arr(data[prefix + ".config.cylinders.r"]),
                    c=as_arr(data[prefix + ".config.cylinders.c"]),
                )
            ),
            core=Cylinders(
                pos=as_arr(data[prefix + ".core.pos"]),
                r=as_arr(data[prefix + ".core.r"]),
                c=as_arr(data[prefix + ".core.c"]),
            ),
        )

    try:
        return Episode(
            s_wave=as_arr(data[".s_wave"]),
            s_design=cloak(".s_design"),
            s_tspan=as_arr(data[".s_tspan"]),
            a=cloak(".a"),
            y=as_arr(data[".y"]),
        )
    except KeyError as e:
        raise ValueError(
            f"{path} has no structure descriptor and is not a standard "
            "Cloak episode; pass a `like=` template Episode"
        ) from e


def save_episode(episode: Episode, path: str):
    """Save an episode. `.wbin` uses the native mmap'd binary store
    (native/episode_store.cpp, ~10x faster than compressed npz); any other
    extension uses npz.

    A JSON structure descriptor (`encode_structure`) is stored alongside the
    leaves so `load_episode` can rebuild the design/action pytrees of ANY
    registered design family — the reference gets this from BSON's Julia
    type tags (`src/data.jl:60-71`). Encoded as a float32 byte array because
    the native store is float32-only.
    """
    named = _named_with_structure(episode)
    if path.endswith(".wbin"):
        from .native import save_bundle

        if save_bundle(path, named):
            return
        path = path[: -len(".wbin")] + ".npz"  # toolchain-less fallback
    np.savez_compressed(path, **named)


def load_episode(path: str, like: Episode | None = None, device: bool = True) -> Episode:
    """Load an episode saved by `save_episode`. The stored structure
    descriptor reconstructs any registered design family; `like` overrides it
    as a structural template (also the only path for pre-descriptor files).

    ``device=False`` keeps leaves as host numpy arrays — bulk loaders should
    use it and upload once (per-leaf jnp.asarray over hundreds of episodes
    is hundreds of small host->device transfers).
    """
    import json

    if path.endswith(".wbin"):
        from .native import load_bundle

        data = load_bundle(path)
        if data is None:
            raise IOError("native episode store unavailable (no g++?)")
    else:
        data = np.load(path)
    as_arr = jnp.asarray if device else np.asarray
    if like is None:
        if _STRUCT_KEY not in data:
            return _load_episode_cloak_fallback(data, as_arr, path)
        desc = json.loads(
            bytes(np.asarray(data[_STRUCT_KEY]).astype(np.uint8)).decode()
        )
        return decode_structure(desc, lambda k: as_arr(data[k]))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    named = _flatten_named(like)
    keys = list(named.keys())
    new_leaves = [as_arr(data[k]) for k in keys]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def prepare_dataset(episodes: list[Episode], horizon: int, stride: int = 1) -> dict:
    """Window a homogeneous list of episodes into one training dict in ONE
    device program: stack on host, upload once, vmapped `prepare_data`,
    flatten (E, S, ...) -> (E*S, ...). Replaces per-episode prepare+concat
    (2 small dispatches per device op per episode — minutes of pure dispatch
    latency at 500 episodes)."""
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *episodes)
    stacked = jax.device_put(stacked)

    @jax.jit
    def prep(eps):
        data = jax.vmap(lambda ep: prepare_data(ep, horizon, stride))(eps)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), data
        )

    return prep(stacked)


def save_episodes_shard(path: str, episodes: list[Episode]):
    """Stream a list of episodes into ONE native shard file (see
    native/dataset_shard.cpp); structure descriptor embedded per episode."""
    shard = open_episodes_shard(path)
    for ep in episodes:
        shard.append(ep)
    shard.finish()


def open_episodes_shard(path: str):
    """Incremental shard writer for datagen pipelines: returns an object
    with .append(episode) / .finish()."""
    from .native import ShardWriter

    wtr = ShardWriter(path)

    class _EpisodeShard:
        def append(self, ep: Episode):
            return wtr.append(_named_with_structure(ep))

        def finish(self):
            wtr.finish()

    return _EpisodeShard()


def load_episodes_shard(path: str, device: bool = False,
                        limit: int | None = None) -> list[Episode]:
    """Load episodes from a native shard (one mmap, zero-copy reads).
    `limit` stops after the first N episodes without copying the rest out
    of the map."""
    import json

    from .native import load_shard

    bundles = load_shard(path, limit=limit)
    if bundles is None:
        raise IOError("native shard store unavailable (no g++?)")
    as_arr = jnp.asarray if device else np.asarray
    out = []
    for data in bundles:
        desc = json.loads(
            bytes(np.asarray(data[_STRUCT_KEY]).astype(np.uint8)).decode()
        )
        out.append(decode_structure(desc, lambda k: as_arr(data[k])))
    return out
