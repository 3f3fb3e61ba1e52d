"""Multi-stream streaming service: follow B concurrent live performances on
one chip.

The reference follows exactly one performance per process.  On TPU the
banded insert step is a fixed-shape program, so B independent followers
(possibly against different reference recordings, zero-padded to a common
length) batch into ONE vmapped dispatch per frame-step — per-dispatch
overhead and device occupancy amortize across streams, which is what makes
large-scale serving viable (bench: aggregate throughput scales near-linearly
in B).

Per-frame DP recurrences stay stream-local; there is no cross-stream
communication (SURVEY.md §5.8).  Pass ``mesh=corpus_mesh(...)`` to shard the
stream batch over multiple chips: every pytree leaf carries the batch axis,
so partitioning along it needs zero collectives — B/n_chips streams per chip,
one SPMD dispatch per step.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from real_time_audio_sync_tpu.config import OTWParams
from real_time_audio_sync_tpu.models.online_core import (
    OnlineConfig,
    _insert_body,
    init_state,
)


def batch_axis_sharding_put(mesh: Mesh):
    """``device_put`` along ALL mesh axes over the leading (batch) dim — a
    partial spec would silently replicate across the remaining axes of a
    multi-axis mesh.  Accepts numpy arrays directly (no default-device
    materialization)."""
    axes = tuple(mesh.axis_names)
    return lambda x: jax.device_put(
        x, NamedSharding(mesh, P(axes, *(None,) * (np.ndim(x) - 1)))
    )


def require_batch_divisible(mesh: Mesh, b: int) -> None:
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if b % n_dev:
        raise ValueError(
            f"stream count {b} must be divisible by the mesh's {n_dev} "
            f"devices (pad with inactive dummy streams)"
        )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("states",))
def _batched_insert(states, cols, refs, ref_lens, active, cfg: OnlineConfig):
    """One vmapped insert step; ``active=False`` streams are frozen; stop
    conditions use each stream's TRUE reference length."""

    def one(state, col, ref, ref_len, act):
        new = _insert_body(state, col, ref, cfg, ref_len=ref_len, live_cap=2 * ref_len)
        return jax.tree.map(lambda n, o: jnp.where(act, n, o), new, state)

    return jax.vmap(one)(states, cols, refs, ref_lens, active)


class MultiStreamFollower:
    """Follows ``B`` live streams concurrently with one device dispatch per
    step.  API: :meth:`insert` takes one chroma column per stream (use NaNs
    or the ``active`` mask for streams with no new frame this step)."""

    def __init__(self, refs: Sequence[np.ndarray], params, dtype=np.float32,
                 sentinel: float = 1e10, run_count_init: int = 1,
                 monotone_path: bool = False, euclidean: bool = False,
                 mesh: Optional[Mesh] = None):
        p = OTWParams.from_any(params)
        self.cfg = OnlineConfig(
            c=p.c,
            max_run_count=p.max_run_count,
            sentinel=sentinel,
            run_count_init=run_count_init,
            monotone_path=monotone_path,
            euclidean=euclidean,
        )
        self.dtype = np.dtype(dtype)
        refs = [np.asarray(r, self.dtype) for r in refs]
        self.b = len(refs)
        f = refs[0].shape[0]
        n_max = max(r.shape[1] for r in refs)
        if min(r.shape[1] for r in refs) < self.cfg.c:
            raise ValueError("every reference must be at least one band wide")
        # zero-pad refs to a common length; each stream's TRUE length drives
        # its stop conditions inside the step
        self.ref_lens = np.asarray([r.shape[1] for r in refs], np.int32)
        refs_padded = np.zeros((self.b, f, n_max), self.dtype)
        for i, r in enumerate(refs):
            refs_padded[i, :, : r.shape[1]] = r
        # multi-chip: shard the stream batch axis over the mesh — per-stream
        # DP state is chip-local, so the partitioned step needs no
        # collectives (SURVEY.md §5.8)
        self.mesh = mesh
        if mesh is not None:
            require_batch_divisible(mesh, self.b)
            self._put = batch_axis_sharding_put(mesh)
        else:
            # single chip: pass host arrays straight into the jitted call —
            # jit's argument-transfer path beats an explicit device_put by
            # orders of magnitude on relay-attached TPUs
            self._put = lambda x: x

        if mesh is None:
            self.refs = jax.device_put(jnp.asarray(refs_padded))
            self._ref_lens_dev = jax.device_put(jnp.asarray(self.ref_lens))
        else:
            self.refs = self._put(refs_padded)
            self._ref_lens_dev = self._put(self.ref_lens)

        one = init_state(jnp.zeros((f, n_max), self.dtype), self.cfg, self.dtype)
        states = jax.tree.map(lambda x: np.broadcast_to(np.asarray(x), (self.b,) + x.shape).copy(), one)
        self.states = jax.tree.map(self._put if mesh is not None else jax.device_put, states)

    def insert(self, cols: np.ndarray, active: Optional[np.ndarray] = None) -> np.ndarray:
        """Insert one column per stream (B, F).  Returns the per-stream
        stopped flags (a stream stops when its true reference is exhausted)."""
        cols = np.ascontiguousarray(cols, self.dtype)
        if cols.shape[0] != self.b:
            raise ValueError(f"expected {self.b} stream columns, got {cols.shape[0]}")
        if active is None:
            active = np.ones(self.b, bool)
        act = np.asarray(active, bool) & ~self.stopped
        self.states = _batched_insert(
            self.states, self._put(cols), self.refs, self._ref_lens_dev,
            self._put(act), self.cfg,
        )
        return self.stopped

    @property
    def stopped(self) -> np.ndarray:
        return np.asarray(self.states.stopped)

    def paths(self) -> List[np.ndarray]:
        lens = np.asarray(self.states.path_len)
        path = np.asarray(self.states.path)
        return [path[i, : lens[i]] for i in range(self.b)]

    def pointers(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.asarray(self.states.t), np.asarray(self.states.j)
