"""Multi-object track table — the persistence layer of perception.

The reference delegates tracking to ultralytics' `model.track(persist=True)`
(`obstacle_handling/human_tracking.py:208-213`) and keys markers by track id
with explicit DELETE for vanished tracks (`:321-358`).  This module provides
the framework-native equivalent for *any* detector's centers: a fixed-size
struct-of-arrays track table with nearest-neighbor gating association, an
alpha-beta (g-h) filter for position/velocity, age/miss counters, and an
export to `ObstacleSet` so tracked humans become the solver's dynamic
obstacles (the wiring the reference leaves to ROS topics, SURVEY.md L6).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..obstacles import HUMAN_RADIUS, ObstacleSet


class TrackTable(NamedTuple):
    position: jax.Array  # [T, 2]
    velocity: jax.Array  # [T, 2]
    age: jax.Array  # [T] int32 ticks since birth
    misses: jax.Array  # [T] int32 consecutive unmatched ticks
    hits: jax.Array  # [T] int32 total matches
    active: jax.Array  # [T] bool
    next_id: jax.Array  # scalar int32 (monotone track id counter)
    track_id: jax.Array  # [T] int32


class TrackerConfig(NamedTuple):
    gate_distance: float = 0.8  # max association distance (m)
    alpha: float = 0.5  # position correction gain
    beta: float = 0.3  # velocity correction gain
    max_misses: int = 5  # retire after this many unmatched ticks
    min_hits: int = 2  # report only after this many matches


def init_tracks(capacity: int, dtype=jnp.float32) -> TrackTable:
    T = capacity
    return TrackTable(
        position=jnp.zeros((T, 2), dtype),
        velocity=jnp.zeros((T, 2), dtype),
        age=jnp.zeros((T,), jnp.int32),
        misses=jnp.zeros((T,), jnp.int32),
        hits=jnp.zeros((T,), jnp.int32),
        active=jnp.zeros((T,), bool),
        next_id=jnp.zeros((), jnp.int32),
        track_id=jnp.full((T,), -1, jnp.int32),
    )


def update(
    cfg: TrackerConfig,
    tracks: TrackTable,
    detections: jax.Array,  # [D, 2] centers
    det_mask: jax.Array,  # [D] validity
    dt: float,
) -> TrackTable:
    """One tracker tick: predict, associate (greedy NN with gating), correct,
    spawn, retire.  Fixed shapes throughout (capacity T, detections D)."""
    T = tracks.position.shape[0]
    D = detections.shape[0]
    dtype = tracks.position.dtype

    # Predict.
    pred = tracks.position + tracks.velocity * dt

    # Pairwise distances track x detection, gated.
    diff = pred[:, None, :] - detections[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    feasible = (
        tracks.active[:, None] & det_mask[None, :] & (dist <= cfg.gate_distance)
    )
    INF = jnp.asarray(1e9, dtype)
    cost = jnp.where(feasible, dist, INF)

    # Greedy one-to-one assignment: T rounds of global argmin.
    def assign_body(i, carry):
        cost_m, t_of_d = carry
        # int32 explicitly: under x64 argmin yields int64, and an int64
        # value scattered into the int32 t_of_d is a FutureWarning today
        # and an error in future JAX.
        flat = jnp.argmin(cost_m).astype(jnp.int32)
        t, d = flat // D, flat % D
        ok = cost_m[t, d] < INF
        t_of_d = jnp.where(ok, t_of_d.at[d].set(t), t_of_d)
        cost_m = jnp.where(
            ok,
            cost_m.at[t, :].set(INF).at[:, d].set(INF),
            cost_m,
        )
        return cost_m, t_of_d

    t_of_d0 = jnp.full((D,), -1, jnp.int32)
    _, t_of_d = jax.lax.fori_loop(
        0, min(T, D), assign_body, (cost, t_of_d0)
    )
    matched_d = t_of_d >= 0
    # d_of_t: inverse mapping (-1 = unmatched track)
    d_of_t = jnp.full((T,), -1, jnp.int32)
    d_idx = jnp.arange(D, dtype=jnp.int32)
    d_of_t = d_of_t.at[jnp.where(matched_d, t_of_d, jnp.int32(T))].set(
        jnp.where(matched_d, d_idx, jnp.int32(-1)), mode="drop"
    )
    matched_t = d_of_t >= 0

    # Correct matched tracks (alpha-beta filter).
    det_for_t = detections[jnp.clip(d_of_t, 0, D - 1)]
    residual = det_for_t - pred
    new_pos = jnp.where(
        matched_t[:, None], pred + cfg.alpha * residual, pred
    )
    new_vel = jnp.where(
        matched_t[:, None],
        tracks.velocity + (cfg.beta / dt) * residual,
        tracks.velocity,
    )

    misses = jnp.where(matched_t, 0, tracks.misses + 1)
    hits = tracks.hits + matched_t.astype(jnp.int32)
    age = tracks.age + 1
    active = tracks.active & (misses <= cfg.max_misses)

    # Spawn new tracks for unmatched detections into free slots.
    unmatched_d = det_mask & ~matched_d
    free_slot = ~active
    # rank unmatched detections and free slots
    slot_order = jnp.cumsum(free_slot.astype(jnp.int32)) - 1  # slot rank
    det_order = jnp.cumsum(unmatched_d.astype(jnp.int32)) - 1  # det rank
    num_free = jnp.sum(free_slot)

    # For each slot, which detection rank goes there (if any)?
    def spawn(carry, t):
        pos, vel, act, mis, hts, ag, tid, nid = carry
        is_free = free_slot[t]
        rank = slot_order[t]
        # find detection with det_order == rank and unmatched
        want = unmatched_d & (det_order == rank)
        has = jnp.any(want)
        d = jnp.argmax(want)
        do_spawn = is_free & has
        pos = jnp.where(do_spawn, pos.at[t].set(detections[d]), pos)
        vel = jnp.where(do_spawn, vel.at[t].set(jnp.zeros(2, dtype)), vel)
        act = jnp.where(do_spawn, act.at[t].set(True), act)
        mis = jnp.where(do_spawn, mis.at[t].set(0), mis)
        hts = jnp.where(do_spawn, hts.at[t].set(1), hts)
        ag = jnp.where(do_spawn, ag.at[t].set(0), ag)
        tid = jnp.where(do_spawn, tid.at[t].set(nid), tid)
        nid = jnp.where(do_spawn, nid + 1, nid)
        return (pos, vel, act, mis, hts, ag, tid, nid), None

    (new_pos, new_vel, active, misses, hits, age, track_id, next_id), _ = (
        jax.lax.scan(
            spawn,
            (new_pos, new_vel, active, misses, hits, age, tracks.track_id,
             tracks.next_id),
            jnp.arange(T),
        )
    )

    return TrackTable(
        position=new_pos,
        velocity=new_vel,
        age=age,
        misses=misses,
        hits=hits,
        active=active,
        next_id=next_id,
        track_id=track_id,
    )


def confirmed(cfg: TrackerConfig, tracks: TrackTable) -> jax.Array:
    """[T] bool: tracks stable enough to report (min_hits reached)."""
    return tracks.active & (tracks.hits >= cfg.min_hits)


def to_obstacles(
    cfg: TrackerConfig, tracks: TrackTable, radius: float = HUMAN_RADIUS
) -> ObstacleSet:
    """Confirmed tracks -> dynamic ObstacleSet for the solver.

    Heading/speed come from the filtered velocity (the reference's
    `DynamicObstacle` carries orientation + linear velocity,
    `obstacle_handling/dynamic_obstacle.py:8`)."""
    ok = confirmed(cfg, tracks)
    speed = jnp.linalg.norm(tracks.velocity, axis=-1)
    heading = jnp.arctan2(tracks.velocity[:, 1], tracks.velocity[:, 0])
    dtype = tracks.position.dtype
    return ObstacleSet(
        position=tracks.position,
        radius=jnp.full(tracks.position.shape[:1], radius, dtype),
        orientation=jnp.where(ok, heading, 0.0).astype(dtype),
        linear_velocity=jnp.where(ok, speed, 0.0).astype(dtype),
        angular_velocity=jnp.zeros_like(speed).astype(dtype),
        active=ok.astype(dtype),
    )
