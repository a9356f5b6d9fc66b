"""Fixed-shape density clustering — the DBSCAN of the perception stack.

The reference clusters each track's LiDAR points with sklearn DBSCAN
(eps 0.08, min_samples 10 — `obstacle_handling/human_tracking.py:126-127,273`)
and takes the largest cluster's mean as the human center (`:276-283`).
sklearn is host-side, dynamic-shaped and sequential; this is the TPU-native
equivalent: a dense radius graph + iterated min-label propagation
(connected components of the core-point graph), all static shapes, jit/vmap
friendly.  Semantics match DBSCAN for label *membership* (cluster identity
values differ; noise = -1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClusterResult(NamedTuple):
    labels: jax.Array  # [P] int32: cluster id (= min point index) or -1
    num_clusters: jax.Array  # scalar int32


def dbscan(
    points: jax.Array,  # [P, D]
    mask: jax.Array,  # [P] bool validity (padding)
    eps: float,
    min_samples: int,
    max_iters: int | None = None,
) -> ClusterResult:
    """Density clustering via label propagation on the eps-radius graph.

    * core point: >= min_samples neighbors within eps (self included, as in
      sklearn);
    * clusters: connected components of core points under the eps graph;
    * border points adopt the label of any core neighbor; others are noise.

    Label propagation over the core-core graph needs at most diameter
    iterations; ``max_iters`` defaults to ceil(log2(P)) doublings using
    min-plus squaring-free simple sweeps (P sweeps worst case is clamped to
    32 — plenty for sensor-scale clouds).
    """
    P = points.shape[0]
    if max_iters is None:
        max_iters = min(32, P)

    d2 = jnp.sum(
        (points[:, None, :] - points[None, :, :]) ** 2, axis=-1
    )  # [P, P]
    valid_pair = mask[:, None] & mask[None, :]
    adj = valid_pair & (d2 <= eps * eps)  # includes self (d2 = 0)
    degree = jnp.sum(adj, axis=1)
    core = mask & (degree >= min_samples)

    # Core-core propagation: label = min reachable core index.
    core_adj = adj & core[:, None] & core[None, :]
    idx = jnp.arange(P, dtype=jnp.int32)
    big = jnp.int32(P)
    labels0 = jnp.where(core, idx, big)

    def body(_, labels):
        # min over core neighbors' labels
        neigh = jnp.where(core_adj, labels[None, :], big)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        return jnp.where(core, new, big)

    core_labels = jax.lax.fori_loop(0, max_iters, body, labels0)

    # Border points: adopt the min core neighbor's label.
    border_neigh = jnp.where(adj & core[None, :], core_labels[None, :], big)
    border_labels = jnp.min(border_neigh, axis=1)
    labels = jnp.where(core, core_labels, border_labels)
    labels = jnp.where(mask & (labels < big), labels, -1)

    is_root = mask & (labels == idx) & (labels >= 0)
    return ClusterResult(
        labels=labels.astype(jnp.int32),
        num_clusters=jnp.sum(is_root).astype(jnp.int32),
    )


def largest_cluster_mean(
    points: jax.Array, result: ClusterResult
) -> tuple[jax.Array, jax.Array]:
    """Mean of the most populous cluster (`human_tracking.py:276-283`).

    Returns (center [D], found bool).  With no clusters, center is zeros and
    found is False.
    """
    P = points.shape[0]
    labels = result.labels
    # count members per candidate root label via one-hot against point index
    idx = jnp.arange(P, dtype=jnp.int32)
    counts = jnp.sum(
        (labels[None, :] == idx[:, None]) & (labels[None, :] >= 0), axis=1
    )  # counts[i] = size of cluster rooted at i
    best_root = jnp.argmax(counts)
    found = counts[best_root] > 0
    member = labels == best_root
    denom = jnp.maximum(jnp.sum(member), 1)
    center = jnp.sum(jnp.where(member[:, None], points, 0.0), axis=0) / denom
    return center, found
