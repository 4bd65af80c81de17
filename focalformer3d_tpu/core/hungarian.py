"""Linear assignment for Hungarian matching, TPU-native.

The reference solves matching on the CPU via scipy with a forced device sync
every sample (/root/reference/projects/mmdet3d_plugin/core/bbox/assigners/
hungarian_assigner.py:143-149). Here there are two backends:

* ``auction`` (default): Bertsekas auction algorithm with epsilon scaling, all
  device-side ``lax.while_loop``s — no host round-trip, vmap/pjit friendly.
* ``scipy``: exact Jonker–Volgenant via ``jax.pure_callback`` (host), for
  parity testing and optional train-time exactness.

Both take a padded cost matrix plus validity masks and return, per *row*
(query), the matched column (gt) index or -1.  Padded columns must carry a
large constant cost (constant-cost columns never change the optimum over the
real columns).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e6


def _auction_single_eps(benefit, col_valid, price, eps, max_iters):
    """One epsilon round of forward auction. Persons = columns (gts),
    objects = rows (queries). benefit: (G, Q) = -(cost.T)."""
    G, Q = benefit.shape
    owner0 = jnp.full((Q,), -1, jnp.int32)  # owning person per object
    person_obj0 = jnp.full((G,), -1, jnp.int32)

    def cond(state):
        person_obj, owner, price, it = state
        unassigned = (person_obj < 0) & col_valid
        return jnp.any(unassigned) & (it < max_iters)

    def body(state):
        person_obj, owner, price, it = state
        unassigned = (person_obj < 0) & col_valid
        values = benefit - price[None, :]  # (G, Q)
        v1 = jnp.max(values, axis=1)
        i1 = jnp.argmax(values, axis=1).astype(jnp.int32)
        values2 = values.at[jnp.arange(G), i1].set(-jnp.inf)
        v2 = jnp.max(values2, axis=1)
        bid_price = price[i1] + (v1 - v2) + eps  # new price offered

        # Winner per object among bidding persons (dense (G, Q) select).
        obj_ids = jnp.arange(Q)[None, :]
        bids = jnp.where(
            (obj_ids == i1[:, None]) & unassigned[:, None],
            bid_price[:, None],
            -jnp.inf,
        )
        win_val = jnp.max(bids, axis=0)  # (Q,)
        win_person = jnp.argmax(bids, axis=0).astype(jnp.int32)
        has_bid = jnp.isfinite(win_val) & (win_val > -jnp.inf)

        # Evict previous owners of re-sold objects.
        new_owner = jnp.where(has_bid, win_person, owner)
        evicted = (owner != new_owner) & (owner >= 0)
        person_obj = person_obj.at[jnp.where(evicted, owner, G)].set(
            -1, mode="drop"
        )
        person_obj = person_obj.at[
            jnp.where(has_bid, new_owner, G)
        ].set(jnp.where(has_bid, obj_ids[0], -1), mode="drop")
        price = jnp.where(has_bid, win_val, price)
        return person_obj, new_owner, price, it + 1

    person_obj, owner, price, _ = jax.lax.while_loop(
        cond, body, (person_obj0, owner0, price, jnp.int32(0))
    )
    return person_obj, owner, price


def auction_assign(
    cost: jax.Array,  # (Q, G)
    row_valid: jax.Array,  # (Q,) bool
    col_valid: jax.Array,  # (G,) bool
    eps_frac: float = 2e-4,
    max_iters: int = 8192,
):
    """Returns (row_to_col (Q,) int32 with -1 for unmatched).

    Single auction round from zero prices.  NOTE: epsilon *scaling* (price
    reuse across shrinking-eps rounds) is intentionally not used — it is
    unsound for asymmetric (Q > G) problems, where leftover prices on objects
    outside the final assignment break the n*eps-optimality bound.  From zero
    prices the assignment is within G*eps of optimal; detection cost matrices
    (well-separated GTs) converge in a handful of Jacobi iterations.
    """
    Q, G = cost.shape
    cost = jnp.where(row_valid[:, None], cost, BIG_COST)
    benefit = -cost.T  # (G, Q)
    scale = jnp.maximum(
        jnp.max(jnp.abs(jnp.where(col_valid[:, None], benefit, 0.0))), 1e-3
    )
    price = jnp.zeros((Q,), cost.dtype)
    eps = scale * eps_frac
    person_obj, owner, price = _auction_single_eps(
        benefit, col_valid, price, eps, max_iters
    )
    # person_obj: per gt the matched query row.
    row_to_col = jnp.full((Q,), -1, jnp.int32)
    gt_ids = jnp.arange(G, dtype=jnp.int32)
    tgt = jnp.where((person_obj >= 0) & col_valid, person_obj, Q)
    row_to_col = row_to_col.at[tgt].set(jnp.where(col_valid, gt_ids, -1), mode="drop")
    return row_to_col


def _scipy_lsa(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=np.float64)
    rows, cols = linear_sum_assignment(cost)
    out = np.full((cost.shape[0],), -1, np.int32)
    out[rows] = cols.astype(np.int32)
    return out


def scipy_assign(cost: jax.Array, row_valid: jax.Array, col_valid: jax.Array):
    """Exact assignment via host callback; same interface as auction_assign."""
    Q, G = cost.shape
    cost = jnp.where(row_valid[:, None], cost, BIG_COST)
    cost = jnp.where(col_valid[None, :], cost, BIG_COST)
    row_to_col = jax.pure_callback(
        _scipy_lsa,
        jax.ShapeDtypeStruct((Q,), jnp.int32),
        cost,
        vmap_method="sequential",
    )
    # Matches against padded columns are background.
    matched_valid = jnp.where(
        row_to_col >= 0, col_valid[jnp.clip(row_to_col, 0, G - 1)], False
    )
    return jnp.where(matched_valid, row_to_col, -1)


@functools.partial(jax.jit, static_argnames=("method",))
def assign(cost, row_valid, col_valid, method: str = "auction"):
    if method == "auction":
        return auction_assign(cost, row_valid, col_valid)
    elif method == "scipy":
        return scipy_assign(cost, row_valid, col_valid)
    raise ValueError(method)
