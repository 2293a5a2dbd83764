"""MRF disparity optimization over the K+1-label hypothesis volume.

The reference optionally runs Middlebury TRW-S over K=9 depth hypotheses
plus an "unknown" label with Campbell et al.'s costs (multiviewstereo.cpp:
481-516, 610-651, USE_MRF builds):

  data:       label < K:  LAMBDA * exp(-BETA * ncc)   (LAMBDA if no peak)
              label = K:  PHIU
  smoothness: both unknown 0; one unknown PSIU; invalid peaks 2*PSIU;
              else 2|z1 - z2| / (z1 + z2)

TPU-native design: sequential TRW-S does one raster pass per iteration —
inherently serial.  Here the same objective is minimized with synchronous
min-sum message passing with message damping (a parallel TRW variant): all
four directed message fields update in lockstep as [H, W, L, L] tensor ops,
iterated under ``lax.scan`` until the reference's stopping rule
(energy drop <= 5 or 50 iterations) — evaluated on the same energy.

Also provides the two-view graph-cut path's energy model (truncated linear
label smoothness, twoviewstereo.cpp:340) through ``linear_label_costs``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import MultiViewConfig


def campbell_data_cost(top_ncc, top_depth, cfg: MultiViewConfig):
    """[K+1, H, W] data volume from the top-K (ncc, depth) peaks."""
    lam, beta, phi_u = cfg.lam, cfg.beta, cfg.phi_u
    valid = top_depth >= 0
    d = jnp.where(valid, lam * jnp.exp(-beta * top_ncc), lam)
    unknown = jnp.full_like(d[:1], phi_u)
    return jnp.concatenate([d, unknown], axis=0)


def campbell_pairwise(z1, z2, cfg: MultiViewConfig):
    """Smoothness between two depth-label vectors.

    z1: [L1...], z2: [L2...] broadcastable; the last label (index L-1) is
    "unknown" and must be handled by the caller via masks — this computes
    the depth-difference term for real labels.
    """
    psi_u = cfg.psi_u
    invalid = (z1 < 0) | (z2 < 0)
    v = 2.0 * jnp.abs(z1 - z2) / jnp.maximum(z1 + z2, 1e-10)
    return jnp.where(invalid, 2.0 * psi_u, v)


def _pairwise_tensor(depths, cfg: MultiViewConfig, shift, axis):
    """V[p, l_p, l_q] between each pixel and its shifted neighbor.

    depths: [K, H, W] hypothesis depths. Returns [H, W, L, L] with
    L = K + 1 (unknown last).
    """
    K = depths.shape[0]
    z_p = depths                                       # [K, H, W]
    z_q = jnp.roll(depths, shift=-shift, axis=axis + 1)
    v = campbell_pairwise(z_p[:, None], z_q[None, :], cfg)  # [K, K, H, W]
    psi_u = cfg.psi_u
    h, w = depths.shape[1:]
    L = K + 1
    V = jnp.full((L, L, h, w), psi_u, v.dtype)
    V = V.at[:K, :K].set(v)
    V = V.at[K, K].set(0.0)
    return jnp.moveaxis(V, (0, 1), (2, 3))             # [H, W, L, L]


class MRFResult(NamedTuple):
    labels: jnp.ndarray        # [H, W] int32
    energy: jnp.ndarray        # [] final energy
    energies: jnp.ndarray      # [iters] energy trace


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def trws_optimize(top_ncc, top_depth, cfg: MultiViewConfig,
                  max_iters: int = 50, damping: float = 0.5):
    """Minimize the Campbell MRF over the hypothesis volume.

    top_ncc/top_depth: [K, H, W].  Returns MRFResult; ``labels == K`` means
    "unknown".  The stopping rule matches the reference loop (stop when the
    energy improvement <= cfg.mrf_energy_eps); iterations past that point
    freeze the state inside the fixed-length scan.
    """
    K = top_ncc.shape[0]
    L = K + 1
    h, w = top_ncc.shape[1:]

    D = jnp.moveaxis(campbell_data_cost(top_ncc, top_depth, cfg),
                     0, -1)                            # [H, W, L]

    # Directed pairwise tensors: neighbor order (up, down, left, right)
    dirs = ((-1, 0), (1, 0), (0, -1), (0, 1))
    V = jnp.stack([
        _pairwise_tensor(top_depth, cfg, shift=s, axis=a)
        for (s, a) in ((-1, 0), (1, 0), (-1, 1), (1, 1))
    ])                                                 # [4, H, W, L, L]

    def shift_msg(m, d):
        """Message sent along direction d arrives from direction -d."""
        s, a = ((-1, 0), (1, 0), (0, -1), (0, 1))[d]
        return jnp.roll(m, shift=(s, 0) if a == 0 else (0, s),
                        axis=(0, 1))

    def beliefs(msgs):
        return D + jnp.sum(msgs, axis=0)               # [H, W, L]

    def energy_of(msgs):
        lab = jnp.argmin(beliefs(msgs), axis=-1)       # [H, W]
        e_data = jnp.sum(jnp.take_along_axis(D, lab[..., None],
                                             -1)[..., 0])
        # horizontal + vertical edges with valid rolls only
        lab_oh = jax.nn.one_hot(lab, L, dtype=D.dtype)
        e_sm = 0.0
        # right neighbor
        Vr = V[3]
        pair = jnp.einsum("hwl,hwlm,hwm->hw", lab_oh, Vr,
                          jnp.roll(lab_oh, -1, axis=1))
        e_sm += jnp.sum(pair[:, :-1])
        Vd = V[1]
        pair = jnp.einsum("hwl,hwlm,hwm->hw", lab_oh, Vd,
                          jnp.roll(lab_oh, -1, axis=0))
        e_sm += jnp.sum(pair[:-1, :])
        return e_data + e_sm, lab

    msgs0 = jnp.zeros((4, h, w, L), D.dtype)

    def step(msgs):
        # min-sum updates, synchronous, all directions at once
        belief = D + jnp.sum(msgs, axis=0)             # [H, W, L]
        new = []
        for d in range(4):
            opp = {0: 1, 1: 0, 2: 3, 3: 2}[d]
            excl = belief - msgs[opp]                  # exclude incoming
            m = jnp.min(excl[..., :, None] + V[d], axis=-2)  # [H, W, L]
            m = m - jnp.mean(m, axis=-1, keepdims=True)      # normalize
            new.append(m)
        sent = jnp.stack(new)                          # [4, H, W, L]
        # messages arrive at the neighbor: shift each field
        arrived = jnp.stack([shift_msg(sent[d], d) for d in range(4)])
        return damping * msgs + (1 - damping) * arrived

    # EARLY-EXIT while_loop (round 5): the reference stops when the
    # energy improvement <= eps (multiviewstereo.cpp:610-651); the old
    # fixed-length scan kept paying all max_iters after convergence —
    # the bunny run converges in ~10-15 iterations.
    init_e, _ = energy_of(msgs0)
    trace0 = jnp.full((max_iters,), jnp.nan, D.dtype)

    def cond(carry):
        _, prev_e, it, _, done = carry
        return (it < max_iters) & ~done

    def body(carry):
        msgs, prev_e, it, trace, _ = carry
        msgs_new = step(msgs)
        e, _ = energy_of(msgs_new)
        done = prev_e - e <= cfg.mrf_energy_eps
        return (msgs_new, jnp.minimum(e, prev_e), it + 1,
                trace.at[it].set(e), done)

    msgs, _, _, trace, _ = lax.while_loop(
        cond, body, (msgs0, init_e, jnp.int32(0), trace0,
                     jnp.asarray(False)))
    e, lab = energy_of(msgs)
    # pad the unused tail with the final energy (consumers read the
    # trace as "energy per iteration, frozen after convergence")
    trace = jnp.where(jnp.isnan(trace), e, trace)
    return MRFResult(labels=lab.astype(jnp.int32), energy=e,
                     energies=trace)


def labels_to_depth(labels, top_depth):
    """Reference label decode (multiviewstereo.cpp:643-651): unknown -> inf,
    negative peak depth -> inf."""
    K = top_depth.shape[0]
    depth = jnp.take_along_axis(
        jnp.concatenate([top_depth,
                         jnp.full_like(top_depth[:1], -1.0)], axis=0),
        labels[None], axis=0)[0]
    return jnp.where((labels == K) | (depth <= 0), jnp.inf, depth)


def linear_label_costs(num_labels: int, smoothness_exp: int,
                       smoothness_max: float, smoothness_lambda: float):
    """Two-view MRF smoothness table (twoviewstereo.cpp:340):
    lambda * min(|l1 - l2|^exp, max)."""
    l1 = jnp.arange(num_labels)[:, None]
    l2 = jnp.arange(num_labels)[None, :]
    d = jnp.abs(l1 - l2).astype(jnp.float32) ** smoothness_exp
    return smoothness_lambda * jnp.minimum(d, smoothness_max)


def _truncated_linear_dt(h, lam, cap):
    """min-sum message for truncated-linear smoothness in O(L):
    out[l] = min_k h[k] + lam*min(|k-l|, cap)  via two cummin passes +
    truncation (Felzenszwalb-Huttenlocher distance transform), closed-form
    over the label axis (axis 0)."""
    L = h.shape[0]
    lv = lam * jnp.arange(L, dtype=h.dtype).reshape(
        (L,) + (1,) * (h.ndim - 1))
    fwd = lv + jax.lax.cummin(h - lv, axis=0)
    bwd = -lv + jax.lax.cummin(h + lv, axis=0, reverse=True)
    out = jnp.minimum(fwd, bwd)
    return jnp.minimum(out, jnp.min(h, axis=0, keepdims=True) + lam * cap)


@functools.partial(jax.jit,
                   static_argnames=("smoothness_exp", "max_iters"))
def twoview_bp(costs, *, smoothness_lambda: float = 0.25,
               smoothness_max: float = 2.0, smoothness_exp: int = 1,
               max_iters: int = 50, energy_eps: float = 5.0,
               damping: float = 0.5):
    """Dense-label MRF over a two-view cost volume.

    The reference's USE_MRF path runs graph-cut Expansion over the dense
    [labels x pixels] cost volume with truncated-linear smoothness
    (twoviewstereo.cpp:335-403).  Here: synchronous min-sum BP with the
    closed-form truncated-linear distance transform — each direction's
    message update is O(L) tensor work, fully parallel.

    costs: [D, H, W] (inf = invalid sample).  Returns (labels [H, W] int32,
    energy trace).  Matches the reference's stopping rule (dE <= 5, <= 50
    iterations).
    """
    lam = smoothness_lambda
    cap = smoothness_max if smoothness_exp == 1 else smoothness_max
    D_, h, w = costs.shape
    # inf costs break the distance transform: clamp to a large finite value
    big = 10.0 * 1000.0
    Dv = jnp.moveaxis(jnp.minimum(costs, big), 0, -1)     # [H, W, L]

    def shift_msg(m, d):
        s, a = ((-1, 0), (1, 0), (0, -1), (0, 1))[d]
        return jnp.roll(m, shift=(s, 0) if a == 0 else (0, s), axis=(0, 1))

    def energy_of(msgs):
        lab = jnp.argmin(Dv + jnp.sum(msgs, axis=0), axis=-1)
        e_data = jnp.sum(jnp.take_along_axis(Dv, lab[..., None], -1))
        dlab = lab.astype(jnp.float32)
        sm_r = lam * jnp.minimum(
            jnp.abs(dlab[:, 1:] - dlab[:, :-1]) ** smoothness_exp, cap)
        sm_d = lam * jnp.minimum(
            jnp.abs(dlab[1:, :] - dlab[:-1, :]) ** smoothness_exp, cap)
        return e_data + jnp.sum(sm_r) + jnp.sum(sm_d), lab

    msgs0 = jnp.zeros((4,) + Dv.shape, Dv.dtype)

    def body(carry, _):
        msgs, prev_e, done = carry
        belief = Dv + jnp.sum(msgs, axis=0)
        new = []
        for d in range(4):
            opp = {0: 1, 1: 0, 2: 3, 3: 2}[d]
            excl = belief - msgs[opp]
            m = jnp.moveaxis(
                _truncated_linear_dt(jnp.moveaxis(excl, -1, 0), lam, cap),
                0, -1)
            m = m - jnp.mean(m, axis=-1, keepdims=True)
            new.append(m)
        arrived = jnp.stack([shift_msg(new[d], d) for d in range(4)])
        msgs_new = damping * msgs + (1 - damping) * arrived
        msgs_new = jnp.where(done, msgs, msgs_new)
        e, _ = energy_of(msgs_new)
        done_new = done | (prev_e - e <= energy_eps)
        return (msgs_new, jnp.minimum(e, prev_e), done_new), e

    init_e, _ = energy_of(msgs0)
    (msgs, _, _), trace = lax.scan(
        body, (msgs0, init_e, jnp.asarray(False)), None, length=max_iters)
    e, lab = energy_of(msgs)
    return lab.astype(jnp.int32), trace
