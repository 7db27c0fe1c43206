"""Convex NMF (Ding, Li & Jordan 2010): V ~ (V G) H with G, H >= 0.

TPU-native re-design of convexnmf.m.  The n-by-n Gram V'V is computed
once and split into positive/negative parts (convexnmf.m:86-87); the MU
updates are re-associated so no extra n-by-n intermediate beyond the
Grams is materialized:

    (VV_neg @ G @ H) @ H'  ->  (VV_neg @ G) @ (H @ H')

(identical math, fewer FLOPs and far less HBM traffic at large n).

Compat note (COMPAT.md): the reference's default G_init references
undefined variables (convexnmf.m:69-71) and errors unless the caller
supplies G_init.  The default here is the paper's init — G from the
kmeans indicator matrix, G = indicator * diag(1/cluster_sizes) — which is
what the shared ValidateParameters computes as 'W_init' for this
algorithm (ValidateParameters.m:105-109).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import common_scalars, Result, merge_config, resolve_dtype
from ..ops import loop as looplib
from ..ops.gram import pos_neg_split
from ..ops.masking import col_mask
from ..ops.normalize import unit_sum_columns
from ..utils.init import kmeans_indicator_h
from ..parallel import apply_placements, pad_axes, plan_padding


class _Spec(NamedTuple):
    maxiter: int
    g_fixed: bool
    h_fixed: bool
    n_valid: int = None  # true n of a mesh-padded problem


@functools.lru_cache(maxsize=None)
def _build_solver(spec: _Spec):
    @jax.jit
    def solve(V, G0, H0, g_sparsity, tolerance):
        VtV = V.T @ V  # one-time n-by-n Gram (convexnmf.m:86-87)
        vv_pos, vv_neg = pos_neg_split(VtV)
        v_sq = jnp.trace(VtV)
        # Pad rows of G / pad columns of H have 0/0 sqrt-MU ratios (the
        # reference's updates are unguarded); pin them to zero.
        cmask = col_mask(V.shape[1], spec.n_valid)

        def masked(ratio, colwise: bool):
            if cmask is None:
                return ratio
            sel = cmask[None, :] if colwise else cmask[:, None]
            return jnp.where(sel, ratio, jnp.zeros((), ratio.dtype))

        def step(carry, i):
            G, H = carry
            if not spec.g_fixed:
                HHt = H @ H.T
                # ((VV_pos + VV_neg G H) H') -> VV_pos H' + (VV_neg G)(H H')
                pG = vv_pos @ H.T + (vv_neg @ G) @ HHt
                nG = vv_neg @ H.T + (vv_pos @ G) @ HHt
                G = G * jnp.sqrt(masked(pG / (nG + g_sparsity), False))  # convexnmf.m:94
                G = unit_sum_columns(G)                   # convexnmf.m:95
            if not spec.h_fixed:
                GtVV_pos = G.T @ vv_pos
                GtVV_neg = G.T @ vv_neg
                GtG = G.T @ G
                # G'(VV_pos + VV_neg G H) -> (G'VV_pos) + (G'VV_neg G) H
                pH = GtVV_pos + (GtVV_neg @ G) @ H
                nH = GtVV_neg + (GtVV_pos @ G) @ H
                H = H * jnp.sqrt(masked(pH / nH, True))   # convexnmf.m:101
            # cost 0.5||V - V G H||^2 in Gram form (k-by-k only):
            # = 0.5(tr(V'V) - 2 tr(H' G' V'V) + tr((G' V'V G)(H H')))
            VtVG = VtV @ G
            c = jnp.maximum(  # clamp: see ops/gram.euclidean_cost_gram
                0.5 * (v_sq - 2.0 * jnp.sum(VtVG * H.T)
                       + jnp.sum((G.T @ VtVG) * (H @ H.T))), 0.0)
            return (G, H), c, jnp.asarray(False)

        return looplib.run(step, (G0, H0), spec.maxiter, tolerance,
                           cost_dtype=V.dtype)
    return solve


def convexnmf(V, num_basis_elems: int, config: dict | None = None, **kwargs):
    """Convex NMF; V may be mixed-sign.  Returns Result as (W, H, G, cost)
    with W = V @ G (convexnmf.m:84,97).

    Parameters: G_init (n, k), H_init (k, n), G_sparsity, G_fixed, H_fixed,
    maxiter (100), tolerance (1e-3).  Extras: dtype, seed.
    """
    cfg = merge_config(config, kwargs)
    dtype = resolve_dtype(V, cfg.get("dtype"))
    V = jnp.asarray(V, dtype)
    m, n = V.shape
    k = int(num_basis_elems)

    maxiter, tolerance, _, key = common_scalars(cfg)
    g_sparsity = max(float(cfg.get("G_sparsity", 0.0) or 0.0), 0.0)

    compat = str(cfg.get("compat", "paper"))
    if compat not in ("paper", "reference"):
        raise ValueError(f"compat must be 'paper' or 'reference', got {compat!r}")
    H0 = cfg.get("H_init")
    G0 = cfg.get("G_init")
    if G0 is None and compat == "reference":
        # The reference's default G_init references undefined variables
        # (convexnmf.m:69-71) and always errors; reproduce that contract.
        raise ValueError(
            "compat='reference': convexnmf requires an explicit G_init "
            "(the reference's default at convexnmf.m:69-71 references "
            "undefined variables and errors)")
    if H0 is None or G0 is None:
        Hk = kmeans_indicator_h(key, V, k, dtype)  # indicator + 0.2
        if H0 is None:
            H0 = Hk
        if G0 is None:
            # Reference init (ValidateParameters.m:105-109):
            # G = H_init' * diag(1 ./ cluster_sizes) where the NUMERATOR is
            # the offset indicator H_init (strictly positive — exact zeros
            # would be frozen forever by the multiplicative update) and the
            # cluster sizes come from the un-offset indicator.
            ind = Hk - 0.2
            G0 = Hk.T / jnp.maximum(jnp.sum(ind, axis=1)[None, :], 1.0)
    G0 = unit_sum_columns(jnp.asarray(G0, dtype))  # convexnmf.m:83
    H0 = jnp.asarray(H0, dtype)

    mesh = cfg.get("mesh")
    pad_m, pad_n, valid = plan_padding(mesh, m, n)
    if valid is not None:
        V = pad_axes(V, {0: pad_m, 1: pad_n})
        G0 = pad_axes(G0, {0: pad_n})  # G is (n, k): rows follow samples
        H0 = pad_axes(H0, {1: pad_n})
    V, G0, H0 = apply_placements(mesh, "convexnmf", V=V, G=G0, H=H0)

    spec = _Spec(maxiter, bool(cfg.get("G_fixed", False)),
                 bool(cfg.get("H_fixed", False)),
                 None if valid is None else n)
    out = _build_solver(spec)(V, G0, H0, jnp.asarray(g_sparsity, dtype),
                              jnp.asarray(tolerance, dtype))
    G, H = out.state
    if valid is not None:
        G, H = G[:n], H[:, :n]
        V = V[:m, :n]
    W = np.asarray(V @ G)
    return Result(fields=("W", "H", "G", "cost"),
                  W=W, H=np.asarray(H), G=np.asarray(G),
                  cost=looplib.trim_cost(out, maxiter),
                  n_iters=int(out.n_iters), converged=bool(out.stopped))
