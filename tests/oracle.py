"""NumPy oracle: direct float64 implementation of the reference's update
equations, used to generate golden trajectories for parity tests
(SURVEY.md section 4 item 1: "a trusted NumPy transliteration checked
against the update equations cited in section 2").

Everything here is deliberately naive/literal — it materializes V_hat,
loops over sources and time shifts — so it is an independent check on the
framework's fused/Gram-form implementations.  Reference equations are
cited per function.
"""
from __future__ import annotations

import numpy as np

EPS = np.finfo(np.float64).eps


def reconstruct(W, H):
    """ReconstructFromDecomposition.m:30-38."""
    if isinstance(W, list):
        W = np.concatenate(W, axis=1)
    if isinstance(H, list):
        H = np.concatenate(H, axis=0)
    if W.ndim == 2:
        return W @ H
    m, k, T = W.shape
    n = H.shape[1]
    V_hat = np.zeros((m, n))
    for t in range(T):
        Hs = np.concatenate([np.zeros((k, t)), H[:, : n - t]], axis=1)
        V_hat += W[:, :, t] @ Hs
    return V_hat


def _w_grads(div, V, V_hat, W, H, alpha, beta):
    """nmf.m:147-167."""
    m, n = V.shape
    if div == "euclidean":
        neg = V @ H.T + W * np.diag(H @ V_hat.T @ W)[None, :]
        pos = V_hat @ H.T + W * np.diag(H @ V.T @ W)[None, :]
    elif div == "kl":
        neg = (V / V_hat) @ H.T + W * np.diag(H @ np.ones((n, m)) @ W)[None, :]
        pos = np.ones((m, n)) @ H.T + W * np.diag(H @ (V.T / V_hat.T) @ W)[None, :]
    elif div == "is":
        neg = (V / V_hat**2) @ H.T + W * np.diag(H @ (np.ones((n, m)) / V_hat.T) @ W)[None, :]
        pos = (np.ones((m, n)) / V_hat) @ H.T + W * np.diag(H @ (V.T / V_hat.T**2) @ W)[None, :]
    else:  # ab
        a, b = alpha, beta
        if a == 0:
            neg = ((V**(a - 1) * V_hat**b) @ H.T
                   + W * np.diag(H @ V.T**(a + b - 1) @ W)[None, :]) ** (1 / b)
            pos = (V**(a + b - 1) @ H.T
                   + W * np.diag(H @ (V**(a - 1) * V_hat**b).T @ W)[None, :]) ** (1 / b)
        else:
            neg = ((V**a * V_hat**(b - 1)) @ H.T
                   + W * np.diag(H @ V_hat.T**(a + b - 1) @ W)[None, :]) ** (1 / a)
            pos = (V_hat**(a + b - 1) @ H.T
                   + W * np.diag(H @ (V**a * V_hat**(b - 1)).T @ W)[None, :]) ** (1 / a)
    return neg, pos


def _h_grads(div, V, V_hat, W, alpha, beta):
    """nmf.m:178-195."""
    m, n = V.shape
    if div == "euclidean":
        return W.T @ V, W.T @ V_hat
    if div == "kl":
        return W.T @ (V / V_hat), W.T @ np.ones((m, n))
    if div == "is":
        return W.T @ (V / V_hat**2), W.T @ (np.ones((m, n)) / V_hat)
    a, b = alpha, beta
    if a == 0:
        return ((W.T @ (V**(a - 1) * V_hat**b)) ** (1 / b),
                (W.T @ V**(a + b - 1)) ** (1 / b))
    return ((W.T @ (V**a * V_hat**(b - 1))) ** (1 / a),
            (W.T @ V_hat**(a + b - 1)) ** (1 / a))


def div_cost(div, V, V_hat, alpha=1.0, beta=1.0):
    """nmf.m:206-215."""
    if div == "euclidean":
        return 0.5 * np.sum((V - V_hat) ** 2)
    if div == "kl":
        return np.sum(V * np.log(V / V_hat) - V + V_hat)
    if div == "is":
        return np.sum(np.log(V_hat / V) + V / V_hat - 1)
    a, b = alpha, beta
    factor = -1.0 / (a * b) if a * b != 0 else -np.inf  # MATLAB 1/0 == Inf
    return factor * np.sum(
        V**a * V_hat**b - (a * V**(a + b) + b * V_hat**(a + b) + b) / (a + b)
    )


def nmf(V, W_init, H_init, divergence="euclidean", alpha=1.0, beta=1.0,
        W_sparsity=None, H_sparsity=None, W_fixed=None, H_fixed=None,
        maxiter=100, tolerance=1e-3):
    """nmf.m:108-234 with injected inits.  W_init/H_init are lists (one per
    source); returns (W_list, H_list, cost)."""
    V = np.asarray(V, np.float64)
    S = len(W_init)
    W = [np.array(w, np.float64) for w in W_init]
    H = [np.array(h, np.float64) for h in H_init]
    wsp = W_sparsity or [0.0] * S
    hsp = H_sparsity or [0.0] * S
    wfx = W_fixed or [False] * S
    hfx = H_fixed or [False] * S
    for s in range(S):
        W[s] = W[s] / np.sqrt(np.sum(W[s] ** 2, axis=0, keepdims=True))
    V_hat = reconstruct(np.concatenate(W, 1), np.concatenate(H, 0))
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        for s in range(S):
            if not wfx[s]:
                neg, pos = _w_grads(divergence, V, V_hat, W[s], H[s], alpha, beta)
                W[s] = W[s] * (neg / np.maximum(pos + wsp[s], EPS))
                W[s] = W[s] / np.sqrt(np.sum(W[s] ** 2, axis=0, keepdims=True))
        V_hat = np.concatenate(W, 1) @ np.concatenate(H, 0)
        for s in range(S):
            if not hfx[s]:
                neg, pos = _h_grads(divergence, V, V_hat, W[s], alpha, beta)
                H[s] = H[s] * (neg / np.maximum(pos + hsp[s], EPS))
        V_hat = np.concatenate(W, 1) @ np.concatenate(H, 0)
        cost[it] = div_cost(divergence, V, V_hat, alpha, beta)
        for s in range(S):
            cost[it] += wsp[s] * np.sum(np.abs(W[s])) + hsp[s] * np.sum(np.abs(H[s]))
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, cost


def lnmf(V, W_init, H_init, maxiter=100, tolerance=1e-3,
         W_fixed=False, H_fixed=False):
    """lnmf.m:60-92."""
    V = np.asarray(V, np.float64)
    m, n = V.shape
    W = np.array(W_init, np.float64)
    W = W / np.sum(W, axis=0, keepdims=True)
    H = np.array(H_init, np.float64)
    V_hat = W @ H
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not W_fixed:
            W = W * (((V / V_hat) @ H.T) / np.maximum(np.ones((m, n)) @ H.T, EPS))
            W = W / np.sum(W, axis=0, keepdims=True)
            V_hat = W @ H
        if not H_fixed:
            H = np.sqrt(H * (W.T @ (V / V_hat)))
            V_hat = W @ H
        cost[it] = np.sum(V * np.log(V / V_hat) - V + V_hat)
        if it > 0 and cost[it] <= cost[it - 1] and cost[it - 1] - cost[it] <= tolerance:
            break  # note: no trim (lnmf.m:89-91)
    return W, H, cost


def seminmf(V, W_init, H_init, maxiter=100, tolerance=1e-3,
            W_fixed=False, H_fixed=False):
    """seminmf.m:60-89."""
    V = np.asarray(V, np.float64)
    W = np.array(W_init, np.float64)
    H = np.array(H_init, np.float64)
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not W_fixed:
            W = (V @ H.T) @ np.linalg.inv(H @ H.T)
        if not H_fixed:
            WtV = W.T @ V
            WtW = W.T @ W
            wv_pos = 0.5 * (np.abs(WtV) + WtV)
            wv_neg = 0.5 * (np.abs(WtV) - WtV)
            ww_pos = 0.5 * (np.abs(WtW) + WtW)
            ww_neg = 0.5 * (np.abs(WtW) - WtW)
            H = H * np.sqrt((wv_pos + ww_neg @ H) / (wv_neg + ww_pos @ H))
        V_hat = W @ H
        cost[it] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, cost


def convexnmf(V, G_init, H_init, maxiter=100, tolerance=1e-3,
              G_sparsity=0.0, G_fixed=False, H_fixed=False):
    """convexnmf.m:81-113 (with G_init supplied, sidestepping the
    undefined-variable default at convexnmf.m:69-71)."""
    V = np.asarray(V, np.float64)
    G = np.array(G_init, np.float64)
    H = np.array(H_init, np.float64)
    G = G / np.sum(G, axis=0, keepdims=True)
    VtV = V.T @ V
    vv_pos = 0.5 * (np.abs(VtV) + VtV)
    vv_neg = 0.5 * (np.abs(VtV) - VtV)
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not G_fixed:
            GH = G @ H
            G = G * np.sqrt(((vv_pos + vv_neg @ GH) @ H.T)
                            / ((vv_neg + vv_pos @ GH) @ H.T + G_sparsity))
            G = G / np.sum(G, axis=0, keepdims=True)
        W = V @ G
        if not H_fixed:
            GH = G @ H
            H = H * np.sqrt((G.T @ (vv_pos + vv_neg @ GH))
                            / (G.T @ (vv_neg + vv_pos @ GH)))
        V_hat = W @ H
        cost[it] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, G, cost


def cnmf(V, W_init, H_init, context_len, divergence="euclidean",
         alpha=1.0, beta=1.0, W_sparsity=0.0, H_sparsity=0.0,
         maxiter=100, tolerance=1e-3, W_fixed=False, H_fixed=False):
    """cnmf.m:137-258, single source.  W_init is (m, k, T)."""
    V = np.asarray(V, np.float64)
    m, n = V.shape
    W = np.array(W_init, np.float64)
    H = np.array(H_init, np.float64)
    k = H.shape[0]
    T = context_len
    a, b = {"euclidean": (1.0, 1.0), "kl": (1.0, 0.0), "is": (1.0, -1.0)}.get(
        divergence, (alpha, beta))
    dual = a == 0
    for kk in range(k):
        w_norm = np.linalg.norm(W[:, kk, :]) / T
        W[:, kk, :] /= w_norm
        H[kk, :] *= w_norm
    V_hat = reconstruct(W, H)
    cost = np.zeros(maxiter)

    def hshift(Hm, t):
        return np.concatenate([np.zeros((k, t)), Hm[:, : n - t]], axis=1)

    for it in range(maxiter):
        if not W_fixed:
            for t in range(T):
                Hs = hshift(H, t)
                if dual:
                    neg = ((V**(a - 1) * V_hat**b) @ Hs.T
                           + W[:, :, t] * np.diag(Hs @ V.T**(a + b - 1) @ W[:, :, t])[None, :]) ** (1 / b)
                    pos = (V**(a + b - 1) @ Hs.T
                           + W[:, :, t] * np.diag(Hs @ (V**(a - 1) * V_hat**b).T @ W[:, :, t])[None, :]) ** (1 / b)
                else:
                    neg = ((V**a * V_hat**(b - 1)) @ Hs.T
                           + W[:, :, t] * np.diag(Hs @ V_hat.T**(a + b - 1) @ W[:, :, t])[None, :]) ** (1 / a)
                    pos = (V_hat**(a + b - 1) @ Hs.T
                           + W[:, :, t] * np.diag(Hs @ (V**a * V_hat**(b - 1)).T @ W[:, :, t])[None, :]) ** (1 / a)
                W[:, :, t] = W[:, :, t] * (neg / np.maximum(pos + W_sparsity, EPS))
            for kk in range(k):
                w_norm = np.linalg.norm(W[:, kk, :]) / T
                W[:, kk, :] /= w_norm
        V_hat = reconstruct(W, H)
        if not H_fixed:
            if dual:
                V_neg = V**(a - 1) * V_hat**b
                V_pos = V**(a + b - 1)
            else:
                V_neg = V**a * V_hat**(b - 1)
                V_pos = V_hat**(a + b - 1)
            gneg = np.zeros((k, n))
            gpos = np.zeros((k, n))
            for t in range(T):
                Vn = np.concatenate([V_neg[:, t:], np.zeros((m, t))], axis=1)
                if divergence == "kl":
                    Vp = V_pos  # KL special case: V_pos NOT shifted (cnmf.m:220-224)
                else:
                    Vp = np.concatenate([V_pos[:, t:], np.zeros((m, t))], axis=1)
                gneg += W[:, :, t].T @ Vn
                gpos += W[:, :, t].T @ Vp
            p = 1 / b if dual else 1 / a
            H = H * (gneg**p / np.maximum(gpos**p + H_sparsity, EPS))
        V_hat = reconstruct(W, H)
        cost[it] = div_cost(divergence if divergence in ("euclidean", "kl", "is") else "ab",
                            V, V_hat, a, b)
        cost[it] += W_sparsity * np.sum(np.abs(W)) + H_sparsity * np.sum(np.abs(H))
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, cost


def projfunc(s, k1, k2, nn=True):
    """projfunc.m — scalar-loop transliteration."""
    s = np.asarray(s, np.float64).copy()
    N = s.size
    if not nn:
        isneg = s < 0
        s = np.abs(s)
    v = s + (k1 - np.sum(s)) / N
    zerocoeff = np.zeros(N, dtype=bool)
    j = 0
    while True:
        midpoint = np.full(N, k1 / (N - zerocoeff.sum()))
        midpoint[zerocoeff] = 0
        w = v - midpoint
        a = np.sum(w**2)
        b = 2 * w @ v
        c = np.sum(v**2) - k2
        disc = b**2 - 4 * a * c
        alphap = (-b + np.sqrt(max(disc, 0.0))) / (2 * a)
        v = alphap * w + v
        if np.all(v >= 0):
            usediters = j + 1
            break
        j += 1
        zerocoeff = v <= 0
        v[zerocoeff] = 0
        v = v + (k1 - np.sum(v)) / (N - zerocoeff.sum())
        v[zerocoeff] = 0
    if not nn:
        v = (-2 * isneg + 1) * v
    return v, usediters


def chnmf(V, S, G_init, H_init, maxiter=100, tolerance=1e-3,
          G_sparsity=0.0, H_sparsity=0.0, G_fixed=False, H_fixed=False):
    """chnmf.m:169-199 with the paper-correct H update (the reference's
    chnmf.m:187 omits the G' projection and only runs when p == k; see
    COMPAT.md).  Literal/naive association for the G update."""
    V = np.asarray(V, np.float64)
    S = np.asarray(S, np.float64)
    G = np.array(G_init, np.float64)
    H = np.array(H_init, np.float64)
    G = G / np.sum(G, axis=0, keepdims=True)
    StV = S.T @ V
    StS = S.T @ S
    sv_pos = 0.5 * (np.abs(StV) + StV)
    sv_neg = 0.5 * (np.abs(StV) - StV)
    ss_pos = 0.5 * (np.abs(StS) + StS)
    ss_neg = 0.5 * (np.abs(StS) - StS)
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not G_fixed:
            GH = G @ H
            G = G * (((sv_pos + ss_neg @ GH) @ H.T)
                     / np.maximum((sv_neg + ss_pos @ GH) @ H.T + G_sparsity, EPS))
            G = G / np.sum(G, axis=0, keepdims=True)
        W = S @ G
        if not H_fixed:
            GH = G @ H
            H = H * ((G.T @ (sv_pos + ss_neg @ GH))
                     / np.maximum(G.T @ (sv_neg + ss_pos @ GH) + H_sparsity, EPS))
        V_hat = W @ H
        cost[it] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, G, cost
