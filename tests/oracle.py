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
          G_sparsity=0.0, H_sparsity=0.0, G_fixed=False, H_fixed=False,
          compat=False):
    """chnmf.m:169-199 with the paper-correct H update (the reference's
    chnmf.m:187 omits the G' projection and only runs when p == k; see
    COMPAT.md).  Literal/naive association for the G update.
    ``compat=True`` runs the literal buggy chnmf.m:187 update instead
    (requires p == k)."""
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
            if compat:  # literal chnmf.m:187 (no G' projection; p == k only)
                H = H * ((sv_pos + ss_neg @ GH)
                         / np.maximum(sv_neg + ss_pos @ GH + H_sparsity, EPS))
            else:
                H = H * ((G.T @ (sv_pos + ss_neg @ GH))
                         / np.maximum(G.T @ (sv_neg + ss_pos @ GH) + H_sparsity, EPS))
        V_hat = W @ H
        cost[it] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, G, cost


def _hoyer_l1(dim, s):
    return np.sqrt(dim) - (np.sqrt(dim) - 1.0) * s


def nmfsc(V, W_init, H_init, W_sparsity=0.0, H_sparsity=0.0,
          W_fixed=False, H_fixed=False, maxiter=100, tolerance=1e-3):
    """nmfsc.m:56-245 — literal transliteration including the line
    searches.  Returns (W, H, cost)."""
    V = np.asarray(V, np.float64)
    if V.min() < 0:
        raise ValueError("Negative values in data!")
    V = V / V.max()
    m, n = V.shape
    W = np.array(W_init, np.float64)
    H = np.array(H_init, np.float64)
    k = H.shape[0]
    L1a = _hoyer_l1(m, min(W_sparsity, 1.0)) if W_sparsity > 0 else None
    L1s = _hoyer_l1(n, min(H_sparsity, 1.0)) if H_sparsity > 0 else None
    if W_sparsity > 0:
        for j in range(k):
            W[:, j] = projfunc(W[:, j], L1a, 1, nn=True)[0]
    if H_sparsity > 0:
        for j in range(k):
            H[j, :] = projfunc(H[j, :], L1s, 1, nn=True)[0]
    stepW, stepH = 1.0, 1.0
    cost = np.zeros(maxiter + 1)
    V_hat = W @ H
    cost[0] = 0.5 * np.sum((V - V_hat) ** 2)
    for it in range(maxiter):
        if not H_fixed:
            neg = W.T @ V
            pos = W.T @ V_hat
            if H_sparsity > 0:
                dH = pos - neg
                begobj = cost[it]
                while True:
                    Hnew = H - stepH * dH
                    for j in range(k):
                        Hnew[j, :] = projfunc(Hnew[j, :], L1s, 1, nn=True)[0]
                    V_hat = W @ Hnew
                    newobj = 0.5 * np.sum((V - V_hat) ** 2)
                    if newobj <= begobj:
                        break
                    stepH /= 2
                    if stepH < 1e-200:
                        return W, H, cost[: it + 1]
                stepH *= 1.2
                H = Hnew
            else:
                H = H * (neg / np.maximum(pos, EPS))
                norms = np.sqrt(np.sum(H**2, axis=1))
                H = H / norms[:, None]
                W = W * norms[None, :]
        if not W_fixed:
            V_hat = W @ H
            neg = V @ H.T
            pos = V_hat @ H.T
            if W_sparsity > 0:
                begobj = 0.5 * np.sum((V - V_hat) ** 2)
                dW = pos - neg
                while True:
                    Wnew = W - stepW * dW
                    for j in range(k):
                        Wnew[:, j] = projfunc(Wnew[:, j], L1a, 1, nn=True)[0]
                    V_hat = Wnew @ H
                    newobj = 0.5 * np.sum((V - V_hat) ** 2)
                    if newobj <= begobj:
                        break
                    stepW /= 2
                    if stepW < 1e-200:
                        return W, H, cost[: it + 1]
                stepW *= 1.2
                W = Wnew
            else:
                W = W * (neg / np.maximum(pos, EPS))
        V_hat = W @ H
        cost[it + 1] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it + 1] < cost[it] and cost[it] - cost[it + 1] < tolerance:
            cost = cost[: it + 2]
            break
    return W, H, cost


def cnmfsc(V, W_init, H_init, context_len, W_sparsity=0.0, H_sparsity=0.0,
           W_fixed=False, H_fixed=False, maxiter=100, tolerance=1e-3):
    """cnmfsc.m:67-277 — literal transliteration (double-buffered W0/W,
    per-frame stepsizes, the 2-D reconstruct inside the W line search at
    cnmfsc.m:235, the incremental clamped V_hat update at cnmfsc.m:262,
    and the (pos + eps) guard at cnmfsc.m:202)."""
    V = np.asarray(V, np.float64)
    if V.min() < 0:
        raise ValueError("Negative values in data!")
    V = V / V.max()
    m, n = V.shape
    W0 = np.array(W_init, np.float64)
    W = W0.copy()
    H = np.array(H_init, np.float64)
    k = H.shape[0]
    T = context_len
    L1a = _hoyer_l1(m, min(W_sparsity, 1.0)) if W_sparsity > 0 else None
    L1s = _hoyer_l1(n, min(H_sparsity, 1.0)) if H_sparsity > 0 else None
    if W_sparsity > 0:
        # NOTE: the reference projects W but NOT the W0 buffer
        # (cnmfsc.m:94-110), so iteration 1's H gradients use the
        # unprojected basis while the initial cost uses the projected one.
        for t in range(T):
            for j in range(k):
                W[:, j, t] = projfunc(W[:, j, t], L1a, 1, nn=True)[0]
    if H_sparsity > 0:
        for j in range(k):
            H[j, :] = projfunc(H[j, :], L1s, 1, nn=True)[0]

    def hshift(Hm, t):
        return np.concatenate([np.zeros((k, t)), Hm[:, : n - t]], axis=1)

    def lshift(X, t):
        return np.concatenate([X[:, t:], np.zeros((X.shape[0], t))], axis=1)

    stepW = np.ones(T)
    stepH = 1.0
    cost = np.zeros(maxiter + 1)
    V_hat = reconstruct(W, H)  # cnmfsc.m:152 uses W (projected)
    cost[0] = 0.5 * np.sum((V - V_hat) ** 2)
    for it in range(maxiter):
        if not H_fixed:
            neg = np.zeros((k, n))
            pos = np.zeros((k, n))
            for t in range(T):
                neg += W0[:, :, t].T @ lshift(V, t)
                pos += W0[:, :, t].T @ lshift(V_hat, t)
            if H_sparsity > 0:
                dH = pos - neg
                begobj = cost[it]
                while True:
                    Hnew = H - stepH * dH
                    for j in range(k):
                        Hnew[j, :] = projfunc(Hnew[j, :], L1s, 1, nn=True)[0]
                    V_hat = reconstruct(W0, Hnew)
                    newobj = 0.5 * np.sum((V - V_hat) ** 2)
                    if newobj <= begobj:
                        break
                    stepH /= 2
                    if stepH < 1e-200:
                        return W, H, cost[: it + 1]
                stepH *= 1.2
                H = Hnew
            else:
                H = H * (neg / (pos + EPS))  # note: + eps, not max (cnmfsc.m:202)
                norms = np.sqrt(np.sum(H**2, axis=1))
                H = H / norms[:, None]
                for t in range(T):
                    W0[:, :, t] = W0[:, :, t] * norms[None, :]
        if not W_fixed:
            V_hat = reconstruct(W0, H)
            if W_sparsity > 0:
                for t in range(T):
                    begobj = 0.5 * np.sum((V - V_hat) ** 2)
                    Hs = hshift(H, t)
                    neg = V @ Hs.T
                    pos = V_hat @ Hs.T
                    dW = pos - neg
                    while True:
                        Wnew = W0[:, :, t] - stepW[t] * dW
                        for j in range(k):
                            Wnew[:, j] = projfunc(Wnew[:, j], L1a, 1, nn=True)[0]
                        V_hat = Wnew @ H  # 2-D reconstruct (cnmfsc.m:235)
                        newobj = 0.5 * np.sum((V - V_hat) ** 2)
                        if newobj <= begobj:
                            break
                        stepW[t] /= 2
                        if stepW[t] < 1e-200:
                            return W, H, cost[: it + 1]
                    stepW[t] *= 1.2
                    W[:, :, t] = Wnew
            else:
                for t in range(T):
                    Hs = hshift(H, t)
                    neg = V @ Hs.T
                    pos = V_hat @ Hs.T
                    W[:, :, t] = W0[:, :, t] * (neg / np.maximum(pos, EPS))
                    V_hat = np.maximum(V_hat + (W[:, :, t] - W0[:, :, t]) @ Hs, 0)
        W0 = W.copy()
        V_hat = reconstruct(W0, H)
        cost[it + 1] = 0.5 * np.sum((V - V_hat) ** 2)
        if it > 0 and cost[it + 1] < cost[it] and cost[it] - cost[it + 1] < tolerance:
            cost = cost[: it + 2]
            break
    return W, H, cost


def cmfwisa(V, W_init, H_init, P_init=None, H_sparsity=None,
            W_fixed=None, H_fixed=None, P_fixed=None,
            maxiter=100, tolerance=1e-3):
    """cmfwisa.m:99-224 — complex MF with intra-source additivity.
    W_init/H_init are per-source lists; V is complex."""
    V = np.asarray(V, np.complex128)
    m, n = V.shape
    S = len(W_init)
    W = [np.array(w, np.float64) for w in W_init]
    H = [np.array(h, np.float64) for h in H_init]
    hsp = H_sparsity or [0.0] * S
    wfx = W_fixed or [False] * S
    hfx = H_fixed or [False] * S
    pfx = P_fixed or [False] * S
    for i in range(S):
        W[i] = W[i] / np.sqrt(np.sum(W[i]**2, axis=0, keepdims=True))
    if P_init is None:
        P = [np.exp(1j * np.angle(V)) for _ in range(S)]
    else:
        P = [np.array(p, np.complex128) for p in P_init]
    W_all = np.concatenate(W, axis=1)
    H_all = np.concatenate(H, axis=0)
    V_hat_ps = np.stack([(W[i] @ H[i]) * P[i] for i in range(S)])
    V_hat = V_hat_ps.sum(0)
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        R = W_all @ H_all
        beta = [(W[i] @ H[i]) / R for i in range(S)]
        V_bar = [V_hat_ps[i] + beta[i] * (V - V_hat) for i in range(S)]
        for i in range(S):
            if not pfx[i]:
                P[i] = np.exp(1j * np.angle(V_bar[i]))
        for i in range(S):
            if not wfx[i]:
                W[i] = W[i] * (((np.abs(V_bar[i]) / beta[i]) @ H[i].T)
                               / np.maximum(R @ H[i].T, EPS))
                W[i] = W[i] / np.sqrt(np.sum(W[i]**2, axis=0, keepdims=True))
        for i in range(S):
            if not hfx[i]:
                # literal association: (W_i' W_all) H_all (cmfwisa.m:200)
                H[i] = H[i] * ((W[i].T @ (np.abs(V_bar[i]) / beta[i]))
                               / np.maximum((W[i].T @ W_all) @ H_all + hsp[i], EPS))
        W_all = np.concatenate(W, axis=1)
        H_all = np.concatenate(H, axis=0)
        V_hat_ps = np.stack([(W[i] @ H[i]) * P[i] for i in range(S)])
        V_hat = V_hat_ps.sum(0)
        cost[it] = np.sum(np.abs(V - V_hat) ** 2)
        for i in range(S):
            cost[it] += hsp[i] * np.sum(H[i])
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, P, cost


def chcnmf(V, S, G_init, H_init, context_len, G_sparsity=0.0, H_sparsity=0.0,
           G_fixed=False, H_fixed=False, maxiter=100, tolerance=1e-3):
    """chcnmf.m:297-438 (the live code path; the commented-out branches are
    dead code).  Literal: sequential per-frame G updates with the
    incremental clamped F update (chcnmf.m:363-368), H gradient via
    shifted identity (chcnmf.m:374-383)."""
    V = np.asarray(V, np.float64)
    S = np.asarray(S, np.float64)
    m, n = V.shape
    G = np.array(G_init, np.float64)
    H = np.array(H_init, np.float64)
    p, k, T = G.shape
    for t in range(T):
        G[:, :, t] = G[:, :, t] / np.sum(G[:, :, t], axis=0, keepdims=True)
    StV = S.T @ V
    StS = S.T @ S
    sv_pos = 0.5 * (np.abs(StV) + StV)
    sv_neg = 0.5 * (np.abs(StV) - StV)
    ss_pos = 0.5 * (np.abs(StS) + StS)
    ss_neg = 0.5 * (np.abs(StS) - StS)
    W = np.zeros((m, k, T))
    for t in range(T):
        W[:, :, t] = S @ G[:, :, t]

    def hshift(Hm, t):
        return np.concatenate([np.zeros((k, t)), Hm[:, : n - t]], axis=1)

    def lshift(X, t):
        return np.concatenate([X[:, t:], np.zeros((X.shape[0], t))], axis=1)

    G0 = G.copy()
    cost = np.zeros(maxiter + 1)
    V_hat = reconstruct(W, H)
    cost[0] = 0.5 * np.sum((V - V_hat) ** 2) + H_sparsity * np.sum(H)
    for it in range(maxiter):
        F = reconstruct(G0, H)  # (p, n) encoding-space reconstruction
        if not G_fixed:
            for t in range(T):
                Hs = hshift(H, t)
                G[:, :, t] = G0[:, :, t] * (
                    ((sv_pos + ss_neg @ F) @ Hs.T)
                    / np.maximum((sv_neg + ss_pos @ F) @ Hs.T + G_sparsity, EPS))
                G[:, :, t] = G[:, :, t] / np.sum(G[:, :, t], axis=0, keepdims=True)
                F = np.maximum(F + (G[:, :, t] - G0[:, :, t]) @ Hs, 0)
                W[:, :, t] = S @ G[:, :, t]
        if not H_fixed:
            F = reconstruct(G, H)
            neg = np.zeros((k, n))
            pos = np.zeros((k, n))
            for t in range(T):
                neg += G[:, :, t].T @ (lshift(sv_pos, t) + ss_neg @ lshift(F, t))
                pos += G[:, :, t].T @ (lshift(sv_neg, t) + ss_pos @ lshift(F, t))
            H = H * (neg / np.maximum(pos + H_sparsity, EPS))
        V_hat = reconstruct(W, H)
        cost[it + 1] = 0.5 * np.sum((V - V_hat) ** 2) + H_sparsity * np.sum(H)
        if it > 0 and cost[it + 1] < cost[it] and cost[it] - cost[it + 1] < tolerance:
            cost = cost[: it + 2]
            break
        G0 = G.copy()
    return W, H, G, cost


def constrainednmf(V, labels, W_init, Z_init, divergence="euclidean",
                   alpha=1.0, beta=1.0, W_sparsity=0.0, Z_sparsity=0.0,
                   W_fixed=False, Z_fixed=False, maxiter=100, tolerance=1e-3):
    """constrainednmf.m:144-267 with injected W/Z inits.  The AB branch of
    the Z update uses the paper-correct W'(V^a .* V_hat^(b-1))A' grouping
    (the reference's literal expression at constrainednmf.m:229 is
    shape-inconsistent — see COMPAT.md)."""
    V = np.asarray(V, np.float64)
    m, n = V.shape
    labels = np.asarray(labels)
    W = np.array(W_init, np.float64)
    W = W / np.sqrt(np.sum(W**2, axis=0, keepdims=True))
    # label preprocessing (constrainednmf.m:149-158)
    num_labeled = int(np.sum(labels > -1))
    uniq = np.unique(labels)
    if num_labeled < n:
        num_classes = len(uniq) - 1
        lp = np.searchsorted(uniq, labels)  # 0 -> unlabeled
        lp = np.where(lp == 0, -1, lp)
    else:
        num_classes = len(uniq)
        lp = np.searchsorted(uniq, labels) + 1
    sorted_idx = np.argsort(lp, kind="stable")
    sorted_labels = lp[sorted_idx]
    V = V[:, sorted_idx]
    n_u = n - num_labeled
    C = np.zeros((num_classes, num_labeled))
    for s in range(n_u, n):
        C[sorted_labels[s] - 1, s - n_u] = 1
    A = np.zeros((n_u + num_classes, n))
    A[:n_u, :n_u] = np.eye(n_u)
    A[n_u:, n_u:] = C
    Z = np.array(Z_init, np.float64)
    H = Z @ A
    V_hat = W @ H
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not W_fixed:
            neg, pos = _w_grads(divergence, V, V_hat, W, H, alpha, beta)
            W = W * (neg / np.maximum(pos + W_sparsity, EPS))
            W = W / np.sqrt(np.sum(W**2, axis=0, keepdims=True))
        V_hat = W @ H
        if not Z_fixed:
            if divergence == "euclidean":
                neg = W.T @ V @ A.T
                pos = W.T @ V_hat @ A.T
            elif divergence == "kl":
                neg = W.T @ (V / V_hat) @ A.T
                pos = W.T @ np.ones((m, n)) @ A.T
            elif divergence == "is":
                neg = W.T @ (V / V_hat**2) @ A.T
                pos = W.T @ (np.ones((m, n)) / (W @ H)) @ A.T
            else:
                a, b = alpha, beta
                if a == 0:
                    neg = (W.T @ (V**(a - 1) * V_hat**b) @ A.T) ** (1 / b)
                    pos = (W.T @ V**(a + b - 1) @ A.T) ** (1 / b)
                else:
                    neg = (W.T @ (V**a * V_hat**(b - 1)) @ A.T) ** (1 / a)
                    pos = (W.T @ V_hat**(a + b - 1) @ A.T) ** (1 / a)
            Z = Z * (neg / np.maximum(pos + Z_sparsity, EPS))
        H = Z @ A
        V_hat = W @ H
        cost[it] = div_cost(divergence, V, V_hat, alpha, beta)
        cost[it] += W_sparsity * np.sum(np.abs(W)) + Z_sparsity * np.sum(np.abs(Z))
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    # restore original ordering (constrainednmf.m:263-267)
    A_orig = np.zeros_like(A)
    A_orig[:, sorted_idx] = A
    H = Z @ A_orig
    return W, H, Z, A_orig, cost


def cnmf_multi(V, W_inits, H_inits, context_len, W_sparsity=None,
               H_sparsity=None, W_fixed=None, H_fixed=None,
               maxiter=100, tolerance=1e-3):
    """cnmf.m with multiple sources (cell arrays), euclidean only —
    literal per-source/per-frame loops for parity testing."""
    V = np.asarray(V, np.float64)
    m, n = V.shape
    S = len(W_inits)
    W = [np.array(w, np.float64) for w in W_inits]
    H = [np.array(h, np.float64) for h in H_inits]
    T = context_len
    wsp = W_sparsity or [0.0] * S
    hsp = H_sparsity or [0.0] * S
    wfx = W_fixed or [False] * S
    hfx = H_fixed or [False] * S
    for s in range(S):
        k = H[s].shape[0]
        for kk in range(k):
            w_norm = np.linalg.norm(W[s][:, kk, :]) / T
            W[s][:, kk, :] /= w_norm
            H[s][kk, :] *= w_norm

    def hshift(Hm, t):
        k = Hm.shape[0]
        return np.concatenate([np.zeros((k, t)), Hm[:, : n - t]], axis=1)

    def recon_all():
        Wall = np.concatenate(W, axis=1)
        Hall = np.concatenate(H, axis=0)
        return reconstruct(Wall, Hall)

    V_hat = recon_all()
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        for s in range(S):
            if wfx[s]:
                continue
            k = H[s].shape[0]
            for t in range(T):
                Hs = hshift(H[s], t)
                neg = V @ Hs.T + W[s][:, :, t] * np.diag(Hs @ V_hat.T @ W[s][:, :, t])[None, :]
                pos = V_hat @ Hs.T + W[s][:, :, t] * np.diag(Hs @ V.T @ W[s][:, :, t])[None, :]
                W[s][:, :, t] = W[s][:, :, t] * (neg / np.maximum(pos + wsp[s], EPS))
            for kk in range(k):
                w_norm = np.linalg.norm(W[s][:, kk, :]) / T
                W[s][:, kk, :] /= w_norm
        V_hat = recon_all()
        for s in range(S):
            if hfx[s]:
                continue
            k = H[s].shape[0]
            gneg = np.zeros((k, n))
            gpos = np.zeros((k, n))
            for t in range(T):
                Vn = np.concatenate([V[:, t:], np.zeros((m, t))], axis=1)
                Vp = np.concatenate([V_hat[:, t:], np.zeros((m, t))], axis=1)
                gneg += W[s][:, :, t].T @ Vn
                gpos += W[s][:, :, t].T @ Vp
            H[s] = H[s] * (gneg / np.maximum(gpos + hsp[s], EPS))
        V_hat = recon_all()
        cost[it] = 0.5 * np.sum((V - V_hat) ** 2)
        for s in range(S):
            cost[it] += wsp[s] * np.sum(np.abs(W[s])) + hsp[s] * np.sum(np.abs(H[s]))
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, cost


def nmf2d(V, W_init, H_init, context_len, pitch_len, divergence="euclidean",
          alpha=1.0, beta=1.0, W_sparsity=0.0, H_sparsity=0.0,
          maxiter=100, tolerance=1e-3, W_fixed=False, H_fixed=False):
    """2-D deconvolution (Schmidt & Morup 2006) — literal double-shift
    loops, paper-correct shifted fields everywhere (no cnmf.m KL quirk).
    Independent cross-check for models/nmf2d.py (which batches the same
    math into stacked einsums).  W_init (m, k, T), H_init (k, n, P)."""
    V = np.asarray(V, np.float64)
    m, n = V.shape
    W = np.array(W_init, np.float64)
    H = np.array(H_init, np.float64)
    k = H.shape[0]
    T, P = context_len, pitch_len
    a, b = {"euclidean": (1.0, 1.0), "kl": (1.0, 0.0), "is": (1.0, -1.0)}.get(
        divergence, (alpha, beta))
    dual = a == 0

    def down(X, p):
        return np.concatenate([np.zeros((p, X.shape[1])), X[: m - p]], axis=0)

    def up(X, p):
        return np.concatenate([X[p:], np.zeros((p, X.shape[1]))], axis=0)

    def hshift(Hm, t):
        return np.concatenate([np.zeros((k, t)), Hm[:, : n - t]], axis=1)

    def lshift(X, t):
        return np.concatenate([X[:, t:], np.zeros((m, t))], axis=1)

    def recon(W, H):
        Lam = np.zeros((m, n))
        for t in range(T):
            for p in range(P):
                Lam += down(W[:, :, t], p) @ hshift(H[:, :, p], t)
        return Lam

    for kk in range(k):
        w_norm = np.linalg.norm(W[:, kk, :]) / T
        W[:, kk, :] /= w_norm
        H[kk, :, :] *= w_norm
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        if not W_fixed:
            Lam = recon(W, H)
            if dual:
                Phi_n, Phi_p = V**(a - 1) * Lam**b, V**(a + b - 1)
            else:
                Phi_n, Phi_p = V**a * Lam**(b - 1), Lam**(a + b - 1)
            pw = 1 / b if dual else 1 / a
            for t in range(T):
                A = np.zeros((m, k))
                B = np.zeros((m, k))
                for p in range(P):
                    Hs = hshift(H[:, :, p], t)
                    A += up(Phi_n, p) @ Hs.T
                    B += up(Phi_p, p) @ Hs.T
                dneg = np.sum(W[:, :, t] * B, axis=0)
                dpos = np.sum(W[:, :, t] * A, axis=0)
                neg = (A + W[:, :, t] * dneg[None, :]) ** pw
                pos = (B + W[:, :, t] * dpos[None, :]) ** pw
                W[:, :, t] = W[:, :, t] * (neg / np.maximum(pos + W_sparsity, EPS))
            for kk in range(k):
                w_norm = np.linalg.norm(W[:, kk, :]) / T
                W[:, kk, :] /= w_norm
        if not H_fixed:
            Lam = recon(W, H)
            if dual:
                Phi_n, Phi_p = V**(a - 1) * Lam**b, V**(a + b - 1)
            else:
                Phi_n, Phi_p = V**a * Lam**(b - 1), Lam**(a + b - 1)
            pw = 1 / b if dual else 1 / a
            for p in range(P):
                gneg = np.zeros((k, n))
                gpos = np.zeros((k, n))
                for t in range(T):
                    gneg += W[:, :, t].T @ lshift(up(Phi_n, p), t)
                    gpos += W[:, :, t].T @ lshift(up(Phi_p, p), t)
                H[:, :, p] = H[:, :, p] * (gneg**pw / np.maximum(
                    gpos**pw + H_sparsity, EPS))
        Lam = recon(W, H)
        cost[it] = div_cost(divergence if divergence in ("euclidean", "kl", "is")
                            else "ab", V, Lam, a, b)
        cost[it] += W_sparsity * np.sum(np.abs(W)) + H_sparsity * np.sum(np.abs(H))
        if it > 0 and cost[it] < cost[it - 1] and cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return W, H, cost


def symnmf(A, H_init, maxiter=100, tolerance=1e-3):
    """Ding-2005 damped symmetric update, literal loops
    (models/symnmf.py cross-check)."""
    A = np.asarray(A, np.float64)
    H = np.array(H_init, np.float64)
    cost = np.zeros(maxiter)
    for it in range(maxiter):
        H = H * (0.5 + 0.5 * (A @ H) / np.maximum(H @ (H.T @ H), EPS))
        E = A - H @ H.T
        cost[it] = 0.5 * np.sum(E * E)
        if it > 0 and cost[it] < cost[it - 1] and \
                cost[it - 1] - cost[it] < tolerance:
            cost = cost[: it + 1]
            break
    return H, cost
