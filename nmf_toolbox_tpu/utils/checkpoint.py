"""Factor checkpoint/resume.

The reference has no checkpoint subsystem, but its API is
checkpoint-friendly by construction: every solver accepts
``W_init``/``H_init`` (+ P/G/S/Z) and ``*_fixed`` switches, so resume is
re-calling the solver with the last factors (SURVEY.md section 5).  This
module adds the missing persistence: save a solver Result (or any dict of
factor arrays) to one ``.npz`` file and restore it as a kwargs dict ready
to splat back into the solver.

    res = nt.nmf(V, 20, maxiter=50)
    save_factors("ckpt.npz", res)
    ...
    res2 = nt.nmf(V, 20, maxiter=50, **load_factors("ckpt.npz"))
"""
from __future__ import annotations

import numpy as np

_FACTOR_KEYS = ("W", "H", "P", "G", "S", "Z")


def save_factors(path, result_or_dict, extra: dict | None = None) -> None:
    """Persist a Result's factors (and cost trace) to ``path`` (.npz)."""
    payload = {}
    obj = result_or_dict
    if hasattr(obj, "fields"):  # core.Result
        items = {f: getattr(obj, f) for f in obj.fields}
        payload["__fields__"] = np.asarray(list(obj.fields))
        payload["__n_iters__"] = np.asarray(obj.n_iters)
    else:
        items = dict(obj)
    for name, val in items.items():
        if val is None:
            continue
        if isinstance(val, (list, tuple)):  # multi-source factors
            payload[f"{name}__len"] = np.asarray(len(val))
            for s, v in enumerate(val):
                payload[f"{name}__{s}"] = np.asarray(v)
        else:
            payload[name] = np.asarray(val)
    if extra:
        for kk, vv in extra.items():
            payload[f"extra__{kk}"] = np.asarray(vv)
    np.savez(path, **payload)


def load_factors(path, as_inits: bool = True) -> dict:
    """Load a checkpoint.  With ``as_inits`` (default) factor arrays are
    returned under their ``*_init`` kwarg names so the dict can be passed
    straight back into a solver; cost/aux entries are dropped."""
    with np.load(path, allow_pickle=False) as z:
        raw: dict = {}
        lens = {k[: -len("__len")]: int(z[k]) for k in z.files
                if k.endswith("__len")}
        for name, count in lens.items():
            raw[name] = [z[f"{name}__{s}"] for s in range(count)]
        for k in z.files:
            if ("__" in k) or k in raw:
                continue
            raw[k] = z[k]
    if not as_inits:
        return raw
    out = {}
    for name in _FACTOR_KEYS:
        if name in raw:
            out[f"{name}_init"] = raw[name]
    return out
