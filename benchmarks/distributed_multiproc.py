"""REAL multi-process jax.distributed execution on CPU (SURVEY §2.5).

The multichip dryrun and the test suite shard over one process's virtual
devices; this harness exercises the actual multi-host path the
framework ships for pods: N OS processes, each owning a slice of the
device mesh, joined by ``parallel.init_distributed`` (a
``jax.distributed.initialize`` pass-through) with cross-process
collectives over the Gloo backend — the CPU stand-in for ICI/DCN.

It runs the flagship solver (nmf, euclidean Gram form: psum'd Gram
reductions) and one convolutive solver (cnmf: halo exchanges across
column shards) through the UNCHANGED package mesh path on a global
1-D sample mesh with a deliberately non-divisible n (the pad/mask
placement layer must work cross-process too), then asserts

* every process observes the identical trajectory (bit-exact JSON), and
* the multi-process trajectory matches a single-process run on the same
  global mesh shape to f64 tolerance (collective reduction order may
  differ across runtimes, so exact-bit equality is not demanded there).

Writes benchmarks/DISTRIBUTED_cpu_multiproc.json.

Usage:  python benchmarks/distributed_multiproc.py [nproc] [devices_per_proc]
"""
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M, N_PER_DEV, K, T, MAXITER = 37, 12, 5, 3, 8


def _problem(n_global_devices):
    n = N_PER_DEV * n_global_devices + 3  # non-divisible: padding layer
    rng = np.random.default_rng(11)
    V = rng.uniform(0.1, 1.0, (M, n)).astype(np.float64)
    W0 = rng.uniform(size=(M, K)).astype(np.float64)
    H0 = rng.uniform(size=(K, n)).astype(np.float64)
    W0c = rng.uniform(0.1, 1.0, (M, K, T)).astype(np.float64)
    return V, W0, H0, W0c


def child(process_id: int, nproc: int, port: int, dpp: int,
          ckpt_dir: str = ""):
    """One mesh participant (process_id == -1: single-process baseline)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if process_id >= 0:
        from nmf_toolbox_tpu.parallel import init_distributed
        init_distributed(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=process_id)
    import nmf_toolbox_tpu as nt
    from nmf_toolbox_tpu.parallel import make_mesh
    from jax.experimental import multihost_utils

    devices = jax.devices()
    n_global = len(devices)
    assert n_global == nproc * dpp, (n_global, nproc, dpp)
    mesh = make_mesh(n_global, devices=devices)  # 1-D sample mesh
    V, W0, H0, W0c = _problem(n_global)

    def fetch(x):
        x = jax.numpy.asarray(x)
        if x.is_fully_addressable or getattr(x, "is_fully_replicated", False):
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    out = {"process_id": process_id, "n_global_devices": n_global,
           "n_local_devices": len(jax.local_devices())}
    r = nt.nmf(V, K, W_init=W0, H_init=H0, maxiter=MAXITER,
               tolerance=1e-30, dtype=np.float64, mesh=mesh)
    out["nmf_cost"] = [float(c) for c in np.asarray(r.cost)]
    out["nmf_W_sum"] = float(fetch(r.W).sum())
    out["nmf_H_sum"] = float(fetch(r.H).sum())
    rc = nt.cnmf(V, K, T, W_init=W0c, H_init=H0, maxiter=MAXITER,
                 tolerance=1e-30, dtype=np.float64, mesh=mesh)
    out["cnmf_cost"] = [float(c) for c in np.asarray(rc.cost)]
    out["cnmf_W_sum"] = float(fetch(rc.W).sum())
    out["cnmf_H_sum"] = float(fetch(rc.H).sum())

    if ckpt_dir:
        # Orbax multi-process leg: every process calls the same save
        # (per-shard writes, orbax coordinates the commit), restores
        # INTO the solver placements, and resumes.  MU is memoryless, so
        # save-at-MAXITER + resume-4 must reproduce iterations
        # MAXITER+1..MAXITER+4 of an uninterrupted run bit-exactly.
        from nmf_toolbox_tpu.utils.checkpoint_orbax import (
            save_factors_orbax, load_factors_orbax)
        path = os.path.join(ckpt_dir, f"ck_{nproc}proc")
        save_factors_orbax(path, r)
        inits = load_factors_orbax(path, mesh=mesh, solver="nmf")
        kw = dict(maxiter=4, tolerance=1e-30, dtype=np.float64, mesh=mesh)
        r_ck = nt.nmf(V, K, **kw, **inits)            # from checkpoint
        r_mem = nt.nmf(V, K, W_init=r.W, H_init=r.H, **kw)  # from memory
        full = nt.nmf(V, K, W_init=W0, H_init=H0, maxiter=MAXITER + 4,
                      tolerance=1e-30, dtype=np.float64, mesh=mesh)
        ck_cost = [float(c) for c in np.asarray(r_ck.cost)]
        mem_cost = [float(c) for c in np.asarray(r_mem.cost)]
        tail = np.asarray(full.cost)[MAXITER:]
        out["ckpt_resume_cost"] = ck_cost
        # The sharded per-shard save/restore round trip must add ZERO
        # error: resuming from the checkpoint == resuming from the
        # in-memory factors, bit for bit.  (The uninterrupted run is a
        # DIFFERENT compiled program — one 12-iter loop vs 8+4 — so it
        # is only ulp-close, not bit-equal; assert 1e-12 relative.)
        out["ckpt_resume_bitexact"] = bool(
            ck_cost == mem_cost
            and float(fetch(r_ck.W).sum()) == float(fetch(r_mem.W).sum())
            and float(fetch(r_ck.H).sum()) == float(fetch(r_mem.H).sum()))
        out["ckpt_vs_uninterrupted_rel"] = float(
            np.max(np.abs(np.asarray(ck_cost) - tail) / tail))
    print("CHILD_JSON:" + json.dumps(out))


def _spawn(args, dpp, timeout):
    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", "")).strip()
    env["XLA_FLAGS"] = (flags
                        + f" --xla_force_host_platform_device_count={dpp}"
                        ).strip()
    pp = env.get("PYTHONPATH", "")
    if REPO not in pp.split(os.pathsep):
        env["PYTHONPATH"] = os.pathsep.join(p for p in (REPO, pp) if p)
    return subprocess.Popen([sys.executable, os.path.abspath(__file__),
                             "--child", *map(str, args)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _result(proc, timeout=600):
    out, err = proc.communicate(timeout=timeout)
    for line in out.splitlines():
        if line.startswith("CHILD_JSON:"):
            return json.loads(line[len("CHILD_JSON:"):])
    raise RuntimeError(f"child produced no result; stderr tail:\n"
                       + "\n".join(err.splitlines()[-15:]))


def main(nproc=2, dpp=4, artifact=None):
    import tempfile
    port = _free_port()
    tmp = tempfile.mkdtemp(prefix="nmf_dist_ckpt_")
    # Single-process baseline on the same global mesh shape.
    base = _result(_spawn([-1, 1, port, nproc * dpp,
                           os.path.join(tmp, "single")], nproc * dpp, 600))

    procs = [_spawn([i, nproc, port, dpp, os.path.join(tmp, "multi")], dpp,
                    600) for i in range(nproc)]
    results = [_result(p) for p in procs]

    report = {"nproc": nproc, "devices_per_process": dpp,
              "global_devices": nproc * dpp,
              "problem": {"m": M, "n": N_PER_DEV * nproc * dpp + 3, "k": K,
                          "context_len": T, "maxiter": MAXITER,
                          "dtype": "float64"},
              "solvers": {}}
    ok = True
    for key in ("nmf", "cnmf"):
        costs = [r[f"{key}_cost"] for r in results]
        cross_proc_identical = all(c == costs[0] for c in costs[1:]) and all(
            r[f"{key}_W_sum"] == results[0][f"{key}_W_sum"]
            and r[f"{key}_H_sum"] == results[0][f"{key}_H_sum"]
            for r in results[1:])
        bc = np.asarray(base[f"{key}_cost"])
        mc = np.asarray(costs[0])
        rel = float(np.max(np.abs(mc - bc) / np.maximum(np.abs(bc), 1e-300)))
        wrel = abs(results[0][f"{key}_W_sum"] - base[f"{key}_W_sum"]) / \
            max(abs(base[f"{key}_W_sum"]), 1e-300)
        hrel = abs(results[0][f"{key}_H_sum"] - base[f"{key}_H_sum"]) / \
            max(abs(base[f"{key}_H_sum"]), 1e-300)
        entry = {"cross_process_identical": bool(cross_proc_identical),
                 "max_rel_cost_dev_vs_single_process": rel,
                 "rel_W_checksum_dev": float(wrel),
                 "rel_H_checksum_dev": float(hrel),
                 "final_cost": float(mc[-1])}
        entry["ok"] = bool(cross_proc_identical and rel < 1e-9
                           and wrel < 1e-9 and hrel < 1e-9)
        ok &= entry["ok"]
        report["solvers"][key] = entry
    # Orbax multi-process checkpoint: per-shard save coordinated across
    # processes, restore into placements, bit-exact resume (each process
    # verifies locally; all must agree, and the baseline run too).
    ck = [r.get("ckpt_resume_bitexact") for r in results + [base]]
    rels = [r.get("ckpt_vs_uninterrupted_rel", 1.0)
            for r in results + [base]]
    report["orbax_multiproc_ckpt"] = {
        "bitexact_resume_per_process": ck,
        "max_rel_vs_uninterrupted": max(rels),
        "ok": bool(all(ck) and max(rels) < 1e-12)}
    ok &= report["orbax_multiproc_ckpt"]["ok"]
    report["ok"] = bool(ok)
    text = json.dumps(report, indent=1)
    print(text)
    if artifact:
        with open(artifact, "w") as f:
            f.write(text + "\n")
    return 0 if ok else 1


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        pid, nproc, port, dpp = map(int, sys.argv[2:6])
        child(pid, nproc, port, dpp,
              sys.argv[6] if len(sys.argv) > 6 else "")
    else:
        nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
        dpp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        # non-default shapes get their own artifact (the 2x4 file is the
        # canonical one the docs cite; a 4x2 run must not clobber it)
        suffix = "" if (nproc, dpp) == (2, 4) else f"_{nproc}x{dpp}"
        art = os.path.join(REPO, "benchmarks",
                           f"DISTRIBUTED_cpu_multiproc{suffix}.json")
        sys.exit(main(nproc, dpp, art))
