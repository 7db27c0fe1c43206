"""On-chip parity smoke suite (run each round on the real TPU).

The 660+-test suite runs on CPU; TPU numerics differ (one-pass-bf16 f32
matmuls, 'highest'-precision line-search fix, a real backend under the
collectives), and the round-2 f32 underflow bug was exactly a
TPU-only-numerics class the CPU suite could not see.  This script is
the regression net for that class:

1. **Golden parity at f32**: every solver family's frozen golden
   (tests/goldens/, f64 oracle trajectories) re-run on-chip in float32
   (complex64 for cmfwisa), recording the max factor deviation and the
   final-cost relative deviation.  Thresholds are calibrated at ~10x
   the CPU-f32 deviation (``--calibrate`` prints fresh numbers); the
   artifact stores the raw deviations so sub-threshold drift is still
   visible round over round.
2. **Sharded placement step**: one real-backend NamedSharding step per
   placement family on a 1-device mesh (the placements table, padding
   layer, and collective lowering all compile+execute on the actual
   TPU runtime).

Writes benchmarks/TPU_SMOKE.json (or --out).  Usage:

    python benchmarks/tpu_smoke.py            # probe TPU, run, write
    python benchmarks/tpu_smoke.py --cpu      # CPU-labeled run (threshold calibration)
    python benchmarks/tpu_smoke.py --bf16     # CPU run under the chip's f32-matmul
                                              # error model (one-pass bf16 emulation;
                                              # re-execs itself with the XLA flag)
    python benchmarks/tpu_smoke.py --calibrate  # print observed devs only
    python benchmarks/tpu_smoke.py --no-wait  # single probe, no 25-min retry window
"""
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "goldens"
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _rel(a, b):
    a = np.asarray(a).astype(np.complex128)
    b = np.asarray(b).astype(np.complex128)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300))


def golden_cases(nt):
    """(name, runner, threshold) — runner returns (result, golden dict).

    Thresholds: ~3x the WORSE of {CPU-f32, CPU-bf16-matmul-emulation}
    deviation from the f64 golden.  CAL 2026-08-18 (round 5): the bf16
    emulation (--bf16; utils/debug.emulate_tpu_matmul_numerics — the
    chip's one-pass-bf16 f32 matmul error model, 'highest'-precision
    dots exempt) measured nmf_kl 2.7e-3, weighted 2.0e-3, cnmf 4.3e-3,
    lnmf 1.3e-3, seminmf 7.7e-3, convexnmf 4.7e-3, chnmf 6.2e-3,
    chcnmf 6.9e-3, nmfsc 1.2e-6, cnmfsc 3.4e-7, cmfwisa 7.3e-3,
    constrained 2.5e-3, nmf2d 1.4e-3, symnmf 1.1e-2 — all well above
    the earlier CPU-f32-only calibration, which would have tripped 7
    false failures on the first real on-chip run (TPU_SMOKE_cpu_bf16
    .json).  The projected-gradient family's f32 branch decisions (step
    acceptance) can flip, so its thresholds stay the loosest.
    """
    def case(npz, fn, thresh):
        def run():
            g = dict(np.load(GOLD / npz))
            return fn(g), g
        return run, thresh

    C = {}
    C["nmf_kl"] = case("nmf_kl.npz", lambda g: nt.nmf(
        g["V"].astype(np.float32), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        divergence="kl", maxiter=20, tolerance=1e-12), 1e-2)
    C["nmf_weighted_kl"] = case("nmf_weighted_kl.npz", lambda g: nt.nmf(
        g["V"].astype(np.float32), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        weights=g["M"].astype(np.float32), divergence="kl", maxiter=15,
        tolerance=1e-12), 1e-2)
    C["cnmf_euclid"] = case("cnmf_euclid.npz", lambda g: nt.cnmf(
        g["V"].astype(np.float32), g["W0"].shape[1], g["W0"].shape[2],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        maxiter=15, tolerance=1e-12, method="gram"), 1.5e-2)
    C["lnmf"] = case("lnmf.npz", lambda g: nt.lnmf(
        g["V"].astype(np.float32), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        maxiter=15, tolerance=1e-12), 5e-3)
    C["seminmf"] = case("seminmf.npz", lambda g: nt.seminmf(
        g["V"].astype(np.float32), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        maxiter=15, tolerance=1e-12), 2.5e-2)
    C["convexnmf"] = case("convexnmf.npz", lambda g: nt.convexnmf(
        g["V"].astype(np.float32), g["G0"].shape[1],
        G_init=g["G0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        maxiter=15, tolerance=1e-12), 1.5e-2)
    C["chnmf"] = case("chnmf.npz", lambda g: nt.chnmf(
        g["V"].astype(np.float32), g["G0"].shape[1],
        S_init=g["S"].astype(np.float32), G_init=g["G0"].astype(np.float32),
        H_init=g["H0"].astype(np.float32), maxiter=15, tolerance=1e-12), 2e-2)
    C["chcnmf"] = case("chcnmf.npz", lambda g: nt.chcnmf(
        g["V"].astype(np.float32), g["G0"].shape[1], int(g["T"]),
        S_init=g["S"].astype(np.float32), G_init=g["G0"].astype(np.float32),
        H_init=g["H0"].astype(np.float32), H_sparsity=float(g["H_sparsity"]),
        maxiter=12, tolerance=1e-12), 3e-2)
    C["nmfsc_sparse"] = case("nmfsc_sparse.npz", lambda g: nt.nmfsc(
        g["V"].astype(np.float32), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        W_sparsity=0.5, H_sparsity=0.6, maxiter=12, tolerance=1e-12), 3e-2)
    C["cnmfsc_sparse"] = case("cnmfsc_sparse.npz", lambda g: nt.cnmfsc(
        g["V"].astype(np.float32), g["W0"].shape[1], int(g["T"]),
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        W_sparsity=float(g["W_sparsity"]), H_sparsity=float(g["H_sparsity"]),
        maxiter=10, tolerance=1e-12), 3e-2)
    C["cmfwisa"] = case("cmfwisa.npz", lambda g: nt.cmfwisa(
        g["V"].astype(np.complex64), g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), H_init=g["H0"].astype(np.float32),
        H_sparsity=float(g["H_sparsity"]), maxiter=15, tolerance=1e-12,
        dtype=np.complex64), 2.5e-2)
    C["constrainednmf_kl"] = case("constrainednmf_kl.npz",
                                  lambda g: nt.constrainednmf(
        g["V"].astype(np.float32), g["labels"], g["W0"].shape[1],
        W_init=g["W0"].astype(np.float32), Z_init=g["Z0"].astype(np.float32),
        divergence="kl", maxiter=15, tolerance=1e-12), 1e-2)
    C["nmf2d_kl"] = case("nmf2d_kl.npz", lambda g: nt.nmf2d(
        g["V"].astype(np.float32), g["W0"].shape[1], g["W0"].shape[2],
        g["H0"].shape[2], W_init=g["W0"].astype(np.float32),
        H_init=g["H0"].astype(np.float32), divergence="kl", maxiter=15,
        tolerance=1e-12), 5e-3)
    C["symnmf"] = case("symnmf.npz", lambda g: nt.symnmf(
        g["A"].astype(np.float32), g["H0"].shape[1],
        H_init=g["H0"].astype(np.float32), maxiter=15, tolerance=1e-12), 3e-2)
    return C


FACTORS = ("W", "H", "G", "Z", "P")


def run_goldens(nt, report, calibrate=False):
    for name, (run, thresh) in golden_cases(nt).items():
        t0 = time.perf_counter()
        try:
            r, g = run()
            devs = {}
            for f in FACTORS:
                if getattr(r, f, None) is not None and f in g:
                    devs[f] = _rel(getattr(r, f), g[f])
            c = np.asarray(r.cost, np.float64)
            gc = np.asarray(g["cost"], np.float64)
            n = min(len(c), len(gc))
            devs["cost"] = _rel(c[:n], gc[:n])
            worst = max(devs.values())
            entry = {"max_rel_dev": worst, "devs": devs,
                     "threshold": thresh, "ok": bool(worst <= thresh),
                     "wall_s": round(time.perf_counter() - t0, 2)}
        except Exception as e:
            entry = {"ok": False, "error": f"{type(e).__name__}: {e}",
                     "threshold": thresh,
                     "wall_s": round(time.perf_counter() - t0, 2)}
        report["goldens"][name] = entry
        flag = "OK " if entry["ok"] else "FAIL"
        print(f"  golden {name:<18} {flag} "
              f"dev={entry.get('max_rel_dev', float('nan')):.2e} "
              f"thr={thresh:.0e} ({entry['wall_s']}s)"
              + (f"  {entry.get('error', '')}" if not entry["ok"] else ""),
              file=sys.stderr)
        if calibrate and "devs" in entry:
            print(f"    CAL {name}: {entry['devs']}", file=sys.stderr)


# Sharded-vs-unsharded cost parity bound: both programs run on the same
# device, so the only legal difference is XLA reassociation/layout noise
# under the padding layer — 1e-3 relative is loose even for one-pass
# bf16 matmuls at these tiny shapes.
SHARDED_PARITY_THRESH = 1e-3


def run_sharded(nt, report):
    """One NamedSharding step per placement family on a 1-device mesh of
    the current default backend — compiles and executes the sharded
    program (placements, padding, collective lowering) on the real
    runtime — and asserts its cost trajectory matches the UNSHARDED run
    of the identical config (parity, not just finiteness)."""
    import jax
    from nmf_toolbox_tpu.parallel import make_mesh
    mesh = make_mesh(1, devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    m, n, k, T, P2 = 17, 29, 4, 3, 2
    V = rng.uniform(0.1, 1.0, (m, n)).astype(np.float32)
    W0 = rng.uniform(size=(m, k)).astype(np.float32)
    H0 = rng.uniform(size=(k, n)).astype(np.float32)
    W0c = rng.uniform(0.1, 1.0, (m, k, T)).astype(np.float32)
    Vc = (V * np.exp(1j * rng.uniform(size=(m, n)))).astype(np.complex64)
    S = V[:, rng.choice(n, 6, replace=False)].copy()
    G0 = rng.uniform(size=(6, k)).astype(np.float32)
    G0c = rng.uniform(size=(6, k, 2)).astype(np.float32)
    Gn0 = rng.uniform(size=(n, k)).astype(np.float32)
    H2d0 = rng.uniform(size=(k, n, P2)).astype(np.float32)
    labels = np.full(n, -1)
    labels[rng.choice(n, 9, replace=False)] = rng.integers(0, 3, 9)
    Vb = rng.uniform(0.1, 1.0, (4, m, 11)).astype(np.float32)
    Asym = (V[:, :m] + V[:, :m].T) / 2
    steps = {
        "nmf": lambda mh: nt.nmf(V, k, W_init=W0, H_init=H0, maxiter=1,
                                 tolerance=1e-12, mesh=mh),
        "cnmf": lambda mh: nt.cnmf(V, k, T, W_init=W0c, H_init=H0,
                                   maxiter=1, tolerance=1e-12, mesh=mh),
        "cmfwisa": lambda mh: nt.cmfwisa(Vc, k, maxiter=1, tolerance=1e-12,
                                         seed=1, mesh=mh),
        "chcnmf": lambda mh: nt.chcnmf(V, k, 2, S_init=S, G_init=G0c,
                                       H_init=H0, maxiter=1,
                                       tolerance=1e-12, mesh=mh),
        "convexnmf": lambda mh: nt.convexnmf(V - 0.5, k, G_init=Gn0,
                                             H_init=H0, maxiter=1,
                                             tolerance=1e-12, mesh=mh),
        "constrainednmf": lambda mh: nt.constrainednmf(
            V, labels, k, W_init=W0, maxiter=1, tolerance=1e-12, seed=1,
            mesh=mh),
        "nmf2d": lambda mh: nt.nmf2d(V, k, T, P2, W_init=W0c, H_init=H2d0,
                                     maxiter=1, tolerance=1e-12, mesh=mh),
        "symnmf": lambda mh: nt.symnmf(Asym, k, maxiter=1, tolerance=1e-12,
                                       seed=1, mesh=mh),
        "nmf_encode": lambda mh: nt.nmf_encode(Vb, W0, maxiter=1, mesh=mh,
                                               seed=2),
    }
    del G0  # unused legacy init kept out of the closures

    def _costs(r):
        c = np.asarray(r.cost, np.float64)
        if c.ndim > 1:          # batched encode: (B, iters) — keep ALL
            # problems' traces (maxiter=1 here, so every entry is live);
            # truncating to n_iters after flattening would silently drop
            # problems 1..B-1 from the parity/finiteness check
            return c.reshape(-1)
        n_it = max(int(np.max(np.asarray(r.n_iters))), 1)
        return c[:n_it]

    # The parity baselines double this process's compile count; the
    # relay worker has crashed under many fresh compiles in one process
    # before (verify SKILL.md), so NMF_SMOKE_NO_PARITY=1 falls back to
    # finiteness-only if the first on-chip run proves too heavy.
    parity = not os.environ.get("NMF_SMOKE_NO_PARITY")
    for name, fn in steps.items():
        t0 = time.perf_counter()
        try:
            r = fn(mesh)
            c = _costs(r)
            finite = bool(np.all(np.isfinite(c)))
            entry = {"ok": finite}
            if parity:
                r0 = fn(None)   # identical config, no mesh
                c0 = _costs(r0)
                nn = min(len(c), len(c0))
                dev = float(np.max(np.abs(c[:nn] - c0[:nn])
                                   / np.maximum(np.abs(c0[:nn]), 1e-300)))
                entry = {"ok": bool(finite
                                    and dev <= SHARDED_PARITY_THRESH),
                         "parity_rel_dev": dev}
            entry["wall_s"] = round(time.perf_counter() - t0, 2)
        except Exception as e:
            entry = {"ok": False, "error": f"{type(e).__name__}: {e}",
                     "wall_s": round(time.perf_counter() - t0, 2)}
        report["sharded_step"][name] = entry
        print(f"  sharded {name:<16} {'OK' if entry['ok'] else 'FAIL'} "
              f"parity={entry.get('parity_rel_dev', float('nan')):.2e} "
              f"({entry['wall_s']}s)"
              + (f"  {entry.get('error', '')}" if not entry["ok"] else ""),
              file=sys.stderr)


def main(argv):
    bf16 = "--bf16" in argv
    force_cpu = "--cpu" in argv or bf16
    calibrate = "--calibrate" in argv
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]
    if bf16 and ("--xla_allow_excess_precision=false"
                 not in os.environ.get("XLA_FLAGS", "")):
        # the emulation needs this XLA flag before backend init (else
        # XLA folds the bf16 rounding away) — re-exec with it set
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_allow_excess_precision=false").strip()
        import subprocess
        return subprocess.call([sys.executable, __file__, *argv], env=env)
    if not force_cpu:
        from nmf_toolbox_tpu.utils.deviceprobe import probe_auto
        # --no-wait: interactive single probe instead of the 25-min
        # driver retry window (round-5 advice)
        plat, _n = probe_auto(no_wait="--no-wait" in argv)
        if plat is None or plat == "cpu":
            print("no live accelerator — rerun with --cpu for a "
                  "CPU-labeled calibration run", file=sys.stderr)
            return 2
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import nmf_toolbox_tpu as nt
    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform,
              "goldens": {}, "sharded_step": {}}
    if bf16:
        # CPU emulation of the chip's f32 matmul error model (one-pass
        # bf16 inputs, f32 accumulation): calibrates the thresholds
        # against the worse of {CPU-f32, CPU-bf16-matmul} with zero
        # chip time (VERDICT r4 item 3).
        report["matmul_emulation"] = "bf16-inputs-f32-accum"
        from nmf_toolbox_tpu.utils.debug import emulate_tpu_matmul_numerics
        print(f"tpu_smoke on {dev} (bf16-matmul emulation)",
              file=sys.stderr)
        with emulate_tpu_matmul_numerics():
            run_goldens(nt, report, calibrate=calibrate)
    else:
        print(f"tpu_smoke on {dev}", file=sys.stderr)
        run_goldens(nt, report, calibrate=calibrate)
    run_sharded(nt, report)
    report["ok"] = bool(all(e["ok"] for e in report["goldens"].values())
                        and all(e["ok"]
                                for e in report["sharded_step"].values()))
    # --cpu runs are calibration aids; never let one clobber the on-chip
    # regression artifact (they get their own CPU-suffixed file).
    default_name = ("TPU_SMOKE_cpu_bf16.json" if bf16
                    else "TPU_SMOKE_cpu.json" if force_cpu
                    else "TPU_SMOKE.json")
    path = out or str(REPO / "benchmarks" / default_name)
    if not calibrate:
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
        print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({"ok": report["ok"], "platform": report["platform"],
                      "n_goldens": len(report["goldens"]),
                      "n_sharded": len(report["sharded_step"])}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
