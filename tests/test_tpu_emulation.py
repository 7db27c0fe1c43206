"""utils/debug.emulate_tpu_matmul_numerics: the CPU-side emulation of
the chip's f32 matmul error model (one-pass bf16 inputs, f32
accumulation) used to calibrate tpu_smoke.py's golden thresholds
without chip time (VERDICT r4 item 3).

The emulation needs XLA_FLAGS=--xla_allow_excess_precision=false BEFORE
backend init (otherwise XLA folds the f32->bf16->f32 rounding away), so
the numeric assertions run in a subprocess with that flag; the guard
test runs in-process.
"""
import subprocess
import sys

import pytest


def test_guard_raises_without_xla_flag(monkeypatch):
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    from nmf_toolbox_tpu.utils.debug import emulate_tpu_matmul_numerics
    with pytest.raises(RuntimeError, match="excess_precision"):
        with emulate_tpu_matmul_numerics():
            pass


_CHILD = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from nmf_toolbox_tpu.utils.debug import emulate_tpu_matmul_numerics

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(64, 64)), jnp.float32)
B = jnp.asarray(rng.normal(size=(64, 64)), jnp.float32)
ref = np.asarray(A) @ np.asarray(B)
# trace this shape BEFORE entry: jnp's internal jaxpr caches must not
# let a pre-traced matmul bypass the emulation inside the context
pre = np.asarray(jax.jit(lambda a, b: a @ b)(A, B))
# independently computed expectation: bf16-rounded operands, f32 dot
Ar = np.asarray(A.astype(jnp.bfloat16).astype(jnp.float32))
Br = np.asarray(B.astype(jnp.bfloat16).astype(jnp.float32))
expect = Ar @ Br

with emulate_tpu_matmul_numerics():
    emu = np.asarray(jax.jit(lambda a, b: a @ b)(A, B))
    ein = np.asarray(jax.jit(lambda a, b: jnp.einsum("ij,jk->ik", a, b))(A, B))
    hi = np.asarray(jax.jit(lambda a, b: jax.lax.dot(
        a, b, precision="highest"))(A, B))
    # composes with scan (the solver-loop shape)
    def body(c, _):
        return (c[0], c[0] @ c[1] * jnp.float32(0.5)), None
    (_, scanned), _ = jax.jit(
        lambda a, b: jax.lax.scan(body, (a, b), None, length=2))(A, B)
    scanned = np.asarray(scanned)
clean = np.asarray(jax.jit(lambda a, b: (a @ b) * 1)(A, B))

scale = np.max(np.abs(ref))
# default-precision dots get the chip's rounding...
assert np.max(np.abs(emu - ref)) / scale > 1e-4, "emulation was a no-op"
assert np.max(np.abs(ein - ref)) / scale > 1e-4, "einsum path missed"
# ...matching the independent bf16-rounded expectation to accumulation
# order (f32 accumulation in both; tiny reassociation slack)
assert np.max(np.abs(emu - expect)) / scale < 1e-5, "wrong error model"
# explicitly-raised precision stays full f32 (the nmfsc line search)
assert np.max(np.abs(hi - ref)) / scale < 1e-6, "highest-precision hit"
assert np.isfinite(scanned).all()
# context exit restores plain f32
assert np.max(np.abs(clean - ref)) / scale < 1e-6, "leaked after exit"
print("EMU-OK")
"""


def test_emulation_numerics_subprocess():
    import os
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_allow_excess_precision=false").strip()
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "EMU-OK" in p.stdout
