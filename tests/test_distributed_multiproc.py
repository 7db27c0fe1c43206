"""Real multi-process jax.distributed execution (SURVEY §2.5).

Everything else in the suite shards over ONE process's virtual devices;
this test runs the flagship and one convolutive solver across two OS
processes joined by ``parallel.init_distributed`` (Gloo collectives, the
CPU stand-in for ICI/DCN) and asserts the cross-process trajectories are
bit-identical to each other and match a single-process run on the same
global mesh shape.  The full 2x4/4x2 sweep with the JSON artifact lives
in benchmarks/distributed_multiproc.py.
"""
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "distributed_multiproc.py")


def test_two_process_mesh_parity(tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location("dist_mp", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # 2 processes x 2 devices: small global mesh keeps child compiles
    # cheap; children are spawned by main() and run the real
    # jax.distributed.initialize path.
    rc = mod.main(nproc=2, dpp=2, artifact=str(tmp_path / "dist.json"))
    assert rc == 0
