"""Driver-facing entry points (__graft_entry__.py) must stay importable and
runnable: the round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual N-device CPU mesh.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

import __graft_entry__ as graft


def test_entry_traces():
    fn, args = graft.entry()
    # Full CPU compile of the 128^3 flagship forward is slow; lowering alone
    # catches shape/tracing regressions (the driver does the real compile).
    lowered = jax.jit(fn).lower(*args)
    # the lowered program must produce the flagship output shape: one
    # (1, 128, 128, 128, 3) sigmoid-region tensor
    out_shapes = jax.tree_util.tree_leaves(lowered.out_info)
    assert any(
        tuple(getattr(o, "shape", ())) == (1, 128, 128, 128, 3)
        for o in out_shapes
    ), [getattr(o, "shape", None) for o in out_shapes]


def test_dryrun_multichip_executes():
    # conftest pins the cpu platform with 8 virtual devices before jax init,
    # which satisfies dryrun_multichip's own guard.
    graft.dryrun_multichip(8)


def test_compilation_cache_helper(tmp_path):
    from braintpu.utils.compcache import enable_compilation_cache

    d = enable_compilation_cache(tmp_path / "xla")
    assert d.endswith("xla")
    import jax

    assert jax.config.jax_compilation_cache_dir == d
