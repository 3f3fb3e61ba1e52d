"""Driver entry points stay healthy (the driver compile-checks these)."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.live.shape[0] == 12 or out.live.shape[0] >= 12


def test_dryrun_multichip_all_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


def test_bench_script_parses():
    # bench.py must stay importable and its module constants sane
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
    assert mod.PARAMS["c"] == 50
